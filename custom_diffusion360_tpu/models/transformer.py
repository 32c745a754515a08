"""Spatial transformer stack with FeatureNeRF pose-conditioning.

TPU-native rework of the reference's attention.py (CrossAttention,
BasicTransformerBlock, SpatialTransformer, :213-887). Functional over param
pytrees; attention dispatches to the fused TPU kernel (ops.attention).

Dual-stream contract (reference: SpatialTransformer.forward dual path,
attention.py:821-886): the frozen reference stream (xr) runs the same weights
under stop_gradient; blocks at depth ``d % poscontrol_interval == 0`` of
image_cross transformers render a FeatureNeRF feature from the reference
stream's activations and fuse it into the target stream through an
identity-initialized linear (pose_emb_layers).

``n_times_crossframe_attn_in_self`` (an unused reference hook) is not carried
over.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..geometry.cameras import Cameras
from ..ops.attention import dot_product_attention, dot_product_attention_qkv
from ..ops.volume_render import volume_render
from .nerf import (
    CompactRefTokens,
    NerfConfig,
    from_chunked,
    init_nerf_params,
    nerfsd_apply,
)
from .nn import (
    gelu,
    group_norm,
    group_norm_init,
    layer_norm,
    layer_norm_init,
    linear,
    linear_init,
    trunc_exp,
)


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    dim: int
    depth: int
    n_heads: int
    d_head: int
    context_dim: int = 2048
    image_cross: bool = False
    poscontrol_interval: int = 4
    use_prev_weights_imp_sample: bool = True
    rgb_predict: bool = True
    add_lora: bool = False
    lora_rank: int = 32
    nerf: Optional[NerfConfig] = None

    def block_has_nerf(self, d: int) -> bool:
        return self.image_cross and (d % self.poscontrol_interval == 0)

    def block_imp_sample_next(self, d: int) -> bool:
        # reference: attention.py:781
        return (
            self.use_prev_weights_imp_sample
            and self.block_has_nerf(d)
            and self.depth >= self.poscontrol_interval
            and d < (self.depth // self.poscontrol_interval) * self.poscontrol_interval
        )


# ---------------------------------------------------------------------------
# attention / feedforward
# ---------------------------------------------------------------------------


def init_cross_attention(key, query_dim, context_dim, n_heads, d_head, add_lora=False, lora_rank=32):
    inner = n_heads * d_head
    ks = jax.random.split(key, 12)
    p = {
        "to_q": linear_init(ks[0], query_dim, inner, bias=False),
        "to_k": linear_init(ks[1], context_dim, inner, bias=False),
        "to_v": linear_init(ks[2], context_dim, inner, bias=False),
        "to_out": linear_init(ks[3], inner, query_dim),
    }
    if add_lora:
        r = lora_rank
        p["lora"] = {
            "q_down": linear_init(ks[4], query_dim, r, bias=False, std=1.0 / r),
            "q_up": linear_init(ks[5], r, inner, bias=False, zero=True),
            "k_down": linear_init(ks[6], context_dim, r, bias=False, std=1.0 / r),
            "k_up": linear_init(ks[7], r, inner, bias=False, zero=True),
            "v_down": linear_init(ks[8], context_dim, r, bias=False, std=1.0 / r),
            "v_up": linear_init(ks[9], r, inner, bias=False, zero=True),
            "o_down": linear_init(ks[10], inner, r, bias=False, std=1.0 / r),
            "o_up": linear_init(ks[11], r, query_dim, bias=False, zero=True),
        }
    return p


def context_kv(p, ctx):
    """Cross-attention K/V for a fixed context (B, M, Cc) -> ((B, M, inner) x2).

    Matches cross_attention_apply's k/v (including LoRA terms); used to hoist
    the text-context projections out of the sampler scan — the context is
    constant across all denoising steps (reference recomputes them every
    UNet call).
    """
    if "to_kv" in p:
        k, v = jnp.split(linear(p["to_kv"], ctx), 2, axis=-1)
    else:
        k = linear(p["to_k"], ctx)
        v = linear(p["to_v"], ctx)
    if "lora" in p:
        lp = p["lora"]
        k = k + linear(lp["k_up"], linear(lp["k_down"], ctx))
        v = v + linear(lp["v_up"], linear(lp["v_down"], ctx))
    return k, v


def cross_attention_apply(p, x, context=None, *, n_heads: int, kv=None):
    """x: (B, N, C); context: (B, M, Cc) or None (self-attention).

    Accepts either the canonical params (to_q/to_k/to_v) or the inference-
    fused layout from :func:`fuse_attention_params` (to_qkv / to_q+to_kv):
    one wide matmul instead of three square ones — small square matmuls
    measure ~18 TFLOPS on v5e vs ~87 for the fused rectangular shape.
    kv: optional precomputed (k, v) from :func:`context_kv` (cross-attention
    with a step-invariant context).
    """
    ctx = x if context is None else context
    if kv is not None:
        q = linear(p["to_q"], x)
        k, v = kv
        if "lora" in p:
            lp = p["lora"]
            q = q + linear(lp["q_up"], linear(lp["q_down"], x))
    elif context is None and "to_qkv" in p:
        if "lora" not in p:
            # fused-QKV self-attention: hand the projection output to the
            # kernel whole (see ops/attention.dot_product_attention_qkv) —
            # the split+transpose route below costs 6 copy fusions/layer
            out = dot_product_attention_qkv(linear(p["to_qkv"], x), n_heads)
            return linear(p["to_out"], out)
        q, k, v = jnp.split(linear(p["to_qkv"], x), 3, axis=-1)
    elif context is not None and "to_kv" in p:
        q = linear(p["to_q"], x)
        k, v = jnp.split(linear(p["to_kv"], ctx), 2, axis=-1)
    else:
        q = linear(p["to_q"], x)
        k = linear(p["to_k"], ctx)
        v = linear(p["to_v"], ctx)
    if kv is None and "lora" in p:
        lp = p["lora"]
        q = q + linear(lp["q_up"], linear(lp["q_down"], x))
        k = k + linear(lp["k_up"], linear(lp["k_down"], ctx))
        v = v + linear(lp["v_up"], linear(lp["v_down"], ctx))
    b, n, inner = q.shape
    d_head = inner // n_heads
    q = q.reshape(b, n, n_heads, d_head)
    k = k.reshape(b, k.shape[1], n_heads, d_head)
    v = v.reshape(b, v.shape[1], n_heads, d_head)
    out = dot_product_attention(q, k, v).reshape(b, n, inner)
    final = linear(p["to_out"], out)
    if "lora" in p:
        final = final + linear(p["lora"]["o_up"], linear(p["lora"]["o_down"], out))
    return final


def fuse_attention_params(params):
    """Return a params tree with q/k/v projections fused for inference.

    For every transformer block (a dict holding both ``attn1`` and ``attn2``):
    self-attention (attn1) gets ``to_qkv`` = [wq | wk | wv] (C, 3*inner) and
    cross-attention (attn2) gets ``to_kv`` = [wk | wv]; the fused-out
    originals are dropped, so HBM use does not grow. LoRA adapters are first
    merged into the base projections (W + down @ up — exact at inference, and
    zero-delta for released deltas, which ship the up-projections at their
    zero init), so the 12 pose blocks take the same fused fast path instead
    of paying 8 rank-32 side matmuls + unfused square projections each. Pure
    function — run it once (ideally under jit, on device) before a sampling
    loop; the canonical checkpoint layout stays untouched.
    """
    def merge_lora(attn):
        if "lora" not in attn:
            return attn
        a = dict(attn)
        lp = a.pop("lora")

        def merged(base, down, up):
            return dict(
                base,
                w=base["w"] + lp[down]["w"] @ lp[up]["w"],
            )

        a["to_q"] = merged(a["to_q"], "q_down", "q_up")
        a["to_k"] = merged(a["to_k"], "k_down", "k_up")
        a["to_v"] = merged(a["to_v"], "v_down", "v_up")
        a["to_out"] = merged(a["to_out"], "o_down", "o_up")
        return a

    def fuse_block(blk):
        out = dict(blk)
        a1 = blk.get("attn1")
        if isinstance(a1, dict) and "to_q" in a1:
            a1 = merge_lora(dict(a1))
            w = jnp.concatenate(
                [a1.pop("to_q")["w"], a1.pop("to_k")["w"], a1.pop("to_v")["w"]],
                axis=1,
            )
            a1["to_qkv"] = {"w": w}
            out["attn1"] = a1
        a2 = blk.get("attn2")
        if isinstance(a2, dict) and "to_k" in a2:
            a2 = merge_lora(dict(a2))
            w = jnp.concatenate([a2.pop("to_k")["w"], a2.pop("to_v")["w"]], axis=1)
            a2["to_kv"] = {"w": w}
            out["attn2"] = a2
        return out

    def walk(node):
        if isinstance(node, dict):
            if "attn1" in node and "attn2" in node:
                node = fuse_block(node)
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params)


def init_feedforward(key, dim, mult=4):
    inner = dim * mult
    k1, k2 = jax.random.split(key)
    return {
        "proj": linear_init(k1, dim, inner * 2),  # GEGLU
        "out": linear_init(k2, inner, dim),
    }


def feedforward_apply(p, x):
    h = linear(p["proj"], x)
    a, gate = jnp.split(h, 2, axis=-1)
    return linear(p["out"], a * gelu(gate))


# ---------------------------------------------------------------------------
# transformer block
# ---------------------------------------------------------------------------


def init_transformer_block(key, cfg: TransformerConfig, d: int):
    ks = jax.random.split(key, 8)
    lora = cfg.add_lora and cfg.block_has_nerf(d)
    p = {
        "attn1": init_cross_attention(
            ks[0], cfg.dim, cfg.dim, cfg.n_heads, cfg.d_head, lora, cfg.lora_rank
        ),
        "attn2": init_cross_attention(
            ks[1], cfg.dim, cfg.context_dim, cfg.n_heads, cfg.d_head, lora, cfg.lora_rank
        ),
        "ff": init_feedforward(ks[2], cfg.dim),
        "norm1": layer_norm_init(cfg.dim),
        "norm2": layer_norm_init(cfg.dim),
        "norm3": layer_norm_init(cfg.dim),
    }
    if cfg.block_has_nerf(d):
        p["pose_emb_layers"] = linear_init(
            ks[3], 2 * cfg.dim, cfg.dim, bias=False, eye=True
        )
        p["pose_featurenerf"] = init_nerf_params(ks[4], cfg.nerf)
    return p


def _slice_copy_rows(nerf_out, lo, hi):
    """Batch-row slice [lo:hi) of a nerfsd result dict. Batch is axis 0 in
    the dense (B, hw, S, *) layout, axis 1 in the chunked
    (nc, B, chunk, S, *) scan-native layout."""
    axis = 1 if nerf_out.get("chunked") else 0

    def sl(t):
        return None if t is None else jax.lax.slice_in_dim(t, lo, hi, axis=axis)

    return {k: (v if k in ("chunked", "attn") else sl(v))
            for k, v in nerf_out.items()}


def _reference_attn(
    p, cams, context_ref, context, prev_weights, mask_ref, cfg: TransformerConfig,
    d: int, key, training: bool,
):
    """NeRF render + text cross-attn on per-point features + volume render.

    Reference: BasicTransformerBlock.reference_attn (attention.py:571-598).
    Returns (rendered (B, hw, C), fg_mask, prev_weights, alphas, rgb).

    CFG x3 render dedupe (CD360_CFG3_DEDUPE, default on): the x3 guider's
    row layout is [uncond | image | image+text] (guiders.py:102-133
    semantics) — copies 1 and 2 carry IDENTICAL reference planes, and when
    the caller declares the target camera replicated across copies
    (engine.sample shared_target_cams -> CompactRefTokens.shared_cams; what
    cli/sample.py and reference sample.py always do), the only
    row-dependent input to the NeRF encode is the reference planes. Copies
    1/2 are then identical through the whole ray-march + encode, so the
    render runs on the 2 UNIQUE copies and outputs expand just before the
    first row-divergent op (the per-point TEXT attention, whose context
    differs between copies 1/2). Applied only on the structurally safe
    path: compact delta-buffer tokens (which guarantee the plane identity
    by construction), declared shared cams, inference, no per-row masks,
    no view-sharding.
    """
    dd_b = 0
    if (
        isinstance(context_ref, CompactRefTokens)
        and context_ref.copies == 3
        and context_ref.shared_cams
        and context_ref.sharding is None
        and mask_ref is None
        and not training
        and os.environ.get("CD360_CFG3_DEDUPE", "1") != "0"
    ):
        dd_b = context_ref.batch
        bu = 2 * dd_b
        context_ref = CompactRefTokens(
            context_ref.zero, context_ref.chosen, dd_b, 2
        )
        cams = jax.tree.map(lambda t: t[:bu], cams)
        if prev_weights is not None:
            prev_weights = prev_weights[:bu]
    nerf_out = nerfsd_apply(
        p["pose_featurenerf"],
        cams,
        context_ref,
        mask_ref,
        cfg.nerf,
        key,
        training,
        prev_weights=prev_weights if cfg.use_prev_weights_imp_sample else None,
        imp_sample_next_step=cfg.block_imp_sample_next(d),
    )
    cdt = cfg.nerf.cdtype  # f32 reproduces the reference island exactly

    def finish(nout, context):
        """Per-point text cross-attention + volume render of a nerfsd
        result; returns DENSE (batch-major, S-collapsed) outputs.
        ``context`` is never None here — the sole transformer_block_apply
        call site always passes the (fp32) text context."""
        feats = nout["features"]  # (B, hw, S, C) f32 — or chunked layout
        nc = nout.get("chunked")
        if nc:
            # scan-native (nc, B, chunk, S, C): the per-point text attention
            # is ray-order-invariant, so run it as batch nc*B and transpose
            # only the rendered (S-collapsed) outputs below. The context k/v
            # are projected ONCE and tiled over the nc chunk copies.
            _, b, chunk_hw, s, c = feats.shape
            pre = feats.shape[:3]
            feats = feats.reshape(nc * b, chunk_hw * s, c)
            ctx = None
            kv = tuple(
                jnp.broadcast_to(t[None], (nc,) + t.shape).reshape(
                    (nc * t.shape[0],) + t.shape[1:]
                )
                for t in context_kv(p["attn2"], context.astype(cdt))
            )
        else:
            b, hw, s, c = feats.shape
            pre = (b, hw)
            feats = feats.reshape(b, hw * s, c)
            ctx = None if context is None else context.astype(cdt)
            kv = None
        feats = feats + cross_attention_apply(
            p["attn2"],
            layer_norm(p["norm2"], feats.astype(cdt)),
            ctx,
            n_heads=cfg.n_heads,
            kv=kv,
        ).astype(jnp.float32)
        feats = feats.reshape(pre + (s, c))

        sigma = trunc_exp(nout["sigma"])
        sigma_uniform = (
            trunc_exp(nout["sigma_uniform"])
            if nout["sigma_uniform"] is not None
            else None
        )
        rgb = jax.nn.sigmoid(nout["rgb"]) if nout["rgb"] is not None else None
        rendered = volume_render(
            feats,
            sigma,
            nout["dists"],
            rgb=rgb,
            densities_uniform=sigma_uniform,
            dists_uniform=nout["dists_uniform"],
        )
        new_prev = (
            rendered["weights_uniform"]
            if cfg.use_prev_weights_imp_sample else None
        )
        out_feats = rendered["feats"]
        fg_mask, alphas = rendered["fg_mask"], rendered["alphas"]
        rgb_out = rendered["rgb"]
        if nc:
            out_feats = from_chunked(out_feats)
            fg_mask = from_chunked(fg_mask)
            alphas = from_chunked(alphas)
            if rgb_out is not None:
                rgb_out = from_chunked(rgb_out)
            if new_prev is not None:
                new_prev = from_chunked(new_prev)
        return (out_feats, fg_mask, new_prev, alphas, rgb_out)

    if not dd_b:
        return finish(nerf_out, context)

    # x3 dedupe epilogue: nerf_out has the 2 UNIQUE copies [zero | chosen].
    # Copy 2 differs from copy 1 ONLY in its text context (c vs uc), which
    # first matters at the per-point attention — so attend+render the
    # unique rows under the shared uc context (rows 0,1), attend+render the
    # chosen rows AGAIN under the c context (row 2), and concatenate the
    # S-COLLAPSED outputs. Nothing (B, hw, S, C)-sized is ever expanded
    # (the eager 2b->3b expansion measured +4 G temp and OOMed the x3
    # sample — BENCH r5 session).
    b = dd_b
    out_a = finish(nerf_out, context[: 2 * b])
    out_b = finish(
        _slice_copy_rows(nerf_out, b, 2 * b), context[2 * b:]
    )

    def cat(ta, tb):
        if ta is None:
            return None
        return jnp.concatenate([ta, tb], axis=0)

    return tuple(cat(ta, tb) for ta, tb in zip(out_a, out_b))


def transformer_block_apply(
    p,
    x,
    context,
    cfg: TransformerConfig,
    d: int,
    *,
    context_ref=None,
    cams: Cameras | None = None,
    mask_ref=None,
    prev_weights=None,
    key=None,
    training: bool = False,
    nerf_cache=None,
    ctx_kv=None,
):
    """One BasicTransformerBlock step (reference: attention.py:600-637).

    x: (B, hw, C). context_ref: (B, Nref, hw, C) frozen reference activations
    (already detached). nerf_cache: optional precomputed rendered feature
    (B, hw, C) replacing the NeRF render (inference render-once cache,
    reference sample.py:122-133). ctx_kv: optional precomputed (k, v) for
    the text cross-attention (context_kv; step-invariant context).

    Returns (x, aux) with aux = dict(fg_mask, prev_weights, alphas, rgb,
    rendered) — entries None when not an image-cross block.
    """
    x = cross_attention_apply(
        p["attn1"], layer_norm(p["norm1"], x), None, n_heads=cfg.n_heads
    ) + x
    x = cross_attention_apply(
        p["attn2"], layer_norm(p["norm2"], x), context, n_heads=cfg.n_heads,
        kv=ctx_kv,
    ) + x

    aux = dict(fg_mask=None, prev_weights=prev_weights, alphas=None, rgb=None,
               rendered=None)
    if "pose_emb_layers" in p and (context_ref is not None or nerf_cache is not None):
        xf = x.astype(jnp.float32)  # fp32 island (reference attention.py:626)
        if nerf_cache is not None:
            rendered = nerf_cache
        else:
            rendered, fg_mask, new_prev, alphas, rgb = _reference_attn(
                p, cams, context_ref, context.astype(jnp.float32), prev_weights,
                mask_ref, cfg, d, key, training,
            )
            aux.update(
                fg_mask=fg_mask, prev_weights=new_prev, alphas=alphas, rgb=rgb,
                rendered=rendered,
            )
        # split the (2C -> C) fusion matmul by input half instead of
        # materializing the f32 [x | rendered] concat (profiled as pure
        # copy traffic at 1024^2)
        c = xf.shape[-1]
        w = p["pose_emb_layers"]["w"]
        fused = xf @ w[:c] + rendered.astype(jnp.float32) @ w[c:]
        x = fused.astype(x.dtype)

    x = feedforward_apply(p["ff"], layer_norm(p["norm3"], x)) + x
    return x, aux


# ---------------------------------------------------------------------------
# spatial transformer (reference: attention.py:684-887)
# ---------------------------------------------------------------------------


def init_spatial_transformer(key, in_channels: int, cfg: TransformerConfig):
    ks = jax.random.split(key, cfg.depth + 3)
    inner = cfg.n_heads * cfg.d_head
    return {
        "norm": group_norm_init(in_channels),
        "proj_in": linear_init(ks[0], in_channels, inner),
        "blocks": [
            init_transformer_block(ks[2 + d], cfg, d) for d in range(cfg.depth)
        ],
        "proj_out": linear_init(ks[1], inner, in_channels, zero=True),
    }


def spatial_transformer_apply(
    p,
    x,
    context,
    cfg: TransformerConfig,
    *,
    xr=None,
    context_ref=None,
    cams: Cameras | None = None,
    mask_ref=None,
    key=None,
    training: bool = False,
    nerf_cache=None,
    ref_features=None,
    ctx_kv=None,
):
    """x: (B, H, W, C) NHWC. xr: (B*Nref, H, W, C) reference stream or None.

    ctx_kv: optional per-depth list of precomputed text cross-attention
    (k, v) pairs for the TARGET stream's context (see context_kv) — only
    applied to the target stream (the reference stream attends over its own
    per-view context).

    Returns (x, xr, aux) where aux = dict(fg_masks=[...], alphas=[...],
    rgbs=[...], rendered={d: feats}) collected from image-cross blocks.
    nerf_cache: dict {d: rendered feats} for the inference cache path.
    ref_features: dict {d: (B, Nref, hw, C) tokens} — precomputed reference
    buffers replacing the live reference stream (the delta-checkpoint
    'references' path, reference sample.py:86-97).
    """
    b, h, w, c = x.shape
    x_in = x
    x = group_norm(p["norm"], x).reshape(b, h * w, c)
    x = linear(p["proj_in"], x)

    run_ref = xr is not None
    if run_ref:
        xr_in = xr
        br = xr.shape[0]
        xr = jax.lax.stop_gradient(
            linear(p["proj_in"], group_norm(p["norm"], xr).reshape(br, h * w, c))
        )

    prev_weights = None
    fg_masks, alphas_list, rgbs, rendered_out = [], [], [], {}
    ref_tokens_out = {}
    for d in range(cfg.depth):
        blk = p["blocks"][d]
        has_ref_src = (
            run_ref
            or (nerf_cache and d in nerf_cache)
            or (ref_features and d in ref_features)
        )
        if cfg.block_has_nerf(d) and has_ref_src:
            if run_ref:
                xr, _ = transformer_block_apply(
                    blk, xr, context_ref, cfg, d, training=False
                )
                xr = jax.lax.stop_gradient(xr)
                ctx_ref_tokens = jax.lax.stop_gradient(
                    xr.reshape(b, br // b, h * w, -1)
                )
                ref_tokens_out[d] = ctx_ref_tokens
            elif ref_features is not None and d in ref_features:
                ctx_ref_tokens = ref_features[d]
            else:
                ctx_ref_tokens = None
            bkey = None
            if key is not None:
                key, bkey = jax.random.split(key)
            x, aux = transformer_block_apply(
                blk,
                x,
                context,
                cfg,
                d,
                context_ref=ctx_ref_tokens,
                cams=cams,
                mask_ref=mask_ref,
                prev_weights=prev_weights,
                key=bkey,
                training=training,
                nerf_cache=None if nerf_cache is None else nerf_cache.get(d),
                ctx_kv=None if ctx_kv is None else ctx_kv[d],
            )
            prev_weights = aux["prev_weights"]
            if aux["fg_mask"] is not None:
                fg_masks.append(aux["fg_mask"])
            if aux["alphas"] is not None:
                alphas_list.append(aux["alphas"])
            if aux["rgb"] is not None:
                rgbs.append(aux["rgb"])
            if aux["rendered"] is not None:
                rendered_out[d] = aux["rendered"]
        else:
            if run_ref:
                xr, _ = transformer_block_apply(
                    blk, xr, context_ref, cfg, d, training=False
                )
                xr = jax.lax.stop_gradient(xr)
            x, _ = transformer_block_apply(
                blk, x, context, cfg, d,
                ctx_kv=None if ctx_kv is None else ctx_kv[d],
            )

    x = linear(p["proj_out"], x).reshape(b, h, w, c) + x_in
    if run_ref:
        xr = jax.lax.stop_gradient(
            linear(p["proj_out"], xr).reshape(br, h, w, c) + xr_in
        )
    else:
        xr = None
    aux = dict(fg_masks=fg_masks, alphas=alphas_list, rgbs=rgbs,
               rendered=rendered_out, ref_tokens=ref_tokens_out)
    return x, xr, aux
