"""SDXL UNet with a frozen dual reference stream and FeatureNeRF blocks.

TPU-native redesign of the reference's UNetModel
(sgm/modules/diffusionmodules/openaimodel.py:525-1093). The torch module tree
becomes a static *spec* built from the config; init/apply walk the spec, so the
whole network is one pure function over a param pytree — jit/grad/shard_map
compose directly.

Key behaviours reproduced:
* the reference stream (input_ref latents, one per reference view) runs the
  same weights in lockstep under stop_gradient, detached after every layer
  (openaimodel.py:1039-1087, TimestepEmbedSequential, :73-111);
* FeatureNeRF lives on transformer ids image_cross_blocks (0,2,4,6,8,10 of 11)
  at inner depths d % poscontrol_interval == 0 — 12 NeRF modules total;
* fg_mask / alphas / rgb lists are collected across blocks for the aux losses;
* reference latents get their own timestep embedding from sigmas_ref
  (openaimodel.py:1040-1049).

Layout: NHWC activations (TPU-native); latent x is (B, H, W, C).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..geometry.cameras import Cameras
from .nerf import NerfConfig
from .nn import (
    conv2d,
    conv2d_init,
    group_norm,
    group_norm_init,
    group_norm_silu,
    linear,
    linear_init,
    silu,
    timestep_embedding,
    upsample_nearest_2x,
)
from .transformer import (
    TransformerConfig,
    init_spatial_transformer,
    spatial_transformer_apply,
)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    model_channels: int = 320
    out_channels: int = 4
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (4, 2)
    channel_mult: Tuple[int, ...] = (1, 2, 4)
    transformer_depth: Tuple[int, ...] = (1, 2, 10)
    context_dim: int = 2048
    adm_in_channels: int = 2816
    num_head_channels: int = 64
    image_cross_blocks: Tuple[int, ...] = (0, 2, 4, 6, 8, 10)
    rgb_predict: bool = True
    far: float = 2.0
    num_samples: int = 24
    near_plane: float = 0.0
    average: bool = False
    num_freqs: int = 16
    use_prev_weights_imp_sample: bool = True
    stratified: bool = True
    poscontrol_interval: int = 4
    imp_sampling_percent: float = 0.9
    add_lora: bool = False
    nerf_chunk_size: int = 512  # rays per streamed FeatureNeRF chunk
    # dtype of the FeatureNeRF encoding matmuls; "float32" matches the
    # reference's forced-fp32 NeRF islands (attention.py:626), "bfloat16" is
    # the TPU inference setting (softmax/density/volume render stay f32)
    nerf_dtype: str = "float32"

    def nerf_config(self, dim: int) -> NerfConfig:
        return NerfConfig(
            dim=dim,
            num_samples=self.num_samples,
            far_plane=self.far,
            near_plane=self.near_plane,
            num_freqs=self.num_freqs,
            rgb_predict=self.rgb_predict,
            average=self.average,
            stratified=self.stratified,
            imp_sampling_percent=self.imp_sampling_percent,
            chunk_size=self.nerf_chunk_size,
            compute_dtype=self.nerf_dtype,
        )

    def transformer_config(self, ch: int, depth: int, attn_id: int) -> TransformerConfig:
        heads = ch // self.num_head_channels
        return TransformerConfig(
            dim=ch,
            depth=depth,
            n_heads=heads,
            d_head=self.num_head_channels,
            context_dim=self.context_dim,
            image_cross=attn_id in self.image_cross_blocks,
            poscontrol_interval=self.poscontrol_interval,
            use_prev_weights_imp_sample=self.use_prev_weights_imp_sample,
            rgb_predict=self.rgb_predict,
            add_lora=self.add_lora,
            nerf=self.nerf_config(ch),
        )


# ---------------------------------------------------------------------------
# static spec construction (mirrors openaimodel.py:717-973 topology)
# ---------------------------------------------------------------------------


def build_unet_spec(cfg: UNetConfig):
    """Returns (input_blocks, middle_block, output_blocks, num_transformers).

    Each block is a list of layer specs: ("conv_in",...), ("res", in, out),
    ("attn", ch, depth, attn_id), ("down", ch), ("up", ch).
    """
    input_blocks = [[("conv_in", cfg.in_channels, cfg.model_channels)]]
    input_chans = [cfg.model_channels]
    ch = cfg.model_channels
    ds = 1
    attn_id = 0
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            layers = [("res", ch, mult * cfg.model_channels)]
            ch = mult * cfg.model_channels
            if ds in cfg.attention_resolutions:
                layers.append(("attn", ch, cfg.transformer_depth[level], attn_id))
                attn_id += 1
            input_blocks.append(layers)
            input_chans.append(ch)
        if level != len(cfg.channel_mult) - 1:
            input_blocks.append([("down", ch)])
            input_chans.append(ch)
            ds *= 2

    middle_block = [
        ("res", ch, ch),
        ("attn", ch, cfg.transformer_depth[-1], attn_id),
        ("res", ch, ch),
    ]
    attn_id += 1

    output_blocks = []
    for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
        for i in range(cfg.num_res_blocks + 1):
            ich = input_chans.pop()
            layers = [("res", ch + ich, cfg.model_channels * mult)]
            ch = cfg.model_channels * mult
            if ds in cfg.attention_resolutions:
                layers.append(("attn", ch, cfg.transformer_depth[level], attn_id))
                attn_id += 1
            if level and i == cfg.num_res_blocks:
                layers.append(("up", ch))
                ds //= 2
            output_blocks.append(layers)

    return input_blocks, middle_block, output_blocks, attn_id


def attn_block_meta(cfg: UNetConfig):
    """{attn_id: (ds, channels, depth)} — the token-grid downsample factor and
    width of every SpatialTransformer (for sizing reference buffers)."""
    meta = {}
    ch = cfg.model_channels
    ds = 1
    attn_id = 0
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            ch = mult * cfg.model_channels
            if ds in cfg.attention_resolutions:
                meta[attn_id] = (ds, ch, cfg.transformer_depth[level])
                attn_id += 1
        if level != len(cfg.channel_mult) - 1:
            ds *= 2
    meta[attn_id] = (ds, ch, cfg.transformer_depth[-1])
    attn_id += 1
    for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
        for i in range(cfg.num_res_blocks + 1):
            ch = cfg.model_channels * mult
            if ds in cfg.attention_resolutions:
                meta[attn_id] = (ds, ch, cfg.transformer_depth[level])
                attn_id += 1
            if level and i == cfg.num_res_blocks:
                ds //= 2
    return meta


# ---------------------------------------------------------------------------
# layer init/apply
# ---------------------------------------------------------------------------


def _init_resblock(key, in_ch, out_ch, emb_dim):
    ks = jax.random.split(key, 4)
    p = {
        "norm_in": group_norm_init(in_ch),
        "conv_in": conv2d_init(ks[0], in_ch, out_ch, 3),
        "emb": linear_init(ks[1], emb_dim, out_ch),
        "norm_out": group_norm_init(out_ch),
        "conv_out": conv2d_init(ks[2], out_ch, out_ch, 3, zero=True),
    }
    if in_ch != out_ch:
        p["skip"] = conv2d_init(ks[3], in_ch, out_ch, 1)
    return p


def _resblock_apply(p, x, emb):
    # ResBlock GroupNorms use torch's default eps=1e-5 (GroupNorm32,
    # diffusionmodules/util.py:294-311) — unlike the eps=1e-6 Normalize of
    # the transformer/VAE norms
    h = conv2d(p["conv_in"], group_norm_silu(p["norm_in"], x, eps=1e-5))
    h = h + linear(p["emb"], silu(emb))[:, None, None, :].astype(h.dtype)
    h = conv2d(p["conv_out"], group_norm_silu(p["norm_out"], h, eps=1e-5))
    skip = conv2d(p["skip"], x) if "skip" in p else x
    return skip + h


def _init_layer(key, spec, cfg: UNetConfig, emb_dim):
    kind = spec[0]
    if kind == "conv_in":
        return conv2d_init(key, spec[1], spec[2], 3)
    if kind == "res":
        return _init_resblock(key, spec[1], spec[2], emb_dim)
    if kind == "attn":
        _, ch, depth, attn_id = spec
        return init_spatial_transformer(key, ch, cfg.transformer_config(ch, depth, attn_id))
    if kind == "down":
        return conv2d_init(key, spec[1], spec[1], 3)
    if kind == "up":
        return conv2d_init(key, spec[1], spec[1], 3)
    raise ValueError(kind)


def init_unet_params(key, cfg: UNetConfig):
    inb, mid, outb, _ = build_unet_spec(cfg)
    emb_dim = cfg.model_channels * 4
    keys = iter(jax.random.split(key, 400))
    params: dict[str, Any] = {
        "time_embed": {
            "l1": linear_init(next(keys), cfg.model_channels, emb_dim),
            "l2": linear_init(next(keys), emb_dim, emb_dim),
        },
        "label_emb": {
            "l1": linear_init(next(keys), cfg.adm_in_channels, emb_dim),
            "l2": linear_init(next(keys), emb_dim, emb_dim),
        },
        "out_norm": group_norm_init(cfg.model_channels),
        "out_conv": conv2d_init(next(keys), cfg.model_channels, cfg.out_channels, 3, zero=True),
    }
    params["input_blocks"] = [
        [_init_layer(next(keys), s, cfg, emb_dim) for s in block] for block in inb
    ]
    params["middle_block"] = [_init_layer(next(keys), s, cfg, emb_dim) for s in mid]
    params["output_blocks"] = [
        [_init_layer(next(keys), s, cfg, emb_dim) for s in block] for block in outb
    ]
    return params


def _mlp2(p, x):
    return linear(p["l2"], silu(linear(p["l1"], x)))


def precompute_context_kv(params, cfg: UNetConfig, context):
    """Per-block text cross-attention K/V for a fixed context.

    context: (B, M, context_dim) — the TARGET context exactly as the UNet
    will see it (CFG-batched, already cast to the compute dtype). Returns
    {attn_id: [per-depth (k, v)]} for unet_apply's ``ctx_kv``. The text
    context is constant across sampler steps, so these ~140 small
    projections are hoisted out of the denoising loop (the reference
    recomputes them in every UNet call).
    """
    from .transformer import context_kv

    inb, mid, outb, _ = build_unet_spec(cfg)
    out = {}

    def do_attn(lp, spec):
        attn_id = spec[3]
        out[attn_id] = [context_kv(blk["attn2"], context) for blk in lp["blocks"]]

    for lp_block, spec_block in zip(params["input_blocks"], inb):
        for lp, spec in zip(lp_block, spec_block):
            if spec[0] == "attn":
                do_attn(lp, spec)
    for lp, spec in zip(params["middle_block"], mid):
        if spec[0] == "attn":
            do_attn(lp, spec)
    for lp_block, spec_block in zip(params["output_blocks"], outb):
        for lp, spec in zip(lp_block, spec_block):
            if spec[0] == "attn":
                do_attn(lp, spec)
    return out


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


class _Stream:
    """Carries the dual (target, reference) activations through a layer seq."""

    __slots__ = ("h", "hr")

    def __init__(self, h, hr):
        self.h = h
        self.hr = hr

    def both(self, fn):
        self.h = fn(self.h)
        if self.hr is not None:
            self.hr = jax.lax.stop_gradient(fn(self.hr))


def unet_apply(
    params,
    cfg: UNetConfig,
    x,
    timesteps,
    context,
    y,
    *,
    input_ref=None,
    sigmas_ref=None,
    cams: Cameras | None = None,
    mask_ref=None,
    key=None,
    training: bool = False,
    nerf_caches=None,
    ref_features=None,
    ctx_kv=None,
    compute_dtype=jnp.float32,
    prefix_dedupe=None,
):
    """Denoising forward.

    x: (B, H, W, Cin) NHWC latent (already c_in-scaled by the denoiser).
    timesteps: (B,) c_noise values.
    context: ((1 + Nref) * B, 77, context_dim) — target rows first, then the
      per-view reference rows, matching the conditioner contract
      (openaimodel.py:1010-1017).
    y: ((1 + Nref) * B, adm_in_channels) vector conditioning, same layout.
    input_ref: (B, Nref, H, W, Cin) reference latents or None.
    sigmas_ref: (B,) reference c_noise values.
    nerf_caches: {attn_id: {depth: rendered}} inference cache; when given the
      reference stream is skipped entirely (sample.py:122-133 fast path).
    ref_features: {attn_id: {depth: (B, Nref, hw, C)}} precomputed reference
      buffers (delta-checkpoint 'references'); NeRF renders from these
      instead of a live reference stream (sample.py:86-97).
    ctx_kv: {attn_id: [per-depth (k, v)]} precomputed text cross-attention
      projections for a step-invariant context (precompute_context_kv) —
      inference-only; the target context passed here must equal the one the
      cache was built from.
    prefix_dedupe: optional per-copy group tuple (e.g. (0, 0, 1)) declaring
      that CFG copies with the same group id carry identical x/emb rows, so
      everything BEFORE the first pose/attention block (conv_in + the ds1
      resblocks + downsample — the only row-divergence-free prefix) runs on
      the unique copies only and expands at the first 'attn' layer (incl.
      the skip tensors). Guiders whose ``prepare`` builds duplicate copies
      declare this (guiders.prefix_copy_groups); cached-inference only —
      ignored when the reference stream runs (its rows are per-view).

    Returns (eps, aux) where aux has fg_mask_list, alphas_list, rgb_list,
    rendered ({attn_id: {d: feats}}).
    """
    b = x.shape[0]
    run_ref = input_ref is not None

    t_emb = timestep_embedding(timesteps, cfg.model_channels)
    emb = _mlp2(params["time_embed"], t_emb)
    if y is not None:
        emb = emb + _mlp2(params["label_emb"], y[:b])

    contextr = None
    embr = None
    hr = None
    n = 0
    if run_ref:
        n = input_ref.shape[1]
        contextr = context[b:].astype(compute_dtype)
        tr = sigmas_ref if sigmas_ref is not None else jnp.zeros_like(timesteps)
        t_embr = timestep_embedding(tr, cfg.model_channels)
        embr = _mlp2(params["time_embed"], t_embr)
        embr = jnp.broadcast_to(embr[:, None], (b, n, embr.shape[-1])).reshape(
            b * n, -1
        )
        if y is not None:
            embr = embr + _mlp2(params["label_emb"], y[b:].reshape(b * n, -1))
        embr = jax.lax.stop_gradient(embr)
        hr = input_ref.reshape((b * n,) + input_ref.shape[2:]).astype(compute_dtype)
    context = context[:b].astype(compute_dtype)

    inb_spec, mid_spec, outb_spec, _ = build_unet_spec(cfg)
    stream = _Stream(x.astype(compute_dtype), hr)

    # Pre-pose-block prefix dedupe (see docstring): run conv_in + the
    # pre-attention resblocks on the unique CFG copies only; expansion back
    # to the full row count (incl. accumulated skip tensors) happens at the
    # first 'attn' layer. x3 cached step measured 2.2 ms/step cheaper.
    expand_rows = None
    emb_full = emb
    if prefix_dedupe is not None and not run_ref:
        groups = tuple(prefix_dedupe)
        ncopies = len(groups)
        if b % ncopies == 0 and len(set(groups)) < ncopies:
            import numpy as _np

            bb = b // ncopies
            rep = {}
            for ci, g in enumerate(groups):
                rep.setdefault(g, ci)
            order = sorted(rep)
            uniq_rows = jnp.asarray(_np.concatenate(
                [_np.arange(rep[g] * bb, (rep[g] + 1) * bb) for g in order]
            ))
            pos = {g: i for i, g in enumerate(order)}
            expand_rows = jnp.asarray(_np.concatenate(
                [_np.arange(pos[g] * bb, (pos[g] + 1) * bb) for g in groups]
            ))
            stream.h = jnp.take(stream.h, uniq_rows, axis=0)
            emb = jnp.take(emb, uniq_rows, axis=0)

    fg_mask_list, alphas_list, rgb_list = [], [], []
    rendered = {}
    ref_tokens = {}

    def apply_layer(lp, spec, stream, key):
        kind = spec[0]
        if kind == "conv_in":
            stream.both(lambda t: conv2d(lp, t))
        elif kind == "res":
            stream.h = _resblock_apply(lp, stream.h, emb)
            if stream.hr is not None:
                stream.hr = jax.lax.stop_gradient(_resblock_apply(lp, stream.hr, embr))
        elif kind == "down":
            # torch Downsample: conv stride 2, padding=1 both sides
            # (openaimodel.py Downsample) — explicit pads for import parity
            stream.both(
                lambda t: conv2d(lp, t, stride=2, padding=((1, 1), (1, 1)))
            )
        elif kind == "up":
            stream.both(lambda t: conv2d(lp, upsample_nearest_2x(t)))
        elif kind == "attn":
            _, ch, depth, attn_id = spec
            tcfg = cfg.transformer_config(ch, depth, attn_id)
            cache = None if nerf_caches is None else nerf_caches.get(attn_id)
            refs = None if ref_features is None else ref_features.get(attn_id)
            stream.h, stream.hr, aux = spatial_transformer_apply(
                lp,
                stream.h,
                context,
                tcfg,
                xr=stream.hr,
                context_ref=contextr,
                cams=cams,
                mask_ref=mask_ref,
                key=key,
                training=training,
                nerf_cache=cache,
                ref_features=refs,
                ctx_kv=None if ctx_kv is None else ctx_kv.get(attn_id),
            )
            fg_mask_list.extend(aux["fg_masks"])
            alphas_list.extend(aux["alphas"])
            rgb_list.extend(aux["rgbs"])
            if aux["rendered"]:
                rendered[attn_id] = aux["rendered"]
            if aux["ref_tokens"]:
                ref_tokens[attn_id] = aux["ref_tokens"]
        else:
            raise ValueError(kind)

    def next_key():
        nonlocal key
        if key is None:
            return None
        key, sub = jax.random.split(key)
        return sub

    hs = []
    hrs = []
    for lp_block, spec_block in zip(params["input_blocks"], inb_spec):
        for lp, spec in zip(lp_block, spec_block):
            if expand_rows is not None and spec[0] == "attn":
                stream.h = jnp.take(stream.h, expand_rows, axis=0)
                hs = [jnp.take(t, expand_rows, axis=0) for t in hs]
                emb = emb_full
                expand_rows = None
            apply_layer(lp, spec, stream, next_key())
        hs.append(stream.h)
        hrs.append(stream.hr)

    if expand_rows is not None:  # no attention in the input blocks
        stream.h = jnp.take(stream.h, expand_rows, axis=0)
        hs = [jnp.take(t, expand_rows, axis=0) for t in hs]
        emb = emb_full
        expand_rows = None

    for lp, spec in zip(params["middle_block"], mid_spec):
        apply_layer(lp, spec, stream, next_key())

    for lp_block, spec_block in zip(params["output_blocks"], outb_spec):
        stream.h = jnp.concatenate([stream.h, hs.pop()], axis=-1)
        if stream.hr is not None:
            stream.hr = jnp.concatenate([stream.hr, hrs.pop()], axis=-1)
        for lp, spec in zip(lp_block, spec_block):
            apply_layer(lp, spec, stream, next_key())

    out = conv2d(
        params["out_conv"],
        group_norm_silu(params["out_norm"], stream.h, eps=1e-5),
    ).astype(x.dtype)

    aux = dict(
        fg_mask_list=fg_mask_list,
        alphas_list=alphas_list,
        rgb_list=rgb_list,
        rendered=rendered,
        ref_tokens=ref_tokens,
    )
    return out, aux


def no_time_unet_apply(params, cfg: UNetConfig, x, timesteps, context, y,
                       **kwargs):
    """UNet forward with the timestep conditioning zeroed
    (NoTimeUNetModel, openaimodel.py:1096-1099)."""
    return unet_apply(
        params, cfg, x, jnp.zeros_like(timesteps), context, y, **kwargs
    )
