"""CLIP text towers (SDXL's two text encoders) with V* modifier-token rows.

TPU-native redesign of the reference's FrozenCLIPEmbedder (CLIP ViT-L text,
sgm/modules/encoders/modules.py:378-516) and FrozenOpenCLIPEmbedder (ViT-bigG
text, :622-771). One generic pre-LN causal transformer covers both towers;
the differences are config (width/layers/activation) and which output is
consumed:

* CLIP-L ("hidden layer 11" in config, but the fork's custom_forward
  (modules.py:457-481) actually runs ALL 12 layers + final_layer_norm and
  returns that — reproduced here as ``final``);
* bigG: ``penultimate`` hidden state (no final LN) as crossattn features and
  ``pooled`` = ln_final(last)[eot] @ text_projection (modules.py:721-752).

Modifier-token mechanics (modules.py:417-431, 678-691): the V* token rows
live in a separate ``modifier_rows`` param concatenated after the frozen
embedding table; gradient isolation of all non-V* rows (main.py:627-643's
grad masking) holds by construction — only ``modifier_rows`` is placed in
the trainable pytree.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .nn import layer_norm, layer_norm_init, linear, linear_init


@dataclasses.dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_ratio: int = 4
    context_length: int = 77
    act: str = "quick_gelu"  # CLIP-L; bigG uses "gelu"
    ln_eps: float = 1e-5
    num_modifier_tokens: int = 1
    text_projection: bool = False  # bigG pooled path


CLIP_L_CONFIG = ClipTextConfig()
OPEN_CLIP_BIGG_CONFIG = ClipTextConfig(
    width=1280, layers=32, heads=20, act="gelu", text_projection=True
)


def _act(name):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    raise ValueError(name)


def _init_block(key, cfg: ClipTextConfig):
    d, m = cfg.width, cfg.width * cfg.mlp_ratio
    ks = jax.random.split(key, 6)
    return {
        "ln1": layer_norm_init(d),
        "q": linear_init(ks[0], d, d),
        "k": linear_init(ks[1], d, d),
        "v": linear_init(ks[2], d, d),
        "o": linear_init(ks[3], d, d),
        "ln2": layer_norm_init(d),
        "fc1": linear_init(ks[4], d, m),
        "fc2": linear_init(ks[5], m, d),
    }


def init_clip_text_params(key, cfg: ClipTextConfig):
    ks = jax.random.split(key, cfg.layers + 5)
    blocks = [_init_block(ks[i], cfg) for i in range(cfg.layers)]
    # stack layer params for lax.scan
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    p = {
        "token_embedding": jax.random.normal(
            ks[-1], (cfg.vocab_size, cfg.width), jnp.float32
        )
        * 0.02,
        "positional_embedding": jax.random.normal(
            ks[-2], (cfg.context_length, cfg.width), jnp.float32
        )
        * 0.01,
        "blocks": stacked,
        "ln_final": layer_norm_init(cfg.width),
        "modifier_rows": jnp.zeros((cfg.num_modifier_tokens, cfg.width), jnp.float32),
    }
    if cfg.text_projection:
        p["text_projection"] = {
            "w": jax.random.normal(ks[-3], (cfg.width, cfg.width), jnp.float32)
            * cfg.width**-0.5
        }
    return p


def init_modifier_rows(params, init_token_ids=(42170,)):
    """Seed the V* rows from existing token rows (modules.py:428-431:
    <new1> initialized from token id 42170)."""
    rows = jnp.stack(
        [params["token_embedding"][i] for i in init_token_ids]
    )
    return dict(params, modifier_rows=rows)


def _block_apply(p, x, mask, act, cfg: ClipTextConfig):
    b, t, d = x.shape
    h = cfg.heads
    hd = d // h
    y = layer_norm(p["ln1"], x, eps=cfg.ln_eps)
    q = linear(p["q"], y).reshape(b, t, h, hd)
    k = linear(p["k"], y).reshape(b, t, h, hd)
    v = linear(p["v"], y).reshape(b, t, h, hd)
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
    logits = logits * (hd**-0.5) + mask
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    attn = jnp.einsum("bhnm,bmhd->bnhd", probs, v).reshape(b, t, d)
    x = x + linear(p["o"], attn)
    y = layer_norm(p["ln2"], x, eps=cfg.ln_eps)
    x = x + linear(p["fc2"], act(linear(p["fc1"], y)))
    return x


def clip_text_apply(params, tokens, cfg: ClipTextConfig):
    """tokens: (B, 77) int32; ids >= vocab_size index ``modifier_rows``.

    Returns dict: last (B,77,D), penultimate (B,77,D), final (B,77,D)
    (=ln_final(last)), pooled (B,D) or None.
    """
    table = jnp.concatenate(
        [params["token_embedding"], params["modifier_rows"]], axis=0
    )
    # flattened 1-D gather: multi-dim index gathers compile pathologically
    # slowly on the TPU backend (minutes vs sub-second)
    b, t = tokens.shape
    # mode="clip": out-of-range ids clamp (jnp.take's default fills NaN)
    x = jnp.take(table, tokens.reshape(-1), axis=0, mode="clip").reshape(b, t, -1)
    x = x + params["positional_embedding"][None, :t]

    mask = jnp.triu(jnp.full((t, t), -jnp.inf, jnp.float32), k=1)[None, None]
    act = _act(cfg.act)

    def body(x, bp):
        out = _block_apply(bp, x, mask, act, cfg)
        return out, out

    last, states = jax.lax.scan(body, x, params["blocks"])
    penultimate = states[-2] if cfg.layers >= 2 else x
    final = layer_norm(params["ln_final"], last, eps=cfg.ln_eps)

    pooled = None
    if "text_projection" in params:
        # eot = highest token id per row (modules.py:748-752); flat 1-D gather
        eot = jnp.argmax(tokens, axis=-1)
        flat = final.reshape(b * t, -1)
        rows = jnp.take(flat, eot + jnp.arange(b) * t, axis=0, mode="clip")
        pooled = rows @ params["text_projection"]["w"]
    return {"last": last, "penultimate": penultimate, "final": final, "pooled": pooled}


# ---------------------------------------------------------------------------
# CLIP vision tower (for FrozenOpenCLIPImageEmbedder, modules.py:774-932)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ClipVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1280
    layers: int = 32
    heads: int = 16
    mlp_ratio: int = 4
    embed_dim: int = 1024  # projection output (ViT-H/14)
    act: str = "gelu"
    ln_eps: float = 1e-5

    @property
    def grid(self):
        return self.image_size // self.patch_size


def init_clip_vision_params(key, cfg: ClipVisionConfig):
    """Pre-LN ViT: conv patch embed (no bias) + class token + learned
    positions, ln_pre, transformer, ln_post on the class token, projection.
    Mirrors open_clip VisionTransformer / HF CLIPVisionModelWithProjection."""
    ks = jax.random.split(key, cfg.layers + 6)
    blocks = [
        _init_block(ks[i], ClipTextConfig(width=cfg.width, heads=cfg.heads,
                                          mlp_ratio=cfg.mlp_ratio, act=cfg.act))
        for i in range(cfg.layers)
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    scale = cfg.width**-0.5
    n_tok = cfg.grid * cfg.grid + 1
    return {
        "patch_embed": jax.random.normal(
            ks[-1], (cfg.patch_size, cfg.patch_size, 3, cfg.width), jnp.float32
        ) * 0.02,
        "class_embedding": jax.random.normal(ks[-2], (cfg.width,), jnp.float32)
        * scale,
        "positional_embedding": jax.random.normal(
            ks[-3], (n_tok, cfg.width), jnp.float32
        ) * scale,
        "ln_pre": layer_norm_init(cfg.width),
        "blocks": stacked,
        "ln_post": layer_norm_init(cfg.width),
        "proj": jax.random.normal(
            ks[-4], (cfg.width, cfg.embed_dim), jnp.float32
        ) * scale,
    }


def clip_vision_apply(params, images, cfg: ClipVisionConfig,
                      output_tokens=False):
    """images: (B, H, W, 3) preprocessed NHWC -> pooled (B, embed_dim).

    With output_tokens=True also returns the (B, n_patches, width) token
    states (open_clip ``visual.output_tokens``, used by
    FrozenOpenCLIPImageEmbedder when token outputs are requested).
    """
    b = images.shape[0]
    x = jax.lax.conv_general_dilated(
        images, params["patch_embed"].astype(images.dtype),
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).reshape(b, -1, cfg.width)
    cls = jnp.broadcast_to(
        params["class_embedding"].astype(x.dtype)[None, None], (b, 1, cfg.width)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["positional_embedding"][None].astype(x.dtype)
    x = layer_norm(params["ln_pre"], x, eps=cfg.ln_eps)

    blk_cfg = ClipTextConfig(width=cfg.width, heads=cfg.heads,
                             mlp_ratio=cfg.mlp_ratio, act=cfg.act)
    act = _act(cfg.act)
    zero_mask = jnp.zeros((1, 1, 1, 1), jnp.float32)  # bidirectional

    def body(h, bp):
        out = _block_apply(bp, h, zero_mask, act, blk_cfg)
        return out, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    pooled = layer_norm(params["ln_post"], x[:, 0], eps=cfg.ln_eps)
    pooled = pooled @ params["proj"].astype(pooled.dtype)
    if output_tokens:
        return pooled, x[:, 1:]
    return pooled


def load_clip_vision_torch(state_dict, cfg: ClipVisionConfig,
                           naming="open_clip"):
    """Torch CLIP vision weights -> param pytree.

    naming="open_clip": open_clip VisionTransformer keys (``visual.conv1``,
    fused ``attn.in_proj_*``, ``mlp.c_fc/c_proj`` — what
    FrozenOpenCLIPImageEmbedder's checkpoints carry).
    naming="hf": HuggingFace CLIPVisionModelWithProjection keys.
    """
    import numpy as np

    def arr(name):
        t = state_dict[name]
        return np.asarray(
            t.detach().cpu().numpy() if hasattr(t, "detach") else t,
            dtype=np.float32,
        )

    blocks = []
    if naming == "open_clip":
        conv = arr("visual.conv1.weight")  # (width, 3, p, p) no bias
        p = {
            "patch_embed": jnp.asarray(conv.transpose(2, 3, 1, 0)),
            "class_embedding": jnp.asarray(arr("visual.class_embedding")),
            "positional_embedding": jnp.asarray(
                arr("visual.positional_embedding")
            ),
            "ln_pre": {"scale": jnp.asarray(arr("visual.ln_pre.weight")),
                       "bias": jnp.asarray(arr("visual.ln_pre.bias"))},
            "ln_post": {"scale": jnp.asarray(arr("visual.ln_post.weight")),
                        "bias": jnp.asarray(arr("visual.ln_post.bias"))},
            "proj": jnp.asarray(arr("visual.proj")),  # already (width, out)
        }
        for i in range(cfg.layers):
            pre = f"visual.transformer.resblocks.{i}"
            wqkv = arr(f"{pre}.attn.in_proj_weight")  # (3d, d)
            bqkv = arr(f"{pre}.attn.in_proj_bias")
            d = cfg.width
            blocks.append({
                "ln1": {"scale": jnp.asarray(arr(f"{pre}.ln_1.weight")),
                        "bias": jnp.asarray(arr(f"{pre}.ln_1.bias"))},
                "q": {"w": jnp.asarray(wqkv[:d].T), "b": jnp.asarray(bqkv[:d])},
                "k": {"w": jnp.asarray(wqkv[d:2 * d].T),
                      "b": jnp.asarray(bqkv[d:2 * d])},
                "v": {"w": jnp.asarray(wqkv[2 * d:].T),
                      "b": jnp.asarray(bqkv[2 * d:])},
                "o": {"w": jnp.asarray(arr(f"{pre}.attn.out_proj.weight").T),
                      "b": jnp.asarray(arr(f"{pre}.attn.out_proj.bias"))},
                "ln2": {"scale": jnp.asarray(arr(f"{pre}.ln_2.weight")),
                        "bias": jnp.asarray(arr(f"{pre}.ln_2.bias"))},
                "fc1": {"w": jnp.asarray(arr(f"{pre}.mlp.c_fc.weight").T),
                        "b": jnp.asarray(arr(f"{pre}.mlp.c_fc.bias"))},
                "fc2": {"w": jnp.asarray(arr(f"{pre}.mlp.c_proj.weight").T),
                        "b": jnp.asarray(arr(f"{pre}.mlp.c_proj.bias"))},
            })
    elif naming == "hf":
        conv = arr("vision_model.embeddings.patch_embedding.weight")
        p = {
            "patch_embed": jnp.asarray(conv.transpose(2, 3, 1, 0)),
            "class_embedding": jnp.asarray(
                arr("vision_model.embeddings.class_embedding").reshape(-1)
            ),
            "positional_embedding": jnp.asarray(
                arr("vision_model.embeddings.position_embedding.weight")
            ),
            "ln_pre": {
                "scale": jnp.asarray(arr("vision_model.pre_layrnorm.weight")),
                "bias": jnp.asarray(arr("vision_model.pre_layrnorm.bias")),
            },
            "ln_post": {
                "scale": jnp.asarray(arr("vision_model.post_layernorm.weight")),
                "bias": jnp.asarray(arr("vision_model.post_layernorm.bias")),
            },
            "proj": jnp.asarray(arr("visual_projection.weight").T),
        }
        for i in range(cfg.layers):
            pre = f"vision_model.encoder.layers.{i}"
            blk = {
                "ln1": {"scale": jnp.asarray(arr(f"{pre}.layer_norm1.weight")),
                        "bias": jnp.asarray(arr(f"{pre}.layer_norm1.bias"))},
                "ln2": {"scale": jnp.asarray(arr(f"{pre}.layer_norm2.weight")),
                        "bias": jnp.asarray(arr(f"{pre}.layer_norm2.bias"))},
                "fc1": {"w": jnp.asarray(arr(f"{pre}.mlp.fc1.weight").T),
                        "b": jnp.asarray(arr(f"{pre}.mlp.fc1.bias"))},
                "fc2": {"w": jnp.asarray(arr(f"{pre}.mlp.fc2.weight").T),
                        "b": jnp.asarray(arr(f"{pre}.mlp.fc2.bias"))},
            }
            for ours, theirs in (("q", "q_proj"), ("k", "k_proj"),
                                 ("v", "v_proj"), ("o", "out_proj")):
                blk[ours] = {
                    "w": jnp.asarray(arr(f"{pre}.self_attn.{theirs}.weight").T),
                    "b": jnp.asarray(arr(f"{pre}.self_attn.{theirs}.bias")),
                }
            blocks.append(blk)
    else:
        raise ValueError(naming)

    p["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return p
