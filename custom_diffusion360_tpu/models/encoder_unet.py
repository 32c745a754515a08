"""Half-UNet encoder/classifier (EncoderUNetModel) and its attention pieces.

Reference: sgm/modules/diffusionmodules/openaimodel.py —
EncoderUNetModel (:1102-1304), AttentionBlock (:379-427),
QKVAttentionLegacy/QKVAttention (:450-513), AttentionPool2d (:29-58).
Unused by the CustomDiffusion360 method but part of the sgm framework
surface (e.g. noisy classifier guidance heads).

TPU-native conventions: NHWC activations, (in, out) linear weights, group
norms with f32 statistics (models/nn.py). The qkv projections keep the
reference's exact channel ordering (head-major for the legacy order,
qkv-major for the new order) so torch checkpoints import weight-for-weight.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp

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
)
from .unet import _init_resblock, _resblock_apply


# ---------------------------------------------------------------------------
# qkv attention, both channel orders (openaimodel.py:450-513)
# ---------------------------------------------------------------------------


def qkv_attention(qkv, n_heads, legacy=True):
    """qkv: (B, T, 3*H*ch) -> (B, T, H*ch).

    legacy=True means the channel axis is head-major ``[h, (q k v), ch]``
    (QKVAttentionLegacy, :459-475); False means qkv-major ``[(q k v), h, ch]``
    (QKVAttention, :491-509). Both scale q and k by ch**-0.25 before the
    product and softmax in f32.
    """
    b, t, width = qkv.shape
    ch = width // (3 * n_heads)
    if legacy:
        parts = qkv.reshape(b, t, n_heads, 3, ch)
        q, k, v = parts[:, :, :, 0], parts[:, :, :, 1], parts[:, :, :, 2]
    else:
        parts = qkv.reshape(b, t, 3, n_heads, ch)
        q, k, v = parts[:, :, 0], parts[:, :, 1], parts[:, :, 2]
    scale = 1.0 / math.sqrt(math.sqrt(ch))
    w = jnp.einsum(
        "bthc,bshc->bhts", q * scale, k * scale,
        preferred_element_type=jnp.float32,
    )
    w = jax.nn.softmax(w, axis=-1).astype(qkv.dtype)
    a = jnp.einsum("bhts,bshc->bthc", w, v)
    return a.reshape(b, t, n_heads * ch)


def _heads(channels, num_heads, num_head_channels):
    if num_head_channels == -1:
        return num_heads
    assert channels % num_head_channels == 0
    return channels // num_head_channels


def attention_block_init(key, channels):
    k1, _ = jax.random.split(key)
    return {
        "norm": group_norm_init(channels),
        "qkv": linear_init(k1, channels, 3 * channels),
        "proj_out": linear_init(k1, channels, channels, zero=True),
    }


def attention_block_apply(p, x, num_heads=1, num_head_channels=-1,
                          use_new_attention_order=False):
    """x: (B, H, W, C) -> same; residual spatial self-attention
    (AttentionBlock._forward, :421-427). The 1x1 convs become linears on
    the token axis."""
    b, h, w, c = x.shape
    heads = _heads(c, num_heads, num_head_channels)
    tokens = x.reshape(b, h * w, c)
    qkv = linear(p["qkv"], group_norm(p["norm"], tokens, eps=1e-5))
    a = qkv_attention(qkv, heads, legacy=not use_new_attention_order)
    return (tokens + linear(p["proj_out"], a)).reshape(b, h, w, c)


def attention_pool2d_init(key, spacial_dim, embed_dim, output_dim=None):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        # stored (tokens, C) channels-last; reference keeps (C, HW+1) (:42-44)
        "pos": jax.random.normal(
            k1, (spacial_dim**2 + 1, embed_dim), jnp.float32
        ) / embed_dim**0.5,
        "qkv": linear_init(k2, embed_dim, 3 * embed_dim),
        "proj": linear_init(k3, embed_dim, output_dim or embed_dim),
    }


def attention_pool2d_apply(p, x, num_heads_channels):
    """x: (B, H, W, C) -> (B, out_dim); CLIP-style mean-token attention
    pooling (AttentionPool2d.forward, :50-58; new qkv order)."""
    b, h, w, c = x.shape
    tokens = x.reshape(b, h * w, c)
    tokens = jnp.concatenate(
        [jnp.mean(tokens, axis=1, keepdims=True), tokens], axis=1
    )
    tokens = tokens + p["pos"].astype(tokens.dtype)
    qkv = linear(p["qkv"], tokens)
    a = qkv_attention(qkv, c // num_heads_channels, legacy=False)
    return linear(p["proj"], a)[:, 0]


# ---------------------------------------------------------------------------
# EncoderUNetModel (openaimodel.py:1102-1304)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class EncoderUNetConfig:
    image_size: int = 64
    in_channels: int = 4
    model_channels: int = 64
    out_channels: int = 10
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (4, 2)
    channel_mult: Tuple[int, ...] = (1, 2, 4, 8)
    num_heads: int = 1
    num_head_channels: int = -1
    use_new_attention_order: bool = False
    pool: str = "adaptive"  # adaptive | attention | spatial | spatial_v2


def _build_spec(cfg: EncoderUNetConfig):
    """Block layout mirroring the constructor loop (:1158-1219). Returns
    (blocks, middle_ch, ds, feature_size) where each block is a list of
    ("res", in, out) / ("attn", ch) / ("down", ch) entries."""
    blocks = [[("conv_in", cfg.in_channels, cfg.model_channels)]]
    feature_size = cfg.model_channels
    ch = cfg.model_channels
    ds = 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            layers = [("res", ch, mult * cfg.model_channels)]
            ch = mult * cfg.model_channels
            if ds in cfg.attention_resolutions:
                layers.append(("attn", ch))
            blocks.append(layers)
            feature_size += ch
        if level != len(cfg.channel_mult) - 1:
            blocks.append([("down", ch)])
            ds *= 2
            feature_size += ch
    feature_size += ch  # middle block
    return blocks, ch, ds, feature_size


def init_encoder_unet_params(key, cfg: EncoderUNetConfig = EncoderUNetConfig()):
    blocks, mid_ch, ds, feature_size = _build_spec(cfg)
    emb_dim = cfg.model_channels * 4
    keys = iter(jax.random.split(key, 200))
    params = {
        "time_embed": {
            "l1": linear_init(next(keys), cfg.model_channels, emb_dim),
            "l2": linear_init(next(keys), emb_dim, emb_dim),
        },
        "input_blocks": [],
        "middle_block": [
            _init_resblock(next(keys), mid_ch, mid_ch, emb_dim),
            attention_block_init(next(keys), mid_ch),
            _init_resblock(next(keys), mid_ch, mid_ch, emb_dim),
        ],
    }
    for block in blocks:
        bp = []
        for spec in block:
            if spec[0] == "conv_in":
                bp.append(conv2d_init(next(keys), spec[1], spec[2], 3))
            elif spec[0] == "res":
                bp.append(_init_resblock(next(keys), spec[1], spec[2], emb_dim))
            elif spec[0] == "attn":
                bp.append(attention_block_init(next(keys), spec[1]))
            else:  # down: conv_resample stride-2 conv (Downsample, :183-230)
                bp.append(conv2d_init(next(keys), spec[1], spec[1], 3))
        params["input_blocks"].append(bp)

    if cfg.pool == "adaptive":
        params["out"] = {
            "norm": group_norm_init(mid_ch),
            "conv": conv2d_init(next(keys), mid_ch, cfg.out_channels, 1,
                                zero=True),
        }
    elif cfg.pool == "attention":
        assert cfg.num_head_channels != -1
        params["out"] = {
            "norm": group_norm_init(mid_ch),
            "pool": attention_pool2d_init(
                next(keys), cfg.image_size // ds, mid_ch, cfg.out_channels
            ),
        }
    elif cfg.pool == "spatial":
        params["out"] = {
            "l1": linear_init(next(keys), feature_size, 2048),
            "l2": linear_init(next(keys), 2048, cfg.out_channels),
        }
    elif cfg.pool == "spatial_v2":
        params["out"] = {
            "l1": linear_init(next(keys), feature_size, 2048),
            "norm": group_norm_init(2048),
            "l2": linear_init(next(keys), 2048, cfg.out_channels),
        }
    else:
        raise NotImplementedError(f"Unexpected {cfg.pool} pooling")
    return params


def encoder_unet_apply(params, x, timesteps,
                       cfg: EncoderUNetConfig = EncoderUNetConfig()):
    """x: (B, H, W, Cin) NHWC, timesteps: (B,) -> (B, out_channels)
    (EncoderUNetModel.forward, :1281-1304)."""
    blocks, _, _, _ = _build_spec(cfg)
    emb = linear(
        params["time_embed"]["l2"],
        silu(
            linear(
                params["time_embed"]["l1"],
                timestep_embedding(timesteps, cfg.model_channels),
            )
        ),
    )
    spatial = cfg.pool.startswith("spatial")
    results = []
    h = x
    for block, bp in zip(blocks, params["input_blocks"]):
        for spec, p in zip(block, bp):
            if spec[0] == "conv_in":
                h = conv2d(p, h)
            elif spec[0] == "res":
                h = _resblock_apply(p, h, emb)
            elif spec[0] == "attn":
                h = attention_block_apply(
                    p, h, cfg.num_heads, cfg.num_head_channels,
                    cfg.use_new_attention_order,
                )
            else:
                # torch Downsample: conv stride 2, padding=1 both sides
                # (openaimodel.py:183-230), NOT XLA SAME (which pads (0,1))
                h = conv2d(p, h, stride=2, padding=((1, 1), (1, 1)))
        if spatial:
            results.append(jnp.mean(h, axis=(1, 2)))
    mid = params["middle_block"]
    h = _resblock_apply(mid[0], h, emb)
    h = attention_block_apply(mid[1], h, cfg.num_heads, cfg.num_head_channels,
                              cfg.use_new_attention_order)
    h = _resblock_apply(mid[2], h, emb)

    out = params["out"]
    if cfg.pool == "adaptive":
        h = group_norm_silu(out["norm"], h, eps=1e-5)
        h = jnp.mean(h, axis=(1, 2), keepdims=True)
        return conv2d(out["conv"], h).reshape(h.shape[0], -1)
    if cfg.pool == "attention":
        h = group_norm_silu(out["norm"], h, eps=1e-5)
        return attention_pool2d_apply(out["pool"], h, cfg.num_head_channels)
    results.append(jnp.mean(h, axis=(1, 2)))
    h = jnp.concatenate(results, axis=-1)
    if cfg.pool == "spatial":
        return linear(out["l2"], jax.nn.relu(linear(out["l1"], h)))
    # spatial_v2: Linear -> GroupNorm32(2048) -> SiLU -> Linear (:1271-1277)
    h = linear(out["l1"], h)
    h = silu(group_norm(out["norm"], h[:, None, :], eps=1e-5)[:, 0])
    return linear(out["l2"], h)
