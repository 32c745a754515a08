"""Remaining sgm network blocks outside the CustomDiffusion360 hot path.

Reference coverage (all selectable framework components, none used by the
method's training config):

* LinearAttention / LinAttnBlock — sgm/modules/attention.py:124-145,
  sgm/modules/diffusionmodules/model.py:154-159 (make_attn "linear")
* SpatialSelfAttention — attention.py:147-189
* BasicTransformerSingleLayerBlock — attention.py:640-681
* TransposedUpsample — diffusionmodules/openaimodel.py:167-180
* DDPM pixel-space Model — diffusionmodules/model.py:312-485 (the classic
  VAE-net-shaped diffusion UNet with DDPM skip-stack and sin|cos timestep
  embedding)
* DiracDistribution / normal_kl — distributions/distributions.py:13-21,75-102

Functional NHWC, explicit keys, (in, out) linear weights.
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
    group_norm_silu,
    linear,
    linear_init,
    silu,
    upsample_nearest_2x,
)
from .transformer import (
    cross_attention_apply,
    init_cross_attention,
    init_feedforward,
    feedforward_apply,
)
from .nn import layer_norm, layer_norm_init


# ---------------------------------------------------------------------------
# DDPM timestep embedding (model.py:26-44): [sin | cos], /(half-1) spacing
# ---------------------------------------------------------------------------


def ddpm_timestep_embedding(t, dim):
    half = dim // 2
    freqs = jnp.exp(
        -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / (half - 1)
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


# ---------------------------------------------------------------------------
# LinearAttention (attention.py:124-145)
# ---------------------------------------------------------------------------


def init_linear_attention(key, dim, heads=4, dim_head=32):
    k1, k2 = jax.random.split(key)
    hidden = dim_head * heads
    return {
        "to_qkv": linear_init(k1, dim, hidden * 3, bias=False),
        "to_out": linear_init(k2, hidden, dim),
    }


def linear_attention_apply(p, x, heads=4):
    """x: (B, H, W, C). Efficient attention: softmax over keys' token axis,
    then two (d, e)-sized contractions instead of an (n, n) score matrix."""
    b, h, w, c = x.shape
    qkv = linear(p["to_qkv"], x.reshape(b, h * w, -1))
    hidden = qkv.shape[-1] // 3
    dh = hidden // heads
    # channel layout (qkv, heads, c) — torch "b (qkv heads c) h w" rearrange
    qkv = qkv.reshape(b, h * w, 3, heads, dh)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    k = jax.nn.softmax(k, axis=1)  # softmax over tokens (dim=-1 on (.., n))
    context = jnp.einsum("bnhd,bnhe->bhde", k, v)
    out = jnp.einsum("bhde,bnhd->bnhe", context, q)
    out = out.reshape(b, h * w, hidden)
    return linear(p["to_out"], out).reshape(b, h, w, c)


def init_lin_attn_block(key, in_channels):
    """LinAttnBlock (model.py:154-159): heads=1, dim_head=channels."""
    return init_linear_attention(key, in_channels, heads=1,
                                 dim_head=in_channels)


def lin_attn_block_apply(p, x):
    return linear_attention_apply(p, x, heads=1)


# ---------------------------------------------------------------------------
# SpatialSelfAttention (attention.py:147-189)
# ---------------------------------------------------------------------------


def init_spatial_self_attention(key, in_channels):
    from .nn import group_norm_init

    ks = jax.random.split(key, 4)
    return {
        "norm": group_norm_init(in_channels),
        "q": linear_init(ks[0], in_channels, in_channels),
        "k": linear_init(ks[1], in_channels, in_channels),
        "v": linear_init(ks[2], in_channels, in_channels),
        "proj_out": linear_init(ks[3], in_channels, in_channels),
    }


def spatial_self_attention_apply(p, x):
    """x: (B, H, W, C) -> residual single-head conv attention (1x1 convs are
    token-axis linears here)."""
    b, h, w, c = x.shape
    t = group_norm(p["norm"], x).reshape(b, h * w, c)
    q, k, v = linear(p["q"], t), linear(p["k"], t), linear(p["v"], t)
    s = jnp.einsum("bic,bjc->bij", q, k,
                   preferred_element_type=jnp.float32) * (c**-0.5)
    a = jax.nn.softmax(s, axis=2).astype(v.dtype)
    out = jnp.einsum("bij,bjc->bic", a, v)
    return x + linear(p["proj_out"], out).reshape(b, h, w, c)


# ---------------------------------------------------------------------------
# BasicTransformerSingleLayerBlock (attention.py:640-681)
# ---------------------------------------------------------------------------


def init_single_layer_block(key, dim, n_heads, d_head, context_dim=None):
    k1, k2 = jax.random.split(key)
    return {
        "norm1": layer_norm_init(dim),
        "attn1": init_cross_attention(k1, dim, context_dim or dim, n_heads,
                                      d_head),
        "norm2": layer_norm_init(dim),
        "ff": init_feedforward(k2, dim),
    }


def single_layer_block_apply(p, x, context=None, *, n_heads):
    x = cross_attention_apply(
        p["attn1"], layer_norm(p["norm1"], x), context, n_heads=n_heads
    ) + x
    return feedforward_apply(p["ff"], layer_norm(p["norm2"], x)) + x


# ---------------------------------------------------------------------------
# TransposedUpsample (openaimodel.py:167-180)
# ---------------------------------------------------------------------------


def init_transposed_upsample(key, channels, out_channels=None, ks=5):
    out_channels = out_channels or channels
    fan_in = channels * ks * ks
    bound = math.sqrt(1.0 / fan_in)
    k1, k2 = jax.random.split(key)
    return {
        # (kh, kw, OUT, IN): lax.conv_transpose(transpose_kernel=True) takes
        # the forward-conv kernel whose gradient this op computes (torch
        # ConvTranspose2d weight (in, out, kh, kw) -> permute(2, 3, 1, 0))
        "w": jax.random.uniform(k1, (ks, ks, out_channels, channels),
                                jnp.float32, -bound, bound),
        "b": jax.random.uniform(k2, (out_channels,), jnp.float32, -bound,
                                bound),
    }


def transposed_upsample_apply(p, x, ks=5):
    """Learned 2x upsample, no padding: out = 2*in + ks - 2 (torch
    ConvTranspose2d stride-2 semantics)."""
    y = jax.lax.conv_transpose(
        x, p["w"].astype(x.dtype), strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True,
    )
    return y + p["b"].astype(y.dtype)


# ---------------------------------------------------------------------------
# DDPM pixel-space Model (model.py:312-485)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DDPMModelConfig:
    ch: int = 64
    out_ch: int = 3
    ch_mult: Tuple[int, ...] = (1, 2, 4, 8)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    in_channels: int = 3
    resolution: int = 64
    use_timestep: bool = True
    attn_type: str = "vanilla"  # or "linear" / "none"


def _init_res(key, cin, cout, temb_ch):
    ks = jax.random.split(key, 4)
    from .nn import group_norm_init

    p = {
        "norm1": group_norm_init(cin),
        "conv1": conv2d_init(ks[0], cin, cout, 3),
        "norm2": group_norm_init(cout),
        "conv2": conv2d_init(ks[1], cout, cout, 3),
    }
    if temb_ch > 0:
        p["temb_proj"] = linear_init(ks[2], temb_ch, cout)
    if cin != cout:
        p["nin_shortcut"] = conv2d_init(ks[3], cin, cout, 1)
    return p


def _res_apply(p, x, temb):
    """ResnetBlock with temb injection between the convs (model.py:131-151);
    GroupNorm eps 1e-6 + swish."""
    h = conv2d(p["conv1"], group_norm_silu(p["norm1"], x))
    if temb is not None:
        h = h + linear(p["temb_proj"], silu(temb))[:, None, None].astype(
            h.dtype)
    h = conv2d(p["conv2"], group_norm_silu(p["norm2"], h))
    if "nin_shortcut" in p:
        x = conv2d(p["nin_shortcut"], x)
    return x + h


def _init_attn_any(key, ch, attn_type):
    if attn_type == "vanilla":
        return init_spatial_self_attention(key, ch)
    if attn_type == "linear":
        return init_lin_attn_block(key, ch)
    return {}


def _attn_any(p, x, attn_type):
    if attn_type == "vanilla":
        return spatial_self_attention_apply(p, x)
    if attn_type == "linear":
        return lin_attn_block_apply(p, x)
    return x


def init_ddpm_model_params(key, cfg: DDPMModelConfig = DDPMModelConfig()):
    keys = iter(jax.random.split(key, 400))
    temb_ch = cfg.ch * 4 if cfg.use_timestep else 0
    params = {"conv_in": conv2d_init(next(keys), cfg.in_channels, cfg.ch, 3)}
    if cfg.use_timestep:
        params["temb"] = {
            "dense0": linear_init(next(keys), cfg.ch, temb_ch),
            "dense1": linear_init(next(keys), temb_ch, temb_ch),
        }
    in_mult = (1,) + tuple(cfg.ch_mult)
    curr_res = cfg.resolution
    down = []
    block_in = cfg.ch
    for i, mult in enumerate(cfg.ch_mult):
        lvl = {"block": [], "attn": []}
        block_in = cfg.ch * in_mult[i]
        block_out = cfg.ch * mult
        for _ in range(cfg.num_res_blocks):
            lvl["block"].append(_init_res(next(keys), block_in, block_out,
                                          temb_ch))
            block_in = block_out
            if curr_res in cfg.attn_resolutions:
                lvl["attn"].append(
                    _init_attn_any(next(keys), block_in, cfg.attn_type))
        if i != len(cfg.ch_mult) - 1:
            lvl["downsample"] = conv2d_init(next(keys), block_in, block_in, 3)
            curr_res //= 2
        down.append(lvl)
    params["down"] = down
    params["mid"] = {
        "block_1": _init_res(next(keys), block_in, block_in, temb_ch),
        "attn_1": _init_attn_any(next(keys), block_in, cfg.attn_type),
        "block_2": _init_res(next(keys), block_in, block_in, temb_ch),
    }
    up = [None] * len(cfg.ch_mult)
    for i in reversed(range(len(cfg.ch_mult))):
        lvl = {"block": [], "attn": []}
        block_out = cfg.ch * cfg.ch_mult[i]
        skip_in = cfg.ch * cfg.ch_mult[i]
        for i_block in range(cfg.num_res_blocks + 1):
            if i_block == cfg.num_res_blocks:
                skip_in = cfg.ch * in_mult[i]
            lvl["block"].append(
                _init_res(next(keys), block_in + skip_in, block_out, temb_ch))
            block_in = block_out
            if curr_res in cfg.attn_resolutions:
                lvl["attn"].append(
                    _init_attn_any(next(keys), block_in, cfg.attn_type))
        if i != 0:
            lvl["upsample"] = conv2d_init(next(keys), block_in, block_in, 3)
            curr_res *= 2
        up[i] = lvl
    params["up"] = up
    from .nn import group_norm_init

    params["norm_out"] = group_norm_init(block_in)
    params["conv_out"] = conv2d_init(next(keys), block_in, cfg.out_ch, 3)
    return params


def ddpm_model_apply(params, x, t=None, context=None,
                     cfg: DDPMModelConfig = DDPMModelConfig()):
    """x: (B, H, W, C) NHWC; context concatenates on channels
    (model.py:434-481)."""
    if context is not None:
        x = jnp.concatenate([x, context], axis=-1)
    temb = None
    if cfg.use_timestep:
        temb = ddpm_timestep_embedding(t, cfg.ch)
        temb = linear(params["temb"]["dense1"],
                      silu(linear(params["temb"]["dense0"], temb)))

    hs = [conv2d(params["conv_in"], x)]
    for i, lvl in enumerate(params["down"]):
        for j, bp in enumerate(lvl["block"]):
            h = _res_apply(bp, hs[-1], temb)
            if lvl["attn"]:
                h = _attn_any(lvl["attn"][j], h, cfg.attn_type)
            hs.append(h)
        if "downsample" in lvl:
            # VAE-style asymmetric (0,1) pad, stride 2 (model.py:84-91)
            h = jnp.pad(hs[-1], ((0, 0), (0, 1), (0, 1), (0, 0)))
            hs.append(conv2d(lvl["downsample"], h, stride=2, padding="VALID"))

    h = _res_apply(params["mid"]["block_1"], hs[-1], temb)
    h = _attn_any(params["mid"]["attn_1"], h, cfg.attn_type)
    h = _res_apply(params["mid"]["block_2"], h, temb)

    for i in reversed(range(len(cfg.ch_mult))):
        lvl = params["up"][i]
        for j, bp in enumerate(lvl["block"]):
            h = _res_apply(bp, jnp.concatenate([h, hs.pop()], axis=-1), temb)
            if lvl["attn"]:
                h = _attn_any(lvl["attn"][j], h, cfg.attn_type)
        if "upsample" in lvl:
            h = conv2d(lvl["upsample"], upsample_nearest_2x(h))

    return conv2d(params["conv_out"], group_norm_silu(params["norm_out"], h))


# ---------------------------------------------------------------------------
# distributions (distributions.py:13-21, 75-102)
# ---------------------------------------------------------------------------


def dirac_sample(value):
    """DiracDistribution: sample() == mode() == value."""
    return value


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL(N1 || N2) for diagonal Gaussians, broadcasting like the
    reference (distributions.py:75-102)."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )
