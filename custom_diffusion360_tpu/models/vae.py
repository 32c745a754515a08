"""SDXL VAE (first stage) — encoder, decoder, diagonal Gaussian.

TPU-native redesign of the reference's AutoencoderKLInferenceWrapper
(sgm/models/autoencoder.py:282-322) and the conv Encoder/Decoder nets
(sgm/modules/diffusionmodules/model.py:487-748, attention :161-230,
DiagonalGaussianDistribution in sgm/modules/distributions/distributions.py:
24-102). NHWC layout; single-head attention at the bottleneck; latents
scaled by 0.13025 by the engine (not here), matching scale_factor in
train_co3d_concept.yaml:5.

Config matches train_co3d_concept.yaml:104-115: ch=128, ch_mult (1,2,4,4),
2 res blocks, no attn resolutions (bottleneck attn only), z_channels=4,
double_z.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import dot_product_attention
from .nn import (
    conv2d,
    conv2d_init,
    group_norm,
    group_norm_init,
    group_norm_silu,
    silu,
    upsample_nearest_2x,
)


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    in_channels: int = 3
    out_ch: int = 3
    z_channels: int = 4
    double_z: bool = True
    scale_factor: float = 0.13025


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------


def _conv3(p, x):
    """3x3 SAME conv with optional TPU implicit-GEMM dispatch
    (CD360_VAE_CONV=pallas; default stays on XLA's emitters).

    MEASURED SPLIT RESULT (v5e, round 5): per-conv STANDALONE the Pallas
    kernel (ops/conv3x3.py) beats the emitter at every decoder shape by
    21-31% (512^2 x 512ch: 9.75 vs 12.94 ms; 1024^2 x 256ch: 12.78 vs
    18.61 — kernel at 97-127 TFLOPS vs the emitter's 39-96). IN-GRAPH the
    full decode measured 158.9 ms vs 143.2 XLA (vae_bench A/B): the
    kernel needs a jnp.pad per conv (~0.7 ms x ~18 convs of pure copy)
    and un-fuses the GN/SiLU producers the emitters absorb into their
    input read — integration overhead ~35 ms eats the ~20 ms of conv
    wins. Removing it needs in-kernel padding via a padded-activation
    calling convention through the decoder (~0.3% end-to-end for real
    complexity — not taken; see MFU.md VAE ledger). Unsupported shapes
    (tiny test configs, conv_in/out channel counts) fall back
    automatically; the UNet's convs are not routed here — they already
    run at their roofline (MFU.md step table)."""
    from ..ops import conv3x3

    if (
        os.environ.get("CD360_VAE_CONV", "xla") == "pallas"
        and (jax.devices()[0].platform == "tpu" or conv3x3._INTERPRET)
        and conv3x3.conv3x3_supported(x, p["w"])
    ):
        y = conv3x3.conv3x3_gemm(x, p["w"])
        if "b" in p:
            y = y + p["b"].astype(y.dtype)
        return y
    return conv2d(p, x)


def _gn_silu(p, x):
    return group_norm_silu(p, x, num_groups=min(32, x.shape[-1]))


def _gn(p, x):
    # GroupNorm(32) for all real channel counts; degrades gracefully in tiny
    # test configs
    return group_norm(p, x, num_groups=min(32, x.shape[-1]))


def _init_res(key, in_ch, out_ch):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": group_norm_init(in_ch),
        "conv1": conv2d_init(ks[0], in_ch, out_ch, 3),
        "norm2": group_norm_init(out_ch),
        "conv2": conv2d_init(ks[1], out_ch, out_ch, 3),
    }
    if in_ch != out_ch:
        p["nin_shortcut"] = conv2d_init(ks[2], in_ch, out_ch, 1)
    return p


def _res_apply(p, x):
    h = _conv3(p["conv1"], _gn_silu(p["norm1"], x))
    h = _conv3(p["conv2"], _gn_silu(p["norm2"], h))
    if "nin_shortcut" in p:
        x = conv2d(p["nin_shortcut"], x)
    return x + h


def _init_attn(key, ch):
    ks = jax.random.split(key, 4)
    return {
        "norm": group_norm_init(ch),
        "q": conv2d_init(ks[0], ch, ch, 1),
        "k": conv2d_init(ks[1], ch, ch, 1),
        "v": conv2d_init(ks[2], ch, ch, 1),
        "proj_out": conv2d_init(ks[3], ch, ch, 1),
    }


def _attn_apply(p, x):
    """Single-head bottleneck self-attention (model.py:161-201)."""
    b, h, w, c = x.shape
    hn = _gn(p["norm"], x)
    q = conv2d(p["q"], hn).reshape(b, h * w, 1, c)
    k = conv2d(p["k"], hn).reshape(b, h * w, 1, c)
    v = conv2d(p["v"], hn).reshape(b, h * w, 1, c)
    out = dot_product_attention(q, k, v).reshape(b, h, w, c)
    return x + conv2d(p["proj_out"], out)


def _downsample(p, x):
    # torch pads (0,1,0,1) then stride-2 VALID conv (model.py:84-92)
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(2, 2),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["b"].astype(x.dtype)


# ---------------------------------------------------------------------------
# encoder / decoder
# ---------------------------------------------------------------------------


def init_vae_params(key, cfg: VAEConfig = VAEConfig()):
    keys = iter(jax.random.split(key, 200))
    ch = cfg.ch
    n_lv = len(cfg.ch_mult)
    enc: dict[str, Any] = {"conv_in": conv2d_init(next(keys), cfg.in_channels, ch, 3)}
    in_mult = (1,) + tuple(cfg.ch_mult)
    for i in range(n_lv):
        block_in, block_out = ch * in_mult[i], ch * cfg.ch_mult[i]
        blocks = []
        for j in range(cfg.num_res_blocks):
            blocks.append(_init_res(next(keys), block_in if j == 0 else block_out, block_out))
        lvl = {"block": blocks}
        if i != n_lv - 1:
            lvl["downsample"] = conv2d_init(next(keys), block_out, block_out, 3)
        enc[f"down_{i}"] = lvl
    bi = ch * cfg.ch_mult[-1]
    enc["mid"] = {
        "block_1": _init_res(next(keys), bi, bi),
        "attn_1": _init_attn(next(keys), bi),
        "block_2": _init_res(next(keys), bi, bi),
    }
    zc = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
    enc["norm_out"] = group_norm_init(bi)
    enc["conv_out"] = conv2d_init(next(keys), bi, zc, 3)

    dec: dict[str, Any] = {
        "conv_in": conv2d_init(next(keys), cfg.z_channels, bi, 3),
        "mid": {
            "block_1": _init_res(next(keys), bi, bi),
            "attn_1": _init_attn(next(keys), bi),
            "block_2": _init_res(next(keys), bi, bi),
        },
    }
    block_in = bi
    for i in reversed(range(n_lv)):
        block_out = ch * cfg.ch_mult[i]
        blocks = []
        for j in range(cfg.num_res_blocks + 1):
            blocks.append(_init_res(next(keys), block_in if j == 0 else block_out, block_out))
        block_in = block_out
        lvl = {"block": blocks}
        if i != 0:
            lvl["upsample"] = conv2d_init(next(keys), block_out, block_out, 3)
        dec[f"up_{i}"] = lvl
    dec["norm_out"] = group_norm_init(block_in)
    dec["conv_out"] = conv2d_init(next(keys), block_in, cfg.out_ch, 3)

    # quant convs (autoencoder.py:210-214)
    q = {
        "quant_conv": conv2d_init(next(keys), zc, zc, 1),
        "post_quant_conv": conv2d_init(next(keys), cfg.z_channels, cfg.z_channels, 1),
    }
    return {"encoder": enc, "decoder": dec, **q}


def vae_encode(params, x, cfg: VAEConfig = VAEConfig()):
    """x: (B, H, W, 3) in [-1, 1] -> moments (B, H/8, W/8, 2*z)."""
    enc = params["encoder"]
    h = conv2d(enc["conv_in"], x)
    n_lv = len(cfg.ch_mult)
    for i in range(n_lv):
        lvl = enc[f"down_{i}"]
        for bp in lvl["block"]:
            h = _res_apply(bp, h)
        if "downsample" in lvl:
            h = _downsample(lvl["downsample"], h)
    h = _res_apply(enc["mid"]["block_1"], h)
    h = _attn_apply(enc["mid"]["attn_1"], h)
    h = _res_apply(enc["mid"]["block_2"], h)
    h = conv2d(enc["conv_out"], _gn_silu(enc["norm_out"], h))
    return conv2d(params["quant_conv"], h)


def vae_decode(params, z, cfg: VAEConfig = VAEConfig()):
    """z: (B, h, w, z_channels) -> (B, 8h, 8w, 3)."""
    dec = params["decoder"]
    z = conv2d(params["post_quant_conv"], z)
    h = conv2d(dec["conv_in"], z)
    h = _res_apply(dec["mid"]["block_1"], h)
    h = _attn_apply(dec["mid"]["attn_1"], h)
    h = _res_apply(dec["mid"]["block_2"], h)
    for i in reversed(range(len(cfg.ch_mult))):
        lvl = dec[f"up_{i}"]
        for bp in lvl["block"]:
            h = _res_apply(bp, h)
        if "upsample" in lvl:
            h = _conv3(lvl["upsample"], upsample_nearest_2x(h))
    return conv2d(dec["conv_out"], _gn_silu(dec["norm_out"], h))


def diagonal_gaussian_sample(key, moments, sample: bool = True):
    """DiagonalGaussianDistribution (distributions.py:24-62): moments =
    [mean | logvar] along channels; logvar clamped to [-30, 20]."""
    mean, logvar = jnp.split(moments, 2, axis=-1)
    if not sample:
        return mean
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)


def encode_first_stage(params, x, key=None, cfg: VAEConfig = VAEConfig(), sample=True):
    """encode + sample + scale (diffusion.py:214-219)."""
    moments = vae_encode(params, x, cfg)
    z = diagonal_gaussian_sample(key, moments, sample=sample and key is not None)
    return z * cfg.scale_factor


# latent side at/above which batched decode switches to per-row lax.map
# (1024^2 output); module constant so tests can exercise both paths
_PER_ROW_DECODE_MIN_LATENT = 128


def decode_first_stage(params, z, cfg: VAEConfig = VAEConfig()):
    """Latents -> images. At LARGE extents (latent side >= 128, i.e. 1024^2
    output) batched rows decode through a lax.map so only ONE image's
    decoder activations are live at a time: the decoder's large-spatial
    feature maps (~2 GB/image peak at 1024^2) scale linearly with batch and
    are what pushed batch-4 1024^2 serving past the chip's HBM (BENCH_r05
    batch-4 memory record); per-image decode costs nothing there — the conv
    emitters at these extents gain ~nothing from batching (vae_bench, NOTES
    round-3). Small-extent batches (log_images grids, 512^2 serving, DP
    meshes where the batch axis is sharded) keep the plain batched decode:
    their activations fit, and the sequential map would serialize work a
    data-parallel mesh wants to split."""
    z = z / cfg.scale_factor
    if z.shape[0] == 1 or z.shape[1] < _PER_ROW_DECODE_MIN_LATENT:
        return vae_decode(params, z, cfg)
    return jax.lax.map(
        lambda zi: vae_decode(params, zi[None], cfg)[0], z
    )


def autoencoding_engine_encode(
    params,
    x,
    regularizer=None,
    key=None,
    cfg: VAEConfig = VAEConfig(),
    return_reg_log=False,
):
    """Generic encode with a pluggable latent regularizer.

    Reference: AutoencodingEngine.encode (sgm/models/autoencoder.py:116-214)
    — encoder output runs through the configured regularizer (KL sampling,
    identity, or a quantizer from models/regularizers.py). ``regularizer``
    is a callable ``moments -> (z, log_dict)``; the default is the KL
    posterior sampler used by AutoencoderKL.
    """
    from .regularizers import diagonal_gaussian_regularizer

    moments = vae_encode(params, x, cfg)
    if regularizer is None:
        z, reg_log = diagonal_gaussian_regularizer(
            moments, key=key, sample=key is not None
        )
    else:
        z, reg_log = regularizer(moments)
    if return_reg_log:
        return z, reg_log
    return z


def identity_first_stage_encode(params, x, *_, **__):
    """IdentityFirstStage (sgm/models/autoencoder.py:324-335): a no-op
    first stage for pixel-space diffusion. ``params`` is unused."""
    return x


def identity_first_stage_decode(params, z, *_, **__):
    return z
