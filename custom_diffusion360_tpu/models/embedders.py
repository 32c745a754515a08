"""Auxiliary conditioner embedders from the sgm framework surface.

Reference: sgm/modules/encoders/modules.py — IdentityEncoder (:253-258),
ClassEmbedder(ForMultiCond) (:261-292), FrozenOpenCLIPEmbedder2 (:519-619),
FrozenOpenCLIPImageEmbedder (:774-932), FrozenCLIPT5Encoder (:935-960),
SpatialRescaler (:963-1020), LowScaleEncoder (:1023-1114), GaussianEncoder
(:1137-1153). None are used by the CustomDiffusion360 method's training
config, but they are selectable framework components; each is a pure
function here (explicit PRNG keys; NHWC activations).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .clip import (
    ClipTextConfig,
    ClipVisionConfig,
    clip_text_apply,
    clip_vision_apply,
)
from .regularizers import diagonal_gaussian_regularizer
from .t5 import T5Config, t5_encode
from .vae import VAEConfig, vae_encode


# ---------------------------------------------------------------------------
# trivial embedders
# ---------------------------------------------------------------------------


def identity_encoder(x):
    """IdentityEncoder (modules.py:253-258)."""
    return x


def class_embedder_init(key, embed_dim, n_classes=1000):
    return {"embedding": jax.random.normal(
        key, (n_classes, embed_dim), jnp.float32)}


def class_embedder_apply(params, c, add_sequence_dim=False):
    """c: (B,) int class ids -> (B, D) or (B, 1, D)
    (ClassEmbedder, modules.py:261-280)."""
    out = jnp.take(params["embedding"], c.reshape(-1), axis=0)
    if add_sequence_dim:
        out = out[:, None, :]
    return out


def class_embedder_uc(n_classes, bs):
    """The extra "unconditional" class id (modules.py:274-280)."""
    return jnp.full((bs,), n_classes - 1, jnp.int32)


def class_embedder_multi_cond_apply(params, batch, key_name,
                                    add_sequence_dim=False):
    """ClassEmbedderForMultiCond (modules.py:283-292): reads batch[key_name]
    (possibly a list — first element is embedded), returns the batch dict
    with that key replaced by the embedding (re-listed if it was a list)."""
    val = batch[key_name]
    islist = isinstance(val, list)
    c = val[0] if islist else val
    out = class_embedder_apply(params, c, add_sequence_dim)
    res = dict(batch)
    res[key_name] = [out] if islist else out
    return res


# ---------------------------------------------------------------------------
# FrozenOpenCLIPEmbedder2 (modules.py:519-619)
# ---------------------------------------------------------------------------


def open_clip_embedder2(params, tokens, cfg: ClipTextConfig,
                        layer="last", legacy=True, return_pooled=False):
    """The generic OpenCLIP text embedder with selectable output layer.

    legacy=True: ln_final applied to the selected hidden state and returned
    alone (encode_with_transformer, modules.py:583-586). legacy=False: the
    selected RAW hidden state; with return_pooled also the eot-pooled
    projection of ln_final(last) (modules.py:587-601).
    """
    assert layer in ("last", "penultimate")
    outs = clip_text_apply(params, tokens, cfg)
    if legacy:
        assert not return_pooled
        from .nn import layer_norm

        return layer_norm(params["ln_final"], outs[layer], eps=cfg.ln_eps)
    z = outs["final"] if layer == "last" else outs[layer]
    # non-legacy "last" is ln_final(last) per modules.py:589-590
    if return_pooled:
        return z, outs["pooled"]
    return z


# ---------------------------------------------------------------------------
# FrozenOpenCLIPImageEmbedder (modules.py:774-932)
# ---------------------------------------------------------------------------

CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def clip_image_preprocess(x, size=224):
    """(B, H, W, 3) in [-1, 1] -> size x size CLIP-normalized.

    Reference preprocess (modules.py:824-836) uses kornia bicubic resize
    (align_corners=True, antialias); jax.image.resize's cubic kernel is the
    Keys kernel with antialiasing on downsample — numerically close, not
    bit-identical (documented deviation).
    """
    b = x.shape[0]
    x = jax.image.resize(x, (b, size, size, 3), method="cubic")
    x = (x + 1.0) / 2.0
    mean = jnp.asarray(CLIP_IMAGE_MEAN, x.dtype)
    std = jnp.asarray(CLIP_IMAGE_STD, x.dtype)
    return (x - mean) / std


def open_clip_image_embedder(
    params,
    images,
    cfg: ClipVisionConfig,
    key=None,
    ucg_rate=0.0,
    unsqueeze_dim=False,
    repeat_to_max_len=False,
    max_length=77,
    output_tokens=False,
):
    """images: (B, H, W, 3) in [-1, 1] -> pooled CLIP image embedding.

    Mirrors FrozenOpenCLIPImageEmbedder.forward (modules.py:843-895):
    optional per-sample ucg zero-dropout (explicit key), optional sequence
    unsqueeze or repeat-to-max-len; with output_tokens returns
    (tokens, pooled) like the reference's early return (:870-873).
    """
    z = clip_vision_apply(params, clip_image_preprocess(images, cfg.image_size),
                          cfg, output_tokens=output_tokens)
    tokens = None
    if output_tokens:
        z, tokens = z
    if ucg_rate > 0.0:
        if key is None:
            raise ValueError("ucg dropout requires a PRNG key")
        keep = jax.random.bernoulli(key, 1.0 - ucg_rate, (z.shape[0],))
        z = keep[:, None].astype(z.dtype) * z
        if tokens is not None:
            tokens = keep[:, None, None].astype(tokens.dtype) * tokens
    if unsqueeze_dim:
        z = z[:, None, :]
    if output_tokens:
        return tokens, z
    if repeat_to_max_len:
        z_ = z[:, None, :] if z.ndim == 2 else z
        return jnp.broadcast_to(
            z_, (z_.shape[0], max_length, z_.shape[-1])
        ), z
    return z


# ---------------------------------------------------------------------------
# FrozenCLIPT5Encoder (modules.py:935-960)
# ---------------------------------------------------------------------------


def clip_t5_encode(clip_params, t5_params, clip_tokens, t5_tokens,
                   clip_cfg: ClipTextConfig, t5_cfg: T5Config):
    """Returns [clip_z, t5_z] like FrozenCLIPT5Encoder.forward (:957-960);
    the CLIP half is the fork's final-LN behavior (see clip.py docstring)."""
    clip_z = clip_text_apply(clip_params, clip_tokens, clip_cfg)["final"]
    t5_z = t5_encode(t5_params, t5_tokens, t5_cfg)
    return [clip_z, t5_z]


# ---------------------------------------------------------------------------
# SpatialRescaler (modules.py:963-1020)
# ---------------------------------------------------------------------------


def spatial_rescaler_init(key, in_channels, out_channels, kernel_size=1,
                          bias=False):
    """Optional channel remap conv (modules.py:989-1000)."""
    from .nn import conv2d_init

    return {"mapper": conv2d_init(key, in_channels, out_channels,
                                  kernel=kernel_size, bias=bias)}


def spatial_rescaler(x, n_stages=1, method="bilinear", multiplier=0.5,
                     params=None):
    """x: (B, H, W, C) -> resized (and optionally channel-remapped).

    method ∈ {nearest, bilinear, bicubic, area}; "area" is mean pooling
    (integer downsample factors only). Each stage scales H and W by
    ``multiplier`` like torch F.interpolate(scale_factor=...)."""
    from .nn import conv2d

    for _ in range(n_stages):
        b, h, w, c = x.shape
        nh, nw = int(h * multiplier), int(w * multiplier)
        if method == "area":
            f = h // nh
            assert nh * f == h and nw * f == w, "area needs integer factor"
            x = jnp.mean(
                x.reshape(b, nh, f, nw, f, c), axis=(2, 4)
            )
        elif method == "nearest":
            # torch F.interpolate nearest picks floor(dst * src/dst)
            # (asymmetric), not jax.image.resize's half-pixel rounding
            ih = jnp.floor(jnp.arange(nh) * (h / nh)).astype(jnp.int32)
            iw = jnp.floor(jnp.arange(nw) * (w / nw)).astype(jnp.int32)
            x = jnp.take(jnp.take(x, ih, axis=1), iw, axis=2)
        else:
            jmethod = {"bilinear": "linear", "bicubic": "cubic"}[method]
            x = jax.image.resize(x, (b, nh, nw, c), method=jmethod)
    if params is not None:
        x = conv2d(params["mapper"], x)
    return x


# ---------------------------------------------------------------------------
# LowScaleEncoder (modules.py:1023-1114)
# ---------------------------------------------------------------------------


def make_linear_beta_schedule(timesteps=1000, linear_start=1e-4,
                              linear_end=2e-2):
    """"linear" schedule (diffusionmodules/util.py make_beta_schedule):
    betas = linspace(sqrt(start), sqrt(end))^2, f64 like the reference."""
    import numpy as np

    return jnp.asarray(
        np.linspace(linear_start**0.5, linear_end**0.5, timesteps,
                    dtype=np.float64) ** 2,
        jnp.float32,
    )


@dataclasses.dataclass(frozen=True)
class LowScaleConfig:
    timesteps: int = 1000
    linear_start: float = 1e-4
    linear_end: float = 2e-2
    max_noise_level: int = 250
    output_size: Optional[int] = 64
    scale_factor: float = 1.0


def low_scale_encode(vae_params, x, key, cfg: LowScaleConfig = LowScaleConfig(),
                     vae_cfg: VAEConfig = VAEConfig()):
    """x: (B, H, W, 3) -> (noised low-scale latent, noise_level)
    (LowScaleEncoder.forward, modules.py:1099-1110): VAE-encode + sample,
    scale, q_sample at a random level <= max_noise_level, nearest-resize."""
    k_post, k_level, k_noise = jax.random.split(key, 3)
    moments = vae_encode(vae_params, x, vae_cfg)
    z, _ = diagonal_gaussian_regularizer(moments, key=k_post)
    z = z * cfg.scale_factor
    betas = make_linear_beta_schedule(cfg.timesteps, cfg.linear_start,
                                      cfg.linear_end)
    alphas_cumprod = jnp.cumprod(1.0 - betas)
    level = jax.random.randint(k_level, (x.shape[0],), 0, cfg.max_noise_level)
    sqrt_ac = jnp.take(jnp.sqrt(alphas_cumprod), level)
    sqrt_1mac = jnp.take(jnp.sqrt(1.0 - alphas_cumprod), level)
    noise = jax.random.normal(k_noise, z.shape, z.dtype)
    z = sqrt_ac[:, None, None, None] * z + sqrt_1mac[:, None, None, None] * noise
    if cfg.output_size is not None:
        b, _, _, c = z.shape
        z = jax.image.resize(
            z, (b, cfg.output_size, cfg.output_size, c), method="nearest"
        )
    return z, level


def low_scale_decode(vae_params, z, cfg: LowScaleConfig = LowScaleConfig(),
                     vae_cfg: VAEConfig = VAEConfig()):
    from .vae import vae_decode

    return vae_decode(vae_params, z / cfg.scale_factor, vae_cfg)


# ---------------------------------------------------------------------------
# GaussianEncoder (modules.py:1137-1153)
# ---------------------------------------------------------------------------


def gaussian_encoder(vae_params, x, key, weight=1.0, flatten_output=True,
                     vae_cfg: VAEConfig = VAEConfig()):
    """VAE-encoder + KL posterior sample; returns (log, z) with z flattened
    to (B, hw, C) tokens when flatten_output (modules.py:1146-1153).

    The reference runs the bare Encoder net (no quant_conv); our vae_encode
    includes SDXL's quant_conv 1x1 — a documented structural difference of
    the VAE stack (it is part of 'encoder' weights here).
    """
    moments = vae_encode(vae_params, x, vae_cfg)
    z, log = diagonal_gaussian_regularizer(moments, key=key)
    log = dict(log, loss=log["kl_loss"], weight=weight)
    if flatten_output:
        b, h, w, c = z.shape
        z = z.reshape(b, h * w, c)
    return log, z
