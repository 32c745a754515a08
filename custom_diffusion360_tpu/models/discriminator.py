"""PatchGAN discriminator, ActNorm, and GAN losses for autoencoder training.

Reference: sgm/modules/autoencoding/lpips/model/model.py (NLayerDiscriminator
+ weights_init), lpips/util.py:105-187 (ActNorm), lpips/vqperceptual.py
(hinge/vanilla d-losses). Unused by the CustomDiffusion360 method (the SDXL
VAE arrives frozen) but part of the sgm autoencoder-training surface.

Functional NHWC port: BatchNorm statistics are computed per batch in
training (the reference trains the discriminator, so batch stats are the
live path); ActNorm's data-dependent init is an explicit
``actnorm_init_from_batch`` call returning the initialized params (the
reference mutates-on-first-forward, util.py:89-92).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# ActNorm (lpips/util.py:105-187)
# ---------------------------------------------------------------------------


def actnorm_init(num_features):
    return {"loc": jnp.zeros((num_features,), jnp.float32),
            "scale": jnp.ones((num_features,), jnp.float32)}


def actnorm_init_from_batch(x):
    """Data-dependent init: loc = -mean, scale = 1/(std+1e-6) per channel
    over (N, H, W) (util.py:58-77; std is torch's unbiased default)."""
    c = x.shape[-1]
    flat = x.reshape(-1, c).astype(jnp.float32)
    mean = flat.mean(0)
    std = jnp.std(flat, axis=0, ddof=1)
    return {"loc": -mean, "scale": 1.0 / (std + 1e-6)}


def actnorm_apply(p, x, logdet=False, reverse=False):
    """x: (..., C); returns h (and per-sample logdet when requested,
    util.py:98-104)."""
    if reverse:
        return x / p["scale"] - p["loc"]
    h = p["scale"] * (x + p["loc"])
    if logdet:
        hw = math.prod(x.shape[1:-1]) if x.ndim > 2 else 1
        ld = hw * jnp.sum(jnp.log(jnp.abs(p["scale"])))
        return h, jnp.full((x.shape[0],), ld, x.dtype)
    return h


# ---------------------------------------------------------------------------
# NLayerDiscriminator (model/model.py:17-88)
# ---------------------------------------------------------------------------


def init_discriminator_params(key, input_nc=3, ndf=64, n_layers=3,
                              use_actnorm=False):
    """PatchGAN: 4x4 convs (stride 2 then 1), norm + LeakyReLU(0.2), 1-ch
    head; weights_init = N(0, 0.02) convs, N(1, 0.02) BN scales
    (model.py:8-14)."""
    use_bias = use_actnorm  # BatchNorm has affine -> no conv bias
    keys = iter(jax.random.split(key, 2 * n_layers + 4))

    def conv(cin, cout, bias):
        p = {"w": jax.random.normal(next(keys), (4, 4, cin, cout),
                                    jnp.float32) * 0.02}
        if bias:
            p["b"] = jnp.zeros((cout,), jnp.float32)
        return p

    def norm(c):
        if use_actnorm:
            return actnorm_init(c)
        return {"scale": jax.random.normal(next(keys), (c,), jnp.float32)
                * 0.02 + 1.0,
                "bias": jnp.zeros((c,), jnp.float32)}

    params = {"conv_in": conv(input_nc, ndf, True), "blocks": []}
    nf_mult_prev = 1
    for n in range(1, n_layers + 1):
        nf_mult = min(2**n, 8)
        params["blocks"].append({
            "conv": conv(ndf * nf_mult_prev, ndf * nf_mult, use_bias),
            "norm": norm(ndf * nf_mult),
        })
        nf_mult_prev = nf_mult
    params["conv_out"] = conv(ndf * nf_mult_prev, 1, True)
    return params


def _conv4(p, x, stride):
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(stride, stride),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _batch_norm(p, x, eps=1e-5):
    """Per-batch statistics over (N, H, W) — torch BatchNorm2d training
    behavior (the discriminator trains; there is no eval running-stats path
    in the reference's use)."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=(0, 1, 2))
    var = xf.var(axis=(0, 1, 2))
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _leaky_relu(x):
    return jnp.where(x >= 0, x, 0.2 * x)


def discriminator_apply(params, x, n_layers=3, use_actnorm=False):
    """x: (B, H, W, C) -> (B, H', W', 1) patch logits
    (model.py:85-88)."""
    h = _leaky_relu(_conv4(params["conv_in"], x, 2))
    for i, blk in enumerate(params["blocks"]):
        stride = 2 if i < n_layers - 1 else 1
        h = _conv4(blk["conv"], h, stride)
        h = (actnorm_apply(blk["norm"], h) if use_actnorm
             else _batch_norm(blk["norm"], h))
        h = _leaky_relu(h)
    y = _conv4(params["conv_out"], h, 1)
    if 0 in y.shape:
        # A 4x4/pad-1 conv on inputs below the receptive field silently
        # emits a zero-size map; a mean over it is NaN. Static check — free
        # under jit.
        raise ValueError(
            f"discriminator input {x.shape} too small for n_layers="
            f"{n_layers}: patch-logit map has shape {y.shape}"
        )
    return y


# ---------------------------------------------------------------------------
# GAN losses (lpips/vqperceptual.py)
# ---------------------------------------------------------------------------


def hinge_d_loss(logits_real, logits_fake):
    return 0.5 * (
        jnp.mean(jax.nn.relu(1.0 - logits_real))
        + jnp.mean(jax.nn.relu(1.0 + logits_fake))
    )


def vanilla_d_loss(logits_real, logits_fake):
    return 0.5 * (
        jnp.mean(jax.nn.softplus(-logits_real))
        + jnp.mean(jax.nn.softplus(logits_fake))
    )


def load_discriminator_torch(state_dict, n_layers=3, use_actnorm=False):
    """torch NLayerDiscriminator ``main.{i}`` Sequential state dict ->
    param pytree. Layer indices: conv_in at 0; block k's conv at
    2 + 3k (+1 its norm); head at 2 + 3*n_layers."""
    import numpy as np

    def arr(name):
        t = state_dict[name]
        return np.asarray(
            t.detach().cpu().numpy() if hasattr(t, "detach") else t,
            dtype=np.float32,
        )

    def conv(idx):
        p = {"w": jnp.asarray(arr(f"main.{idx}.weight").transpose(2, 3, 1, 0))}
        if f"main.{idx}.bias" in state_dict:
            p["b"] = jnp.asarray(arr(f"main.{idx}.bias"))
        return p

    def norm(idx):
        if use_actnorm:
            return {"loc": jnp.asarray(arr(f"main.{idx}.loc").reshape(-1)),
                    "scale": jnp.asarray(arr(f"main.{idx}.scale").reshape(-1))}
        return {"scale": jnp.asarray(arr(f"main.{idx}.weight")),
                "bias": jnp.asarray(arr(f"main.{idx}.bias"))}

    params = {"conv_in": conv(0), "blocks": []}
    for k in range(n_layers):
        params["blocks"].append(
            {"conv": conv(2 + 3 * k), "norm": norm(3 + 3 * k)}
        )
    params["conv_out"] = conv(2 + 3 * n_layers)
    return params
