"""LPIPS perceptual loss (VGG16 backbone) — functional JAX.

Reference: sgm/modules/autoencoding/lpips/loss/lpips.py (the taming
"vgg_lpips" checkpoint: torchvision VGG16 features + learned per-layer 1x1
linear heads). Used by StandardDiffusionLossImgRef when loss_type="lpips"
(sgm/modules/diffusionmodules/loss.py:31-32,101).

Structure: five VGG16 feature slices ending at relu1_2 / relu2_2 / relu3_3 /
relu4_3 / relu5_3; per-slice unit-normalize along channels, squared diff,
1x1 linear head, spatial mean, sum over slices.

Weights: ``load_lpips_torch`` imports torchvision's vgg16 features state
dict plus the LPIPS head checkpoint (both torch .pth files); no torch at
runtime — import converts to a plain pytree.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# torchvision vgg16 .features conv indices per slice (lpips.py:103-113)
VGG_SLICES = [(0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28)]
CHNS = [64, 128, 256, 512, 512]

# ScalingLayer buffers (lpips.py:69-76)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def init_lpips_params(key):
    """Random-init pytree with the exact import structure (for tests)."""
    params = {"vgg": {}, "lins": []}
    in_ch = 3
    for si, slice_ids in enumerate(VGG_SLICES):
        out_ch = CHNS[si]
        for idx in slice_ids:
            key, k1 = jax.random.split(key)
            params["vgg"][str(idx)] = {
                "w": jax.random.normal(k1, (3, 3, in_ch, out_ch)) * 0.05,
                "b": jnp.zeros((out_ch,)),
            }
            in_ch = out_ch
        key, k2 = jax.random.split(key)
        params["lins"].append(
            jnp.abs(jax.random.normal(k2, (out_ch,))) * 0.01
        )
    return params


def _conv_relu(p, x):
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["b"].astype(x.dtype)
    return jax.nn.relu(y)


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def vgg_features(params, x):
    """x: (B, H, W, 3) — returns the 5 relu feature maps (NHWC)."""
    feats = []
    for si, slice_ids in enumerate(VGG_SLICES):
        if si > 0:
            x = _maxpool2(x)
        for idx in slice_ids:
            x = _conv_relu(params["vgg"][str(idx)], x)
        feats.append(x)
    return feats


def lpips_apply(params, x, y):
    """Learned perceptual distance. x, y: (B, H, W, 3) in [-1, 1] -> (B,).

    Matches LPIPS.forward (lpips.py:46-65): scaling layer, VGG features,
    channel-unit-normalize, squared diff, 1x1 head, spatial mean, sum.
    """
    shift = jnp.asarray(_SHIFT, x.dtype)
    scale = jnp.asarray(_SCALE, x.dtype)
    fx = vgg_features(params, (x - shift) / scale)
    fy = vgg_features(params, (y - shift) / scale)

    def unit_norm(t, eps=1e-10):
        n = jnp.sqrt(jnp.sum(t.astype(jnp.float32) ** 2, -1, keepdims=True))
        return t / (n + eps).astype(t.dtype)

    val = 0.0
    for si in range(len(CHNS)):
        d = (unit_norm(fx[si]) - unit_norm(fy[si])) ** 2
        head = params["lins"][si].astype(d.dtype)  # (C,) 1x1 conv, no bias
        val = val + jnp.mean(d @ head, axis=(1, 2))
    return val


def load_lpips_torch(lpips_ckpt: str, vgg_ckpt: str):
    """Import the torch weights: ``vgg_ckpt`` = torchvision vgg16 state dict
    (features.N.weight OIHW), ``lpips_ckpt`` = taming "vgg.pth" heads
    (lin{k}.model.1.weight, shape (1, C, 1, 1))."""
    import torch

    vgg_sd = torch.load(vgg_ckpt, map_location="cpu", weights_only=True)
    lp_sd = torch.load(lpips_ckpt, map_location="cpu", weights_only=True)
    params = {"vgg": {}, "lins": []}
    for slice_ids in VGG_SLICES:
        for idx in slice_ids:
            w = vgg_sd[f"features.{idx}.weight"].numpy()  # OIHW
            b = vgg_sd[f"features.{idx}.bias"].numpy()
            params["vgg"][str(idx)] = {
                "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),  # -> HWIO
                "b": jnp.asarray(b),
            }
    for k in range(5):
        w = lp_sd[f"lin{k}.model.1.weight"].numpy()  # (1, C, 1, 1)
        params["lins"].append(jnp.asarray(w[0, :, 0, 0]))
    return params
