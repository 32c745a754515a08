"""Bilinear grid sampling on TPU.

Replaces cuDNN ``F.grid_sample(..., align_corners=True, padding_mode="zeros")``
used as the FeatureNeRF hot inner loop (reference: sgm/modules/
nerfsd_pytorch3d.py:79-98). Implemented as a gather-based bilinear
interpolation that XLA lowers to fused dynamic-gathers; channels-last layout so
the channel axis (the large, MXU-friendly one) is the minor dimension.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_2d(
    feats: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = True,
) -> jnp.ndarray:
    """Bilinear sampling with zero padding, torch ``grid_sample`` semantics.

    feats: (..., H, W, C)   channels-last feature maps
    grid:  (..., P, 2)      sample positions in [-1, 1]; grid[..., 0] = x
                            indexes W, grid[..., 1] = y indexes H; matching
                            torch convention. Values outside [-1, 1] read zeros.
    Returns (..., P, C).

    align_corners=True: -1 maps to pixel 0 and +1 to pixel (W-1 | H-1), as in
    the reference call site (nerfsd_pytorch3d.py:96).
    """
    h, w, c = feats.shape[-3:]
    batch = feats.shape[:-3]
    feats2 = feats.reshape((-1, h * w, c))
    grid2 = grid.reshape((feats2.shape[0], -1, 2))

    x, y = grid2[..., 0], grid2[..., 1]
    if align_corners:
        ix = (x + 1.0) * 0.5 * (w - 1)
        iy = (y + 1.0) * 0.5 * (h - 1)
    else:
        ix = ((x + 1.0) * w - 1.0) * 0.5
        iy = ((y + 1.0) * h - 1.0) * 0.5

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    tx = ix - x0
    ty = iy - y0

    def corner(xi, yi):
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        idx = yc * w + xc  # (B, P)
        vals = jnp.take_along_axis(feats2, idx[..., None], axis=1)  # (B, P, C)
        return vals * valid[..., None].astype(feats2.dtype)

    w00 = ((1 - tx) * (1 - ty))[..., None].astype(feats2.dtype)
    w01 = (tx * (1 - ty))[..., None].astype(feats2.dtype)
    w10 = ((1 - tx) * ty)[..., None].astype(feats2.dtype)
    w11 = (tx * ty)[..., None].astype(feats2.dtype)

    out = (
        corner(x0, y0) * w00
        + corner(x0 + 1, y0) * w01
        + corner(x0, y0 + 1) * w10
        + corner(x0 + 1, y0 + 1) * w11
    )
    return out.reshape(batch + grid.shape[len(batch):-1] + (c,))
