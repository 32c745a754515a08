"""Bilinear grid sampling as a one-hot matmul — the MXU formulation.

The FeatureNeRF inner loop samples reference feature maps at projected ray
points (reference: sgm/modules/nerfsd_pytorch3d.py:79-98, F.grid_sample).
XLA lowers gather-based sampling to dynamic-gathers that run far below
HBM bandwidth on TPU (measured ~21-34 ms per production chunk). Writing the
same bilinear interpolation as

    out = W_sparse @ feature_map          # W_sparse: (P, H*W), 4 nnz per row

and materializing ``W_sparse`` on the fly from iota/index comparisons turns
the op into an MXU matmul that XLA fuses end-to-end (measured 2-4.5x faster,
and the backward pass w.r.t. the feature map is ``W_sparse^T @ g`` — another
matmul instead of a scatter-add).

Semantics match ``ops.grid_sample.grid_sample_2d`` (torch ``grid_sample``
with align_corners=True, padding_mode="zeros").
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample_matmul(
    feats: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = True,
) -> jnp.ndarray:
    """One-hot-matmul bilinear sampling with zero padding.

    feats: (M, H, W, C) channels-last feature maps.
    grid:  (M, P, 2) positions in [-1, 1] (x indexes W, y indexes H, torch
           convention); values outside [-1, 1] read zeros.
    Returns (M, P, C) in feats.dtype (f32 accumulation on the MXU).
    """
    m, h, w, c = feats.shape
    p = grid.shape[1]
    fm = feats.reshape(m, h * w, c)

    x = grid[..., 0].astype(jnp.float32)
    y = grid[..., 1].astype(jnp.float32)
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

    # NOTE (negative result, measured): a "factored" construction — outer
    # product of per-axis 2-tap one-hots — benched SLOWER (ds2 block 97 ->
    # 113 ms). XLA fuses this whole 4-corner chain into a single full-size
    # loop already; the factored form's broadcast reads beat it on paper but
    # not on the VPU. Keep the direct form.
    iota = jax.lax.broadcasted_iota(jnp.int32, (m, p, h * w), 2)

    def corner_onehot(xi, yi, wgt):
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        idx = (
            jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        ).astype(jnp.int32)
        wgt = jnp.where(valid, wgt, 0.0).astype(feats.dtype)
        return jnp.where(iota == idx[..., None], wgt[..., None], 0)

    onehot = (
        corner_onehot(x0, y0, (1 - tx) * (1 - ty))
        + corner_onehot(x0 + 1, y0, tx * (1 - ty))
        + corner_onehot(x0, y0 + 1, (1 - tx) * ty)
        + corner_onehot(x0 + 1, y0 + 1, tx * ty)
    )
    out = jnp.einsum(
        "mph,mhc->mpc", onehot, fm, preferred_element_type=jnp.float32
    )
    return out.astype(feats.dtype)


def bilinear_sample(
    feats: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = True,
    impl: str = "auto",
) -> jnp.ndarray:
    """Dispatching wrapper: one-hot matmul on TPU, gather-based elsewhere.

    Same signature/semantics as :func:`bilinear_sample_matmul`; the gather
    path (ops.grid_sample.grid_sample_2d) is exact and fast on CPU, the
    matmul path is the TPU production route.
    """
    if impl == "auto":
        impl = (
            "matmul" if jax.devices()[0].platform == "tpu" else "gather"
        )
    if impl == "matmul":
        return bilinear_sample_matmul(feats, grid, align_corners)
    from .grid_sample import grid_sample_2d

    return grid_sample_2d(feats, grid, align_corners)
