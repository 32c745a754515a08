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

import functools
import os

import jax
import jax.numpy as jnp

# In-graph A/B knobs for the production einsum (see bilinear_sample_matmul):
#   CD360_ONEHOT_LAYOUT      "hp" (default, measured): build the one-hot
#                            transposed (m, h*w, p) and contract
#                            "mhp,mhc->mpc" — the emitter then produces
#                            c-minor output directly, killing the
#                            ~31 ms/render relayout copy the round-3 trace
#                            showed after the "ph" form (t_first 822 -> 791
#                            ms, same-session A/B). "ph" keeps the old form.
#   CD360_ONEHOT_ACC=bf16    accumulate in the feature dtype (only 4 nonzero
#                            terms per row, so bf16 accumulation is safe);
#                            measured noise-level (818 vs 822 ms — the output
#                            convert was already fused), kept for A/B only.
#   CD360_ONEHOT_OUT=f32     return the f32 accumulator uncast and let the
#                            CONSUMERS convert (the round-3 trace shows a
#                            ~38 ms/render copy at the astype return; if it
#                            is the standalone convert, deferring it fuses
#                            the cast into the consumer add/softmax fusions).
_ONEHOT_LAYOUT = os.environ.get("CD360_ONEHOT_LAYOUT", "hp")
_ONEHOT_ACC = os.environ.get("CD360_ONEHOT_ACC", "f32")
_ONEHOT_OUT = os.environ.get("CD360_ONEHOT_OUT", "in")


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
    hp = _ONEHOT_LAYOUT == "hp"
    if hp:
        iota = jax.lax.broadcasted_iota(jnp.int32, (m, h * w, p), 1)
        expand = lambda t: t[:, None, :]  # noqa: E731 — (m,p)->(m,1,p)
    else:
        iota = jax.lax.broadcasted_iota(jnp.int32, (m, p, h * w), 2)
        expand = lambda t: t[..., None]  # noqa: E731 — (m,p)->(m,p,1)

    def corner_onehot(xi, yi, wgt):
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        idx = (
            jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        ).astype(jnp.int32)
        wgt = jnp.where(valid, wgt, 0.0).astype(feats.dtype)
        return jnp.where(iota == expand(idx), expand(wgt), 0)

    onehot = (
        corner_onehot(x0, y0, (1 - tx) * (1 - ty))
        + corner_onehot(x0 + 1, y0, tx * (1 - ty))
        + corner_onehot(x0, y0 + 1, (1 - tx) * ty)
        + corner_onehot(x0 + 1, y0 + 1, tx * ty)
    )
    acc = feats.dtype if _ONEHOT_ACC == "bf16" else jnp.float32
    out = jnp.einsum(
        "mhp,mhc->mpc" if hp else "mph,mhc->mpc", onehot, fm,
        preferred_element_type=acc,
    )
    if _ONEHOT_OUT == "f32":
        return out  # consumers cast; A/B for the astype-return copy
    return out.astype(feats.dtype)


try:  # pallas is optional (CPU test environments)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_INTERPRET = False  # tests flip this to run the kernel on CPU


def _sample_kernel(ix_ref, iy_ref, fm_ref, o_ref, *, h, w, out_dtype):
    """One (map, point-block) program: build the bilinear one-hot tile in
    VMEM and contract it with the resident feature map on the MXU.

    The XLA formulation (bilinear_sample_matmul) materializes the (P, H*W)
    one-hot in HBM — profiled as the dominant FeatureNeRF render cost
    (~280 ms/render of elementwise build + ~100 ms of copies vs ~90 ms of
    matmul). Here the tile never leaves VMEM.
    """
    ix = ix_ref[0, 0, 0]  # (bp,) fractional x pixel coords
    iy = iy_ref[0, 0, 0]
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    tx = ix - x0
    ty = iy - y0

    bp = ix.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (bp, h * w), 1)

    def corner(xi, yi, wgt):
        # weights stay f32 until the final cast: mosaic can't minor-dim-
        # expand sub-32-bit vectors ("Insertion of minor dim ... only
        # supported for 32-bit types")
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        idx = (
            jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        ).astype(jnp.int32)
        wgt = jnp.where(valid, wgt, 0.0)
        return jnp.where(iota == idx[:, None], wgt[:, None], 0.0)

    onehot = (
        corner(x0, y0, (1 - tx) * (1 - ty))
        + corner(x0 + 1, y0, tx * (1 - ty))
        + corner(x0, y0 + 1, (1 - tx) * ty)
        + corner(x0 + 1, y0 + 1, tx * ty)
    ).astype(fm_ref.dtype)
    o_ref[0] = jax.lax.dot_general(
        onehot, fm_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def bilinear_sample_pallas(
    feats: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = True,
    block_p: int = 2048,
) -> jnp.ndarray:
    """Fused one-hot-build + matmul bilinear sampling (TPU Pallas).

    Same semantics as :func:`bilinear_sample_matmul`. feats: (M, H, W, C);
    grid: (M, P, 2) in [-1, 1]. P is padded to a multiple of ``block_p``.
    Differentiable w.r.t. ``feats`` only (custom VJP: W^T @ g as an XLA
    matmul); the FeatureNeRF caller stop-gradients the grid (reference
    detaches the NDC projections, nerfsd_pytorch3d.py:89).
    """
    return _pallas_fwd_impl(feats, grid, align_corners, block_p)


def _onehot_matrix(feats_dtype, h, w, grid, align_corners):
    """(M, P, H*W) bilinear weight matrix (shared by the XLA forward and the
    pallas backward)."""
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
    m, p = ix.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (m, p, h * w), 2)

    def corner_onehot(xi, yi, wgt):
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        idx = (
            jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        ).astype(jnp.int32)
        wgt = jnp.where(valid, wgt, 0.0).astype(feats_dtype)
        return jnp.where(iota == idx[..., None], wgt[..., None], 0)

    return (
        corner_onehot(x0, y0, (1 - tx) * (1 - ty))
        + corner_onehot(x0 + 1, y0, tx * (1 - ty))
        + corner_onehot(x0, y0 + 1, (1 - tx) * ty)
        + corner_onehot(x0 + 1, y0 + 1, tx * ty)
    )


def _pallas_vjp_fwd(feats, grid, align_corners, block_p):
    return _pallas_fwd_impl(feats, grid, align_corners, block_p), (feats, grid)


def _pallas_vjp_bwd(align_corners, block_p, res, g):
    feats, grid = res
    m, h, w, c = feats.shape
    onehot = _onehot_matrix(feats.dtype, h, w, grid, align_corners)
    d_fm = jnp.einsum(
        "mph,mpc->mhc", onehot, g, preferred_element_type=jnp.float32
    ).astype(feats.dtype)
    return d_fm.reshape(m, h, w, c), jnp.zeros_like(grid)


def _pallas_fwd_impl(feats, grid, align_corners, block_p):
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

    bp = min(block_p, max(128, p))
    pad = (-p) % bp
    if pad:
        # pad with -2 -> both corners out of range -> zeros
        ix = jnp.pad(ix, ((0, 0), (0, pad)), constant_values=-2.0)
        iy = jnp.pad(iy, ((0, 0), (0, pad)), constant_values=-2.0)
    pp = ix.shape[1]
    # (m, nblk, 1, bp): mosaic wants the last-two block dims tile-aligned;
    # the singleton sublane dim makes the (1, bp) coordinate block legal
    ix4 = ix.reshape(m, pp // bp, 1, bp)
    iy4 = iy.reshape(m, pp // bp, 1, bp)

    compiler_params = None
    if not _INTERPRET:
        compiler_params = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)
    out = pl.pallas_call(
        functools.partial(_sample_kernel, h=h, w=w, out_dtype=feats.dtype),
        grid=(m, pp // bp),
        in_specs=[
            pl.BlockSpec((1, 1, 1, bp), lambda i, t: (i, t, 0, 0)),
            pl.BlockSpec((1, 1, 1, bp), lambda i, t: (i, t, 0, 0)),
            pl.BlockSpec((1, h * w, c), lambda i, t: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bp, c), lambda i, t: (i, t, 0)),
        out_shape=jax.ShapeDtypeStruct((m, pp, c), feats.dtype),
        compiler_params=compiler_params,
        interpret=_INTERPRET,
    )(ix4, iy4, fm)
    return out[:, :p]


bilinear_sample_pallas.defvjp(_pallas_vjp_fwd, _pallas_vjp_bwd)


def bilinear_sample(
    feats: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = True,
    impl: str = "auto",
) -> jnp.ndarray:
    """Dispatching wrapper: one-hot matmul on TPU, gather-based elsewhere.

    Same signature/semantics as :func:`bilinear_sample_matmul`; the gather
    path (ops.grid_sample.grid_sample_2d) is exact and fast on CPU, the
    XLA one-hot matmul is the TPU production route.

    NOTE (negative result, measured on v5e): the fused Pallas kernel
    (bilinear_sample_pallas — one-hot tile built in VMEM, never touching
    HBM) runs 11.6 ms vs 9.8 ms for the XLA form on the ds2 production
    chunk and takes ~8 min to Mosaic-compile. The VPU one-hot build inside
    the kernel serializes against its own MXU dot, while XLA overlaps the
    build fusion with the previous chunk's matmul. Kept for reference and
    CI-covered (interpret mode), not dispatched.
    """
    if impl == "auto":
        impl = "matmul" if jax.devices()[0].platform == "tpu" else "gather"
    if impl == "pallas":
        return bilinear_sample_pallas(feats, grid, align_corners)
    if impl == "matmul":
        return bilinear_sample_matmul(feats, grid, align_corners)
    from .grid_sample import grid_sample_2d

    return grid_sample_2d(feats, grid, align_corners)
