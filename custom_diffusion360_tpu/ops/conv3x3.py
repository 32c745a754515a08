"""Implicit-GEMM Pallas kernel for the VAE decoder's 3x3 convs.

XLA's conv emitters run the decoder's large-spatial / small-channel shapes
(512ch at 256^2 ... 128ch at 1024^2) at ~31 TFLOPS — far off the ~141
sustained matmul peak — and every tiling/dtype variation tried at the XLA
level measured neutral-or-worse (space-to-batch, subpixel-fold, NOTES.md).
This kernel reformulates the conv as 9 accumulated matmuls over shifted
input windows, tiled (TH, TW) per grid step with the full input channel
depth as the contraction axis:

    acc[TH*TW, N] (f32)  +=  x[i*TH+ky : .. , j*TW+kx : .., :C] @ w[ky,kx]

Each grid block DMAs ONE (TH+2, TW+8, C) halo window from the padded input
in HBM (Mosaic constraint, triaged on the real chip: the DMA's sublane
extent must be a multiple of 8 and its sublane offset aligned — the naive
9 shifted-window DMAs crash the compiler on the +-1 column offsets), then
realizes the three kx shifts as in-kernel sublane slices (one relayout per
kx; ky slices ride the untiled leading axis for free) and accumulates the
9 MXU dots: M = TH*TW = 1024, K = C >= 128, N >= 128. Per block at
C = N = 512 that is 4.8 GFLOP against ~1.4 MB of DMA — compute-bound by
~20x, so no double buffering is needed.

Gradients: jax.custom_vjp whose backward evaluates the VJP of the
equivalent ``lax.conv_general_dilated`` (exact same math), so training
paths (ae_engine) stay correct if they ever route through here.

Reference conv sites this accelerates: sgm/modules/diffusionmodules/
model.py:487-748 (Decoder res blocks / upsamples).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_INTERPRET = False  # tests flip this to run the kernel on CPU

TH = 32
TW = 32


def _kernel(xp_ref, w_ref, o_ref, x_buf, sem, *, C, N, out_dtype):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    cp = pltpu.make_async_copy(
        xp_ref.at[b, pl.ds(i * TH, TH + 2), pl.ds(j * TW, TW + 8), :],
        x_buf,
        sem,
    )
    cp.start()
    cp.wait()

    acc = jnp.zeros((TH * TW, N), jnp.float32)
    for kx in range(3):
        xk = x_buf[:, kx:kx + TW, :]  # one sublane relayout per kx
        for ky in range(3):
            xs = xk[ky:ky + TH].reshape(TH * TW, C)
            acc = acc + jax.lax.dot_general(
                xs, w_ref[ky * 3 + kx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    o_ref[0] = acc.reshape(TH, TW, N).astype(out_dtype)


def conv3x3_supported(x, w) -> bool:
    """Shapes/dtypes this kernel handles (and is worth dispatching for)."""
    if not _HAS_PALLAS:
        return False
    if x.ndim != 4 or w.shape[:2] != (3, 3):
        return False
    _, h, wd, c = x.shape
    n = w.shape[3]
    return (
        h % TH == 0
        and wd % TW == 0
        and c % 128 == 0
        and n % 128 == 0
        and x.dtype in (jnp.bfloat16, jnp.float32)
    )


def _conv3x3_ref(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def conv3x3_gemm(x, w):
    """SAME-padded stride-1 3x3 conv, NHWC x HWIO -> NHWC.

    Use :func:`conv3x3_supported` before dispatching; unsupported shapes
    should stay on ``lax.conv_general_dilated``.
    """
    return _conv3x3_fwd_impl(x, w)


def _conv3x3_fwd_impl(x, w):
    b, h, wd, c = x.shape
    n = w.shape[3]
    w9 = w.reshape(9, c, n).astype(x.dtype)
    # left/top halo 1; right pad 7 so every (TW + 8)-wide DMA window is
    # sublane-aligned (the Mosaic DMA constraint above)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 7), (0, 0)))
    grid = (b, h // TH, wd // TW)
    kernel = functools.partial(_kernel, C=c, N=n, out_dtype=x.dtype)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, wd, n), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # padded input, HBM
            pl.BlockSpec((9, c, n), lambda b, i, j: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TH, TW, n), lambda b, i, j: (b, i, j, 0)),
        scratch_shapes=[
            pltpu.VMEM((TH + 2, TW + 8, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=_INTERPRET,
    )(xp, w9)


def _fwd(x, w):
    return _conv3x3_fwd_impl(x, w), (x, w)


def _bwd(res, g):
    x, w = res
    _, vjp = jax.vjp(_conv3x3_ref, x, w)
    dx, dw = vjp(g.astype(x.dtype))
    return dx, dw.astype(w.dtype)


conv3x3_gemm.defvjp(_fwd, _bwd)
