"""Fused normalization kernels for TPU — a measured NEGATIVE result.

Motivation: the XLA lowering of LayerNorm/GroupNorm on bf16 activations
shows up as ~24 ms of `convert_reduce_fusion` in a 137 ms 1024^2 sampling
step. These kernels compute the f32 statistics in VMEM with one HBM read +
one write per tensor.

Measured on v5e (1024^2 cached sampling step, jax.profiler): dispatching
models/nn.layer_norm to `layer_norm_fused` made the step ~20 ms SLOWER
(137 -> 160 ms); dispatching group_norm to `group_norm_fused` grew the
XLA `fusion` bucket by ~20 ms. XLA overlaps its reduce/normalize fusions
with the MXU pipeline, while a custom call is a synchronization point —
per-op time moved into the kernels and the schedule lost more than the
fusion saved. The model code therefore keeps the XLA lowering
(models/nn.py); these kernels stay for shapes where a single fused pass
does win (very large rows per call, standalone use) and as the measured
record of why the default is XLA.

Semantics match models/nn.layer_norm / group_norm (torch semantics, f32
statistics — reference: GroupNorm32, diffusionmodules/util.py:309-311).
Backward recomputes in plain XLA f32.
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


def _ln_kernel(x_ref, g_ref, b_ref, o_ref, *, eps):
    x = x_ref[0].astype(jnp.float32)  # (br, C)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    o_ref[0] = (y * g_ref[0] + b_ref[0]).astype(o_ref.dtype)


def _ln_forward(x, scale, bias, eps, block_rows):
    orig_shape = x.shape
    c = x.shape[-1]
    x2 = x.reshape(-1, c)
    r = x2.shape[0]
    pad = (-r) % block_rows
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    rp = x2.shape[0]
    # leading singleton grid axis keeps scale/bias resident across blocks
    x3 = x2.reshape(1, rp, c)
    compiler_params = None
    if not _INTERPRET:
        compiler_params = pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20)
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(rp // block_rows,),
        in_specs=[
            pl.BlockSpec((1, block_rows, c), lambda t: (0, t, 0)),
            pl.BlockSpec((1, c), lambda t: (0, 0)),
            pl.BlockSpec((1, c), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_rows, c), lambda t: (0, t, 0)),
        out_shape=jax.ShapeDtypeStruct((1, rp, c), x.dtype),
        compiler_params=compiler_params,
        interpret=_INTERPRET,
    )(x3, scale.astype(jnp.float32)[None], bias.astype(jnp.float32)[None])
    out = out[0]
    if pad:
        out = out[:r]
    return out.reshape(orig_shape)


def _ln_xla(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def layer_norm_fused(x, scale, bias, eps=1e-5):
    """LayerNorm over the trailing axis, f32 statistics, fused on TPU.

    x: (..., C) with C a multiple of 128; scale/bias: (C,).
    """
    c = x.shape[-1]
    usable = (
        _HAS_PALLAS
        and c % 128 == 0
        and (jax.devices()[0].platform == "tpu" or _INTERPRET)
    )
    if not usable:
        return _ln_xla(x, scale, bias, eps)
    rows = 1
    for s in x.shape[:-1]:
        rows *= s
    block_rows = 512 if rows >= 512 else max(8, 1 << (rows - 1).bit_length())
    return _ln_forward(x, scale, bias, eps, block_rows)


def _ln_fwd(x, scale, bias, eps):
    return layer_norm_fused(x, scale, bias, eps), (x, scale)


def _ln_bwd(eps, res, g):
    x, scale = res
    xf = x.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * inv
    dy = gf * scale.astype(jnp.float32)
    dscale = jnp.sum(gf * xhat, axis=tuple(range(x.ndim - 1)))
    dbias = jnp.sum(gf, axis=tuple(range(x.ndim - 1)))
    dx = inv * (
        dy
        - dy.mean(-1, keepdims=True)
        - xhat * (dy * xhat).mean(-1, keepdims=True)
    )
    return dx.astype(x.dtype), dscale, dbias


layer_norm_fused.defvjp(_ln_fwd, _ln_bwd)


# ---------------------------------------------------------------------------
# GroupNorm (+ optional SiLU) — same motivation as layer_norm_fused: the XLA
# lowering converts the whole activation to f32 through HBM for the group
# statistics. Stats here stay in VMEM: sum/sumsq reduce over rows (sublanes),
# then a tiny (G, C/G) fold collapses the channel groups.
# ---------------------------------------------------------------------------


def _gn_kernel(x_ref, g_ref, b_ref, o_ref, *, eps, num_groups, rows, act):
    x = x_ref[0].astype(jnp.float32)  # (HW, C)
    c = x.shape[-1]
    cg = c // num_groups
    s1 = jnp.sum(x, axis=0, keepdims=True)  # (1, C)
    s2 = jnp.sum(x * x, axis=0, keepdims=True)
    # fold channel groups with a (C, G) one-hot matmul — Mosaic has no
    # (C,) -> (G, C/G) shape cast for unaligned C/G
    cid = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0) // cg
    gid = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    fold = (cid == gid).astype(jnp.float32)  # (C, G)
    n = rows * cg
    mean = jnp.dot(s1, fold, preferred_element_type=jnp.float32) / n  # (1, G)
    ex2 = jnp.dot(s2, fold, preferred_element_type=jnp.float32) / n
    inv = jax.lax.rsqrt(ex2 - mean * mean + eps)
    # broadcast the per-group stats back to channels via the transpose
    mean_c = jnp.dot(mean, fold.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv, fold.T, preferred_element_type=jnp.float32)
    y = (x - mean_c) * inv_c * g_ref[0] + b_ref[0]
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _gn_xla(x, scale, bias, num_groups, eps, act):
    c = x.shape[-1]
    n = x.shape[0]
    xf = x.astype(jnp.float32).reshape(n, -1, num_groups, c // num_groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = xf.reshape(x.shape) * scale + bias
    if act == "silu":
        y = y * jax.nn.sigmoid(y.astype(jnp.float32)).astype(y.dtype)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def group_norm_fused(x, scale, bias, num_groups=32, eps=1e-6, act=None):
    """GroupNorm over (spatial, group channels) with f32 statistics, fused
    with an optional trailing SiLU on TPU.

    x: (N, ..., C) channels-last; per-sample stats need the full (HW, C)
    slice in VMEM, so large spatial extents (VAE at image resolution) fall
    back to the XLA path.
    """
    c = x.shape[-1]
    n = x.shape[0]
    rows = x.size // (n * c)
    usable = (
        _HAS_PALLAS
        and c % 128 == 0
        and (c // num_groups) * num_groups == c
        and rows % 8 == 0
        and rows * c * 4 <= 24 * 2**20
        and (jax.devices()[0].platform == "tpu" or _INTERPRET)
    )
    x2 = x.reshape(n, rows, c)
    if not usable:
        return _gn_xla(x2, scale, bias, num_groups, eps, act).reshape(x.shape)
    compiler_params = None
    if not _INTERPRET:
        compiler_params = pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20)
    out = pl.pallas_call(
        functools.partial(
            _gn_kernel, eps=eps, num_groups=num_groups, rows=rows, act=act
        ),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, rows, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, rows, c), x.dtype),
        compiler_params=compiler_params,
        interpret=_INTERPRET,
    )(x2, scale.astype(jnp.float32)[None], bias.astype(jnp.float32)[None])
    return out.reshape(x.shape)


def _gn_fwd(x, scale, bias, num_groups, eps, act):
    return group_norm_fused(x, scale, bias, num_groups, eps, act), (x, scale, bias)


def _gn_bwd(num_groups, eps, act, res, g):
    x, scale, bias = res

    def f(x, scale, bias):
        c = x.shape[-1]
        n = x.shape[0]
        return _gn_xla(
            x.reshape(n, -1, c), scale, bias, num_groups, eps, act
        ).reshape(x.shape)

    _, vjp = jax.vjp(f, x, scale, bias)
    return vjp(g)


group_norm_fused.defvjp(_gn_fwd, _gn_bwd)
