"""Single-pass Pallas attention for short-KV shapes.

The flash kernel's streaming machinery is overhead-bound on the UNet's many
short sequences (60 transformer blocks at n=1024 dominate the sampling step;
measured 1.25 ms each vs ~0.06 ms of MXU math). When the whole KV fits in
VMEM there is nothing to stream: this kernel computes softmax(QK^T)V for one
(batch, head, q-block) per grid step entirely on-chip.

Also serves text cross-attention (m = 77 padded to 128 with a baked mask) —
the XLA fallback had to run in f32 because bf16 batched attention matmuls
crash this libtpu compiler.

Backward recomputes with plain XLA f32 ops (attention here is cheap relative
to the UNet conv/FF backward; fp32 softmax matches the reference's autocast
islands).
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _attend(q, k, v128, scale, kv_len, m_padded, out_dtype):
    """v128 is V padded to 128 lanes with a ones column at index d: the
    softmax denominator rides the same MXU pass as e@V (with d=64 the N=64
    matmul wastes half the lanes anyway, so the widening is free) and the
    (bq, m)-sized divide pass collapses to (bq, d). The softmax scale folds
    into the (bq, d) q block here — scaling q in XLA outside the kernel
    profiled as ~4 ms/step of pure copy traffic."""
    d = q.shape[-1]
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if kv_len < m_padded:
        mask = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) < kv_len
        s = jnp.where(mask, s, -1e30)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s).astype(v128.dtype)
    o = jax.lax.dot_general(
        e, v128, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, 128): [:, :d] = e @ V, [:, d] = sum(e)
    return (o[:, :d] / o[:, d:d + 1]).astype(out_dtype)


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale, kv_len, m_padded):
    o_ref[0, 0] = _attend(
        q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], scale, kv_len, m_padded,
        o_ref.dtype,
    )


def _kernel_allheads(q_ref, k_ref, v_ref, o_ref, *, scale, kv_len, m_padded,
                     heads):
    """One program per (batch, q-block); python-unrolled loop over heads
    amortizes per-program overhead (the chip has a single TensorCore, so
    fewer/bigger programs win)."""
    for i in range(heads):
        o_ref[0, i] = _attend(
            q_ref[0, i], k_ref[0, i], v_ref[0, i], scale, kv_len, m_padded,
            o_ref.dtype,
        )


def _pad_axis(x, axis, to):
    pad = (-x.shape[axis]) % to
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


_INTERPRET = False  # tests flip this to run the kernel on CPU


def _forward(q, k, v, scale, kv_len, block_q):
    """q: (b, h, n, d); k/v: (b, h, m, d) -> (b, h, n, d)."""
    b, h, n, d = q.shape
    m = k.shape[2]
    kv_len = m if kv_len is None else kv_len

    qp = _pad_axis(q, 2, block_q)
    kp = _pad_axis(k, 2, 128)
    vp = _pad_axis(v, 2, 128)
    np_, mp = qp.shape[2], kp.shape[2]
    # V' = [V | 1 | 0...] padded to a lane multiple (see _attend)
    ncols = -(-(d + 1) // 128) * 128
    ones = jnp.ones((b, h, mp, 1), vp.dtype)
    zeros = jnp.zeros((b, h, mp, ncols - d - 1), vp.dtype)
    v128 = jnp.concatenate([vp, ones, zeros], axis=-1)

    # all heads in one program when VMEM allows (measured on v5e: fewer,
    # bigger programs win at every UNet shape; VMEM is 128 MB): double-
    # buffered q/o and k/v' blocks plus the transient f32 scores tile
    esize = jnp.dtype(q.dtype).itemsize
    vmem_bytes = (
        2 * esize * (2 * h * block_q * d + h * mp * (d + ncols))
        + 4 * block_q * mp
    )
    compiler_params = None
    if not _INTERPRET:
        # the scoped-vmem default is 16 MB; the chip has 128 MB. The limit
        # must also cover operand/result buffers XLA chooses to place in
        # VMEM around the call, so a flat generous value beats a tight
        # per-shape estimate.
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=96 * 2**20
        )
    if vmem_bytes < 64 * 2**20:
        out = pl.pallas_call(
            functools.partial(
                _kernel_allheads, scale=scale, kv_len=kv_len, m_padded=mp,
                heads=h,
            ),
            grid=(b, np_ // block_q),
            in_specs=[
                pl.BlockSpec((1, h, block_q, d), lambda i, t: (i, 0, t, 0)),
                pl.BlockSpec((1, h, mp, d), lambda i, t: (i, 0, 0, 0)),
                pl.BlockSpec((1, h, mp, ncols), lambda i, t: (i, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, h, block_q, d), lambda i, t: (i, 0, t, 0)
            ),
            out_shape=jax.ShapeDtypeStruct((b, h, np_, d), q.dtype),
            compiler_params=compiler_params,
            interpret=_INTERPRET,
        )(qp, kp, v128)
        return out[:, :, :n]

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, kv_len=kv_len, m_padded=mp),
        grid=(b, h, np_ // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda i, j, t: (i, j, t, 0)),
            pl.BlockSpec((1, 1, mp, d), lambda i, j, t: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, mp, ncols), lambda i, j, t: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda i, j, t: (i, j, t, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, np_, d), q.dtype),
        compiler_params=compiler_params,
        interpret=_INTERPRET,
    )(qp, kp, v128)
    return out[:, :, :n]


def _xla_f32(q, k, v, scale, kv_len):
    qf, kf, vf = (t.astype(jnp.float32) for t in (q, k, v))
    s = jnp.einsum("bhnd,bhmd->bhnm", qf, kf) * scale
    if kv_len is not None and kv_len < k.shape[2]:
        mask = jnp.arange(k.shape[2]) < kv_len
        s = jnp.where(mask[None, None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p, vf).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def block_attention(q, k, v, scale, kv_len=None, block_q=512):
    """softmax(q k^T * scale) v with the whole KV resident in VMEM.

    q: (b, h, n, d); k, v: (b, h, m, d). m is padded to a multiple of 128;
    kv_len (static) masks padded keys. Requires block_q * m_padded * 4B to
    fit VMEM (use for m <= ~4096).
    """
    if not _HAS_PALLAS or (
        jax.devices()[0].platform != "tpu" and not _INTERPRET
    ):
        return _xla_f32(q, k, v, scale, kv_len)
    return _forward(q, k, v, scale, kv_len, block_q)


def _forward_bnhd(q, k, v, scale, kv_len, block_q):
    """Transpose-free variant: consumes the models' native (b, n, h, d)
    layout directly — the (b, h, n, d) relayout that block_attention's
    callers pay in XLA (swapaxes copies before AND after the kernel) moves
    into the kernel's block index maps, where the strided reads ride the
    double-buffered DMA pipeline instead of serializing as copy fusions.

    MEASURE BEFORE DISPATCHING (ops/attention keeps the swapaxes path until
    a trace shows this wins): per-head slicing of the (block_q, h, d) VMEM
    block is a sublane-axis access Mosaic must relayout per head.
    """
    b, n, h, d = q.shape
    m = k.shape[1]
    kv_len = m if kv_len is None else kv_len

    qp = _pad_axis(q, 1, block_q)
    kp = _pad_axis(k, 1, 128)
    vp = _pad_axis(v, 1, 128)
    np_, mp = qp.shape[1], kp.shape[1]
    ncols = -(-(d + 1) // 128) * 128
    ones = jnp.ones((b, mp, h, 1), vp.dtype)
    zeros = jnp.zeros((b, mp, h, ncols - d - 1), vp.dtype)
    v128 = jnp.concatenate([vp, ones, zeros], axis=-1)

    def kernel(q_ref, k_ref, v_ref, o_ref):
        for i in range(h):
            o_ref[0, :, i] = _attend(
                q_ref[0, :, i], k_ref[0, :, i], v_ref[0, :, i], scale,
                kv_len, mp, o_ref.dtype,
            )

    compiler_params = None
    if not _INTERPRET:
        compiler_params = pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20)
    out = pl.pallas_call(
        kernel,
        grid=(b, np_ // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, h, d), lambda i, t: (i, t, 0, 0)),
            pl.BlockSpec((1, mp, h, d), lambda i, t: (i, 0, 0, 0)),
            pl.BlockSpec((1, mp, h, ncols), lambda i, t: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, h, d), lambda i, t: (i, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, np_, h, d), q.dtype),
        compiler_params=compiler_params,
        interpret=_INTERPRET,
    )(qp, kp, v128)
    return out[:, :n]


def _forward_qkv_fused(qkv, scale, block_q):
    """Self-attention from ONE fused (b, 3, h, n, d) operand.

    Motivation (round-4 step-copy ledger, HLO dump of the 1024^2 cached
    step): the to_qkv path paid SIX per-layer copy fusions — 3 split
    materializations (transformer.py:136, {1,2,0} layouts) + 3 head
    transposes (:151-153, {3,1,2,0}) ≈ 5.4 ms/step. Feeding the kernel the
    fused projection output via ONE (0,2,3,1,4) transpose and three
    BlockSpecs that index the same buffer (q at [i,0,h], k at [i,1,h],
    v at [i,2,h]) replaces all six with a single 3x-sized copy — halving
    the qkv-side HBM traffic and removing four fusion roots per layer.

    V lives at d lanes inside the operand, so the softmax denominator
    can't ride the MXU as a ones-column of V' (see _attend); it falls back
    to a VPU reduce over the scores tile — one extra pass over a tile the
    exp already touched.
    """
    b, three, h, n, d = qkv.shape
    assert three == 3 and n % block_q == 0 and n % 128 == 0

    def kernel(q_ref, k_ref, v_ref, o_ref):
        for i in range(h):
            q = q_ref[0, 0, i]
            q = (q.astype(jnp.float32) * scale).astype(q.dtype)
            s = jax.lax.dot_general(
                q, k_ref[0, 0, i], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            denom = jnp.sum(e, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                e.astype(v_ref.dtype), v_ref[0, 0, i],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0, i] = (o / denom).astype(o_ref.dtype)

    compiler_params = None
    if not _INTERPRET:
        compiler_params = pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20)
    return pl.pallas_call(
        kernel,
        grid=(b, n // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, h, block_q, d), lambda i, t: (i, 0, 0, t, 0)),
            pl.BlockSpec((1, 1, h, n, d), lambda i, t: (i, 1, 0, 0, 0)),
            pl.BlockSpec((1, 1, h, n, d), lambda i, t: (i, 2, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, block_q, d), lambda i, t: (i, 0, t, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, n, d), qkv.dtype),
        compiler_params=compiler_params,
        interpret=_INTERPRET,
    )(qkv, qkv, qkv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def block_attention_qkv_fused(qkv, scale, block_q=512):
    """softmax(q k^T * scale) v for SELF-attention, q/k/v packed in one
    (b, 3, h, n, d) tensor (the reshaped+transposed to_qkv projection).
    Returns (b, h, n, d). Requires n % block_q == 0 (no padding path —
    callers dispatch here only for the UNet's 1024/4096 sequences).
    """
    if not _HAS_PALLAS or (
        jax.devices()[0].platform != "tpu" and not _INTERPRET
    ):
        return _xla_f32(qkv[:, 0], qkv[:, 1], qkv[:, 2], scale, None)
    return _forward_qkv_fused(qkv, scale, block_q)


def _fwd_qkv_fused(qkv, scale, block_q):
    return block_attention_qkv_fused(qkv, scale, block_q), (qkv,)


def _bwd_qkv_fused(scale, block_q, res, g):
    (qkv,) = res
    dq, dk, dv = _bwd(scale, None, block_q,
                      (qkv[:, 0], qkv[:, 1], qkv[:, 2]), g)
    return (jnp.stack([dq, dk, dv], axis=1),)


block_attention_qkv_fused.defvjp(_fwd_qkv_fused, _bwd_qkv_fused)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def block_attention_bnhd(q, k, v, scale, kv_len=None, block_q=512):
    """block_attention for (b, n, h, d)-layout operands (no swapaxes).

    MEASURED NEGATIVE on real v5e Mosaic (2026-08-18): the transpose-free
    kernel CANNOT compile there. With (h, d) as the block's last two dims,
    Mosaic tiles (sublane, lane) over (h, d), so the per-head slice inside
    the kernel is a rank-expanding vector shape cast it rejects
    (tpu.reshape (bq,d)->(1,bq,1,d)); and gridding one head per block
    violates the second-minor divisibility rule (block h=1 vs array h=10).
    The head axis must be a non-tiled leading block axis — which IS the
    (b, h, n, d) layout of block_attention. On TPU this therefore delegates
    to the bhnd kernel (XLA fuses the surrounding swapaxes; measured
    ~2.5 ms/step of layout copies, the price of MXU-aligned tiles).
    Interpret mode still runs the true bnhd kernel for CI coverage.
    """
    if not _HAS_PALLAS or (
        jax.devices()[0].platform != "tpu" and not _INTERPRET
    ):
        out = _xla_f32(jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
                       jnp.swapaxes(v, 1, 2), scale, kv_len)
        return jnp.swapaxes(out, 1, 2)
    if not _INTERPRET:
        global _BNHD_DELEGATION_WARNED
        if not _BNHD_DELEGATION_WARNED:
            _BNHD_DELEGATION_WARNED = True
            import sys

            print(
                "[block_attention] NOTE: bnhd kernel cannot compile on real "
                "TPU Mosaic (see docstring); delegating to the bhnd kernel "
                "— CD360_ATTN_BNHD=1 measures nothing on TPU.",
                file=sys.stderr,
            )
        out = block_attention(
            jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
            jnp.swapaxes(v, 1, 2), scale, kv_len, block_q,
        )
        return jnp.swapaxes(out, 1, 2)
    return _forward_bnhd(q, k, v, scale, kv_len, block_q)


_BNHD_DELEGATION_WARNED = False


def _fwd(q, k, v, scale, kv_len, block_q):
    return block_attention(q, k, v, scale, kv_len, block_q), (q, k, v)


def _bwd(scale, kv_len, block_q, res, g):
    """Recompute-based backward in f32 XLA (no bf16 batched matmuls)."""
    q, k, v = res
    qf, kf, vf, gf = (t.astype(jnp.float32) for t in (q, k, v, g))
    s = jnp.einsum("bhnd,bhmd->bhnm", qf, kf) * scale
    if kv_len is not None and kv_len < k.shape[2]:
        mask = jnp.arange(k.shape[2]) < kv_len
        s = jnp.where(mask[None, None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhnm,bhnd->bhmd", p, gf)
    dp = jnp.einsum("bhnd,bhmd->bhnm", gf, vf)
    # softmax backward: dS = P * (dP - sum(dP * P))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhnm,bhmd->bhnd", ds, kf) * scale
    dk = jnp.einsum("bhnm,bhnd->bhmd", ds, qf) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


block_attention.defvjp(_fwd, _bwd)


def _fwd_bnhd(q, k, v, scale, kv_len, block_q):
    return block_attention_bnhd(q, k, v, scale, kv_len, block_q), (q, k, v)


def _bwd_bnhd(scale, kv_len, block_q, res, g):
    """Recompute-based backward, (b, n, h, d) layout (f32 XLA einsums)."""
    q, k, v = res
    qf, kf, vf, gf = (t.astype(jnp.float32) for t in (q, k, v, g))
    s = jnp.einsum("bnhd,bmhd->bhnm", qf, kf) * scale
    if kv_len is not None and kv_len < k.shape[1]:
        mask = jnp.arange(k.shape[1]) < kv_len
        s = jnp.where(mask[None, None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhnm,bnhd->bmhd", p, gf)
    dp = jnp.einsum("bnhd,bmhd->bhnm", gf, vf)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhnm,bmhd->bnhd", ds, kf) * scale
    dk = jnp.einsum("bhnm,bnhd->bmhd", ds, qf) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


block_attention_bnhd.defvjp(_fwd_bnhd, _bwd_bnhd)
