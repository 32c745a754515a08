"""Multi-head attention for TPU.

Replaces xformers ``memory_efficient_attention`` / torch SDPA (reference:
sgm/modules/attention.py:290-294,405-408; sgm/modules/diffusionmodules/
model.py:249). Two paths:

* ``pallas``: the fused flash-attention TPU kernel
  (jax.experimental.pallas.ops.tpu.flash_attention) when shapes allow —
  long self-attention sequences in the UNet/VAE.
* ``xla``: a plain jnp implementation with fp32 softmax accumulation; XLA
  fuses this well for short sequences (77-token text cross-attention) and it
  is the fallback everywhere (CPU tests, odd shapes).

Inputs are (batch, seq, heads, head_dim) — the layout the models keep
activations in; transposition to the kernel layout happens here.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

# A/B switch for the transpose-free (b,n,h,d) block kernel: flip via env
# CD360_ATTN_BNHD=1 to measure the in-graph step without code edits.
# Default stays on the swapaxes+bhnd path until a trace shows bnhd wins.
_USE_BNHD = os.environ.get("CD360_ATTN_BNHD", "") == "1"

# Fused-QKV self-attention path (one (b,3,h,n,d) kernel operand instead of
# split + per-head transposes). CD360_ATTN_QKV_FUSED=0 restores the split
# path for A/B. Default on: same-session TPU A/B measured 123.9 -> 123.0
# ms on the 1024^2 cached sampling step (round 4) — ~0.6-0.9 ms/step across
# four runs, well short of the ~2.7 ms the halved qkv-copy traffic predicts
# (the kernel's VPU softmax denominator gives part back; see
# block_attention._forward_qkv_fused).
_QKV_FUSED = os.environ.get("CD360_ATTN_QKV_FUSED", "1") == "1"

_FLASH = None


def _get_flash():
    global _FLASH
    if _FLASH is None:
        try:
            from jax.experimental.pallas.ops.tpu import flash_attention as fa

            _FLASH = fa
        except Exception:  # pragma: no cover
            _FLASH = False
    return _FLASH


def _xla_attention(q, k, v, scale):
    # q: (b, n, h, d); k/v: (b, m, h, d). Math in f32: bf16 batched attention
    # matmuls crash this libtpu's compiler at seq >= 2048 (SIGABRT lowering
    # the einsum to a dilated convolution), and f32 softmax matches the
    # reference's autocast islands anyway.
    dtype = v.dtype
    qf, kf, vf = (t.astype(jnp.float32) for t in (q, k, v))
    logits = jnp.einsum("bnhd,bmhd->bhnm", qf, kf)
    probs = jax.nn.softmax(logits * scale, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", probs, vf).astype(dtype)


def _flash_ok(q, k):
    if jax.devices()[0].platform != "tpu":
        return False
    b, n, h, d = q.shape
    m = k.shape[1]
    # lane-aligned head dim (64 validated on v5e) and block-aligned seqs
    return (d % 64 == 0) and (n % 128 == 0) and (m % 128 == 0) and n >= 128


def _block_ok(q, k):
    if jax.devices()[0].platform != "tpu":
        return False
    d = q.shape[-1]
    m = k.shape[1]
    # whole KV resident in VMEM: scores block (block_q, m_pad) in f32.
    # m=4096 (the 1024^2 ds2 self-attention) measured faster single-pass
    # than the streaming flash kernel (1.41 vs 1.83 ms at b2 h10 d64).
    # Short-KV cross-attention (77-token text, m<=128) goes to plain XLA:
    # the matmuls are tiny there and XLA overlaps them with neighboring
    # MXU work, while every pallas call is a scheduling sync point —
    # kernel dispatch measured +6.8 ms/step on the 1024^2 cached step
    # (130.9 -> 124.1 ms with XLA cross-attn). Raising the XLA boundary
    # to m=1024 (ds4 self-attention) OOMs HBM — the f32 scores tensors
    # are too large outside the kernel. 128 is the tuned cutover.
    return d % 64 == 0 and 128 < m <= 4096


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Softmax attention. q: (b, n, h, d); k, v: (b, m, h, d) -> (b, n, h, d).

    ``scale`` defaults to d**-0.5 (torch SDPA default, attention.py:294).
    Dispatch: single-pass Pallas kernel when the KV fits VMEM (short seqs and
    all text cross-attention), streaming flash kernel for long self-attention,
    f32 XLA otherwise.
    """
    d = q.shape[-1]
    if scale is None:
        scale = d**-0.5

    if impl == "auto":
        if _block_ok(q, k):
            impl = "block"
        elif _flash_ok(q, k) and _get_flash():
            impl = "pallas"
        else:
            impl = "xla"

    if impl == "block":
        from .block_attention import block_attention, block_attention_bnhd

        # tuned on v5e (all-heads kernel): long KV needs a smaller q block
        # to bound the f32 scores tile; 512 wins everywhere else
        bq = 256 if k.shape[1] > 2048 else 512
        if _USE_BNHD:
            return block_attention_bnhd(q, k, v, scale, None, bq)
        qt = jnp.swapaxes(q, 1, 2)
        # self-attention passes the same array three times — transpose once
        kt = qt if k is q else jnp.swapaxes(k, 1, 2)
        vt = kt if v is k else jnp.swapaxes(v, 1, 2)
        out = block_attention(qt, kt, vt, scale, None, bq)
        return jnp.swapaxes(out, 1, 2)

    if impl == "pallas":
        fa = _get_flash()
        qt = jnp.swapaxes(q, 1, 2)  # (b, h, n, d)
        kt = jnp.swapaxes(k, 1, 2)
        vt = jnp.swapaxes(v, 1, 2)
        n, m = qt.shape[2], kt.shape[2]
        # tuned on v5e (d=64, UNet shapes): default blocks leave 5x on the
        # table (10.6ms -> 2.1ms at b2 h10 n4096)
        bq, bk = min(n, 512), min(m, 1024)
        bs = fa.BlockSizes(
            block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
            block_q_major_dkv=bq, block_k_major_dkv=bk,
            block_k_dkv=bk, block_q_dkv=bq,
            block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
        )
        out = fa.flash_attention(
            qt, kt, vt, causal=False, sm_scale=scale, block_sizes=bs
        )
        return jnp.swapaxes(out, 1, 2)

    return _xla_attention(q, k, v, scale)


def dot_product_attention_qkv(
    qkv: jnp.ndarray, n_heads: int, scale: float | None = None
) -> jnp.ndarray:
    """Self-attention from the FUSED to_qkv projection output.

    qkv: (b, n, 3*h*d), columns ordered [q | k | v] -> (b, n, h*d).
    When the single-pass kernel applies, feeds it one (b, 3, h, n, d)
    operand (one transpose copy) instead of split+per-head transposes
    (six copy fusions per layer — see block_attention_qkv_fused); else
    splits and falls back to :func:`dot_product_attention`.
    """
    b, n, inner3 = qkv.shape
    inner = inner3 // 3
    d = inner // n_heads
    if scale is None:
        scale = d**-0.5
    block_q = 256 if n > 2048 else 512
    if (
        _QKV_FUSED
        and jax.devices()[0].platform == "tpu"
        and d % 64 == 0
        and 128 < n <= 4096
        and n % block_q == 0
    ):
        from .block_attention import block_attention_qkv_fused

        q5 = qkv.reshape(b, n, 3, n_heads, d).transpose(0, 2, 3, 1, 4)
        out = block_attention_qkv_fused(q5, scale, block_q)  # (b, h, n, d)
        return jnp.swapaxes(out, 1, 2).reshape(b, n, inner)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, n, n_heads, d)
    k = k.reshape(b, n, n_heads, d)
    v = v.reshape(b, n, n_heads, d)
    return dot_product_attention(q, k, v, scale).reshape(b, n, inner)


def attention_padded_kv(q, k, v, kv_len: int, scale: float | None = None):
    """Attention where k/v were zero-padded along seq to ``k.shape[1]``.

    Applies a large-negative mask to padded keys; used for 77-token text
    context padded to a lane-aligned length.
    """
    d = q.shape[-1]
    if scale is None:
        scale = d**-0.5
    logits = jnp.einsum(
        "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
    )
    m = k.shape[1]
    mask = (jnp.arange(m) < kv_len)[None, None, None, :]
    logits = jnp.where(mask, logits * scale, -1e30)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", probs, v)
