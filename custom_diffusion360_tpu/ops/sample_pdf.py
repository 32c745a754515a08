"""Inverse-CDF importance sampling of ray depths.

TPU-native replacement for pytorch3d's CUDA ``_C.sample_pdf``
(reference call: sgm/modules/nerfsd_pytorch3d.py:300). Fully batched, static
shapes, differentiation-free (the reference wraps it in no_grad); implemented
with a vectorized binary search (jnp.searchsorted) + lerp so it fuses into the
surrounding jitted FeatureNeRF program instead of a host round-trip.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_pdf(
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    u: jnp.ndarray,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Draw samples from the piecewise-constant pdf defined by ``weights``.

    bins:    (..., S+1) monotonically increasing bin edges
    weights: (..., S)   non-negative bin masses (need not be normalized)
    u:       (..., K)   uniforms in [0, 1)
    Returns  (..., K)   samples (same semantics as pytorch3d sample_pdf: the
    CDF is inverted with linear interpolation inside the selected bin).
    """
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (..., S+1)

    s = weights.shape[-1]
    # Branchless searchsorted: with only S+1 = 25 edges, counting
    # ``cdf < u`` over a (..., K, S+1) comparison tensor is one fused VPU
    # pass, while jnp.searchsorted lowers to a serial while-loop binary
    # search (profiled at ~45 ms per render across the 9 importance-chained
    # blocks; this form is <2 ms). Same 'left' semantics: count of cdf < u.
    lt = cdf[..., None, :] < u[..., :, None]  # (..., K, S+1)
    inds = jnp.sum(lt.astype(jnp.int32), axis=-1)
    below = jnp.clip(inds - 1, 0, s - 1)
    above = jnp.clip(inds, 0, s)

    # gather-free take_along_axis: mask-and-sum over the 25-edge axis
    # (multi-dim gathers are a compile/runtime landmine on this backend)
    iota = jax.lax.broadcasted_iota(jnp.int32, below.shape + (s + 1,), below.ndim)

    def take(src, idx):
        sel = (iota == idx[..., None]).astype(src.dtype)
        return jnp.sum(src[..., None, :] * sel, axis=-1)

    cdf_b = take(cdf, below)
    cdf_a = take(cdf, above)
    bins_b = take(bins, below)
    bins_a = take(bins, above)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < eps, 1.0, denom)
    t = jnp.clip((u - cdf_b) / denom, 0.0, 1.0)
    return bins_b + t * (bins_a - bins_b)
