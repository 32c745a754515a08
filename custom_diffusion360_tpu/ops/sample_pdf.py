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
    # first index with cdf > u  (right side), then bracket [ind-1, ind]
    inds = jax.vmap(jnp.searchsorted, in_axes=(0, 0), out_axes=0)(
        cdf.reshape(-1, s + 1), u.reshape(-1, u.shape[-1])
    ).reshape(u.shape)
    below = jnp.clip(inds - 1, 0, s - 1)
    above = jnp.clip(inds, 0, s)

    cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(cdf, jnp.clip(above, 0, s), axis=-1)
    bins_b = jnp.take_along_axis(bins, below, axis=-1)
    bins_a = jnp.take_along_axis(bins, jnp.clip(above, 0, s), axis=-1)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < eps, 1.0, denom)
    t = jnp.clip((u - cdf_b) / denom, 0.0, 1.0)
    return bins_b + t * (bins_a - bins_b)
