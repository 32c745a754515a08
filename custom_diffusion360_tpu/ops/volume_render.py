"""Volume rendering (alpha compositing with exclusive-cumsum transmittance).

Replaces the reference's VolRender (sgm/modules/nerfsd_pytorch3d.py:164-231).
The cumulative sum over the (small, static) sample axis lowers to an efficient
XLA scan/prefix-sum and fuses with the surrounding elementwise math.
"""
from __future__ import annotations

import jax.numpy as jnp


def render_weights(densities: jnp.ndarray, deltas: jnp.ndarray):
    """Per-sample compositing weights from densities and segment lengths.

    densities, deltas: (..., S, 1). Returns (weights, alphas, transmittance),
    each (..., S, 1). Matches VolRender.get_weights
    (nerfsd_pytorch3d.py:170-194): transmittance uses an exclusive cumsum of
    delta * density.
    """
    delta_density = deltas * densities
    alphas = 1.0 - jnp.exp(-delta_density)
    accum = jnp.cumsum(delta_density, axis=-2)
    exclusive = accum - delta_density  # exclusive prefix sum
    transmittance = jnp.exp(-exclusive)
    weights = jnp.nan_to_num(alphas * transmittance)
    return weights, alphas, transmittance


def volume_render(
    features: jnp.ndarray,
    densities: jnp.ndarray,
    dists: jnp.ndarray | None = None,
    rgb: jnp.ndarray | None = None,
    densities_uniform: jnp.ndarray | None = None,
    dists_uniform: jnp.ndarray | None = None,
):
    """Composite per-sample features (and optional rgb) along the ray.

    features: (..., S, C); densities/dists: (..., S, 1).
    Returns dict(feats, fg_mask, alphas, weights, weights_uniform, rgb).
    If dists is None, ``densities`` are used directly as weights (pretrained
    NeRF path, nerfsd_pytorch3d.py:213).
    """
    if dists is not None:
        weights, alphas, _ = render_weights(densities, dists)
        fg_mask = jnp.sum(weights, axis=-2)
    else:
        weights, alphas, fg_mask = densities, None, None

    feats = jnp.sum(weights * features, axis=-2)
    rgb_out = jnp.sum(weights * rgb, axis=-2) if rgb is not None else None

    weights_uniform = None
    if densities_uniform is not None:
        weights_uniform, _, _ = render_weights(densities_uniform, dists_uniform)

    return dict(
        feats=feats,
        fg_mask=fg_mask,
        alphas=alphas,
        weights=weights,
        weights_uniform=weights_uniform,
        rgb=rgb_out,
    )
