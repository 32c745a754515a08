"""Patch-ray generation, Plücker parameterization, NeRF positional encoding,
and view/target-frame ray transforms — pure JAX, fully batched.

Replaces the reference's CPU-side pytorch3d RayBundle pipeline
(sgm/modules/utils_cameraray.py). Where the reference loops over per-sample
camera lists (utils_cameraray.py:245-314), everything here is a single
vectorized op over a ``Cameras`` pytree with batch shape (B, N).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .cameras import Cameras, camera_center, unproject_ndc_points, world_to_view

# ---------------------------------------------------------------------------
# NDC pixel grids
# ---------------------------------------------------------------------------


def _edge_jitter(key, edges):
    """Jitter positions uniformly inside each cell given its edge array.

    Mirrors the stratified branch of get_patch_raybundle
    (utils_cameraray.py:111-140): one shared 1-D jitter per axis.
    """
    center = (edges[1:] + edges[:-1]) / 2.0
    upper = jnp.concatenate([center, edges[-1:]])
    lower = jnp.concatenate([edges[:1], center])
    u = jax.random.uniform(key, edges.shape, dtype=edges.dtype)
    return (lower + (upper - lower) * u)[:-1]


def get_patch_ray_grid(resolution: int, stratified: bool = False, key=None):
    """Per-pixel NDC sample positions, flattened row-major.

    Returns (xys,) with xys (hw, 2) = (x_ndc, y_ndc). The grid runs +1 -> -1 on
    both axes (pytorch3d NDC: +X left, +Y up), matching
    utils_cameraray.py:106-153. Row-major flatten: y (vertical) is the slow
    axis, so token order equals image row order.
    """
    edges = jnp.linspace(1.0, -1.0, resolution + 1, dtype=jnp.float32)
    if stratified:
        assert key is not None, "stratified ray grid needs a PRNG key"
        kx, ky = jax.random.split(key)
        xs = _edge_jitter(kx, edges)
        ys = _edge_jitter(ky, edges)
    else:
        xs = (edges[:-1] + edges[1:]) / 2.0
        ys = xs
    gx = jnp.broadcast_to(xs[None, :], (resolution, resolution))
    gy = jnp.broadcast_to(ys[:, None], (resolution, resolution))
    return jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)


def get_patch_rays(cams: Cameras, resolution: int, stratified: bool = False, key=None):
    """World-space rays through every pixel center of every camera.

    cams: batch shape (..., ) — typically (B, N) with camera 0 the target.
    Returns (rays, xys): rays (..., hw, 6) = (origin, unit direction), xys (hw, 2).
    Reference: get_patch_rays / get_directional_raybundle
    (utils_cameraray.py:61-196), computed there on CPU; here it is jitted
    device code.
    """
    xys = get_patch_ray_grid(resolution, stratified=stratified, key=key)
    hw = xys.shape[0]
    xy_depth = jnp.concatenate([xys, jnp.ones((hw, 1), xys.dtype)], -1)
    # broadcast the pixel grid over all camera batch dims
    xy_depth = jnp.broadcast_to(xy_depth, cams.batch_shape + (hw, 3))
    unprojected = unproject_ndc_points(cams, xy_depth)  # (..., hw, 3)
    origins = jnp.broadcast_to(
        camera_center(cams)[..., None, :], unprojected.shape
    )
    directions = unprojected - origins
    directions = directions / (
        jnp.linalg.norm(directions, axis=-1, keepdims=True) + 1e-12
    )
    return jnp.concatenate([origins, directions], axis=-1), xys


def ray_points_from_rays(rays: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """rays (..., hw, 6), lengths (..., hw, S) -> points (..., hw, S, 3).

    pytorch3d ``ray_bundle_to_ray_points`` equivalent
    (nerfsd_pytorch3d.py:370,387).
    """
    o, d = rays[..., :3], rays[..., 3:]
    return o[..., None, :] + d[..., None, :] * lengths[..., :, None]


# ---------------------------------------------------------------------------
# Parameterizations / encodings
# ---------------------------------------------------------------------------


def plucker_parameterization(rays: jnp.ndarray) -> jnp.ndarray:
    """(origin, dir) -> (unit dir, origin x unit dir). (..., 6) -> (..., 6).

    Reference: utils_cameraray.py:201-219.
    """
    o, d = rays[..., :3], rays[..., 3:]
    d = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-12)
    return jnp.concatenate([d, jnp.cross(o, d)], axis=-1)


def positional_encoding(x: jnp.ndarray, n_freqs: int = 10) -> jnp.ndarray:
    """NeRF PE with frequency band 2^[-n/2, n/2) * pi; concat sin then cos.

    Output channel layout matches the reference exactly (all sines for every
    frequency, then all cosines — utils_cameraray.py:222-242):
    (..., d) -> (..., d * 2 * n_freqs).
    """
    start = -(n_freqs / 2.0)
    freqs = (2.0 ** (start + jnp.arange(n_freqs, dtype=x.dtype))) * jnp.pi
    # (..., F, d): scale last dim by each frequency
    xf = x[..., None, :] * freqs[:, None]
    sin = jnp.sin(xf).reshape(*x.shape[:-1], n_freqs * x.shape[-1])
    cos = jnp.cos(xf).reshape(*x.shape[:-1], n_freqs * x.shape[-1])
    return jnp.concatenate([sin, cos], axis=-1)


# ---------------------------------------------------------------------------
# Frame transforms (reference: utils_cameraray.py:35-58, 245-314)
# ---------------------------------------------------------------------------


def transform_rays(rays: jnp.ndarray, R: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Apply world-to-view (R, T) to (origin, direction) rays.

    rays (..., 6); R (..., 3, 3); T (..., 3) — batch dims broadcast.
    """
    o = jnp.einsum("...j,...jk->...k", rays[..., :3], R) + T
    d = jnp.einsum("...j,...jk->...k", rays[..., 3:], R)
    return jnp.concatenate([o, d], axis=-1)


def rays_to_view_space(cams: Cameras, rays: jnp.ndarray) -> jnp.ndarray:
    """Target rays into every camera's view frame.

    cams batch (B, N); rays (B, hw, 6) -> (B, N, hw, 6).
    Reference: convert_to_view_space (utils_cameraray.py:270-292).
    """
    return transform_rays(
        rays[:, None, :, :], cams.R[:, :, None], cams.T[:, :, None]
    )


def rays_to_target_space(cams: Cameras, rays: jnp.ndarray) -> jnp.ndarray:
    """Reference-view rays into the target (camera 0) frame.

    cams batch (B, N); rays (B, M, hw, 6) -> (B, M, hw, 6), transformed by
    camera 0's (R, T) for each batch element.
    Reference: convert_to_target_space (utils_cameraray.py:245-267).
    """
    return transform_rays(rays, cams.R[:, :1, None], cams.T[:, :1, None])


def points_to_view_space(cams: Cameras, points: jnp.ndarray) -> jnp.ndarray:
    """Target ray points into every camera's view frame.

    cams batch (B, N); points (B, hw, S, 3) -> (B, N, hw, S, 3).
    Reference: convert_to_view_space_points (utils_cameraray.py:295-314).
    """
    return (
        jnp.einsum("bwsj,bnjk->bnwsk", points, cams.R)
        + cams.T[:, :, None, None, :]
    )
