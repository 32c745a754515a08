import jax
import jax.numpy as jnp
import numpy as np

from custom_diffusion360_tpu.geometry import (
    get_patch_ray_grid,
    get_patch_rays,
    plucker_parameterization,
    points_to_view_space,
    positional_encoding,
    ray_points_from_rays,
    rays_to_target_space,
    rays_to_view_space,
    transform_points_ndc,
)
from tests.test_cameras import random_cameras


def test_patch_ray_grid_order():
    xys = np.asarray(get_patch_ray_grid(2))
    # edges linspace(1,-1,3) = [1, 0, -1]; centers [0.5, -0.5]
    # row-major: y slow (vertical), x fast
    np.testing.assert_allclose(
        xys,
        np.array([[0.5, 0.5], [-0.5, 0.5], [0.5, -0.5], [-0.5, -0.5]], np.float32),
        atol=1e-6,
    )


def test_patch_ray_grid_stratified_within_cells():
    key = jax.random.PRNGKey(0)
    xys = np.asarray(get_patch_ray_grid(8, stratified=True, key=key))
    # stratified positions are jittered *edges* (reference semantics,
    # utils_cameraray.py:111-140): each stays within half a cell of its edge
    edges = np.linspace(1.0, -1.0, 9, dtype=np.float32)[:-1]
    cell = 2.0 / 8
    grid_x = np.broadcast_to(edges[None, :], (8, 8)).reshape(-1)
    grid_y = np.broadcast_to(edges[:, None], (8, 8)).reshape(-1)
    assert np.all(np.abs(xys[:, 0] - grid_x) <= cell / 2 + 1e-6)
    assert np.all(np.abs(xys[:, 1] - grid_y) <= cell / 2 + 1e-6)


def test_rays_reproject_to_pixels():
    """A point along each pixel ray must project back to that pixel's NDC."""
    cams = random_cameras(2, seed=3)
    cams2 = cams.reshape(1, 2)
    rays, xys = get_patch_rays(cams2, resolution=4)
    pts = ray_points_from_rays(rays, jnp.full(rays.shape[:-1] + (3,), 1.7))
    # project sample points of camera j into camera j
    for j in range(2):
        ndc = transform_points_ndc(cams[j], pts[0, j].reshape(-1, 3))
        xy = np.asarray(ndc[..., :2]).reshape(16, 3 if False else 3, 2)[:, 0]
        np.testing.assert_allclose(xy, np.asarray(xys), atol=1e-4)


def test_ray_directions_unit_norm():
    cams = random_cameras(3).reshape(1, 3)
    rays, _ = get_patch_rays(cams, resolution=8)
    n = np.linalg.norm(np.asarray(rays[..., 3:]), axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=1e-5)


def test_plucker_is_translation_invariant_along_ray():
    rng = np.random.default_rng(0)
    o = rng.normal(size=(5, 3)).astype(np.float32)
    d = rng.normal(size=(5, 3)).astype(np.float32)
    rays = jnp.concatenate([jnp.asarray(o), jnp.asarray(d)], -1)
    shifted = jnp.concatenate(
        [jnp.asarray(o + 2.5 * d / np.linalg.norm(d, axis=-1, keepdims=True)), jnp.asarray(d)], -1
    )
    p1 = np.asarray(plucker_parameterization(rays))
    p2 = np.asarray(plucker_parameterization(shifted))
    np.testing.assert_allclose(p1, p2, atol=1e-4)


def test_positional_encoding_values_and_layout():
    x = jnp.asarray([[0.3, -1.2, 0.7]], jnp.float32)
    n_freqs = 4
    out = np.asarray(positional_encoding(x, n_freqs))
    assert out.shape == (1, 3 * 2 * n_freqs)
    freqs = 2.0 ** (np.arange(n_freqs) - n_freqs / 2) * np.pi
    sins = np.concatenate([np.sin(np.asarray(x) * f) for f in freqs], -1)
    coss = np.concatenate([np.cos(np.asarray(x) * f) for f in freqs], -1)
    np.testing.assert_allclose(out, np.concatenate([sins, coss], -1), atol=1e-5)


def test_view_and_target_space_transforms():
    cams = random_cameras(3, seed=7).reshape(1, 3)
    rays, _ = get_patch_rays(cams, resolution=2)  # (1, 3, 4, 6)
    target_rays = rays[:, 0]  # (1, 4, 6)

    v = rays_to_view_space(cams, target_rays)  # (1, 3, 4, 6)
    # ray i transformed by camera i's world-to-view:
    for i in range(3):
        o = np.asarray(target_rays[0, :, :3]) @ np.asarray(cams.R[0, i]) + np.asarray(
            cams.T[0, i]
        )
        d = np.asarray(target_rays[0, :, 3:]) @ np.asarray(cams.R[0, i])
        np.testing.assert_allclose(np.asarray(v[0, i, :, :3]), o, atol=1e-5)
        np.testing.assert_allclose(np.asarray(v[0, i, :, 3:]), d, atol=1e-5)

    t = rays_to_target_space(cams, rays[:, 1:])  # refs into target frame
    for i in range(2):
        o = np.asarray(rays[0, i + 1, :, :3]) @ np.asarray(cams.R[0, 0]) + np.asarray(
            cams.T[0, 0]
        )
        np.testing.assert_allclose(np.asarray(t[0, i, :, :3]), o, atol=1e-5)

    pts = ray_points_from_rays(target_rays, jnp.ones(target_rays.shape[:-1] + (5,)))
    pv = points_to_view_space(cams, pts)  # (1, 3, 4, 5, 3)
    for i in range(3):
        expected = np.asarray(pts[0]).reshape(-1, 3) @ np.asarray(
            cams.R[0, i]
        ) + np.asarray(cams.T[0, i])
        np.testing.assert_allclose(
            np.asarray(pv[0, i]).reshape(-1, 3), expected, atol=1e-5
        )
