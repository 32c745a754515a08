import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_diffusion360_tpu.geometry import (
    Cameras,
    adjust_camera_to_bbox_crop,
    adjust_camera_to_image_scale,
    camera_center,
    interpolate_camera_focal,
    interpolate_camera_translation,
    normalize_cameras,
    transform_points_ndc,
    unproject_ndc_points,
    world_to_view,
)


def random_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ],
        dtype=np.float32,
    )


def random_cameras(n, seed=0, image_size=512.0):
    rng = np.random.default_rng(seed)
    R = np.stack([random_rotation(rng) for _ in range(n)])
    T = rng.normal(size=(n, 3)).astype(np.float32) * 0.3 + np.array(
        [0, 0, 3.0], np.float32
    )
    focal = rng.uniform(1.5, 3.0, size=(n, 2)).astype(np.float32)
    pp = rng.uniform(-0.1, 0.1, size=(n, 2)).astype(np.float32)
    return Cameras.create(R, T, focal, pp, image_size)


def test_world_view_roundtrip():
    cams = random_cameras(4)
    pts = jnp.asarray(np.random.default_rng(1).normal(size=(4, 7, 3)), jnp.float32)
    pv = world_to_view(cams, pts)
    # invert manually: X_world = (X_view - T) @ R^T  (row-vector convention)
    back = jnp.einsum("bnj,bkj->bnk", pv - cams.T[:, None], cams.R)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)


def test_project_unproject_roundtrip():
    cams = random_cameras(3)
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.normal(size=(3, 11, 3)).astype(np.float32))
    # make sure points are in front of the cameras
    pv = world_to_view(cams, pts)
    pts = pts + 0.0  # keep name
    ndc = transform_points_ndc(cams, pts)
    depth = pv[..., 2:3]
    xy_depth = jnp.concatenate([ndc[..., :2], depth], -1)
    back = unproject_ndc_points(cams, xy_depth)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)


def test_camera_center_projects_to_origin_view():
    cams = random_cameras(5)
    c = camera_center(cams)
    pv = world_to_view(cams, c[:, None])
    np.testing.assert_allclose(np.asarray(pv), 0.0, atol=1e-5)


def test_normalize_cameras_properties():
    cams = random_cameras(6, seed=5)
    new, p_intersect, s = normalize_cameras(cams)
    # after normalization the optical-axis intersection should be ~ the origin
    p2, dist = __import__(
        "custom_diffusion360_tpu.geometry.cameras", fromlist=["optical_axis_intersection"]
    ).optical_axis_intersection(new)
    np.testing.assert_allclose(np.asarray(p2), 0.0, atol=1e-4)
    # and the max camera distance should be 1
    c = camera_center(new)
    np.testing.assert_allclose(
        float(jnp.max(jnp.linalg.norm(c, axis=-1))), 1.0, atol=1e-4
    )
    # rotations unchanged
    np.testing.assert_allclose(np.asarray(new.R), np.asarray(cams.R), atol=1e-6)


def test_bbox_crop_preserves_projection():
    """Projecting a world point before and after crop must land on the same
    absolute pixel (crop only re-expresses intrinsics)."""
    cams = random_cameras(1, image_size=(400.0, 600.0))  # (H, W)
    pt = jnp.asarray([[[0.05, -0.07, 2.5]]], jnp.float32)
    ndc0 = transform_points_ndc(cams, pt[0])[0, 0]
    h, w = 400.0, 600.0
    s = min(h, w) / 2
    px0 = w / 2 - float(ndc0[0]) * s
    py0 = h / 2 - float(ndc0[1]) * s

    bbox = (100.0, 50.0, 300.0, 300.0)  # x0, y0, w, h
    cropped = adjust_camera_to_bbox_crop(cams, bbox)
    ndc1 = transform_points_ndc(cropped, pt[0])[0, 0]
    s1 = 300.0 / 2
    px1 = 300.0 / 2 - float(ndc1[0]) * s1 + bbox[0]
    py1 = 300.0 / 2 - float(ndc1[1]) * s1 + bbox[1]
    assert abs(px0 - px1) < 1e-2 and abs(py0 - py1) < 1e-2

    # uniform rescale of a square crop is an NDC no-op
    rescaled = adjust_camera_to_image_scale(cropped, (512.0, 512.0))
    ndc2 = transform_points_ndc(rescaled, pt[0])[0, 0]
    np.testing.assert_allclose(np.asarray(ndc2[:2]), np.asarray(ndc1[:2]), atol=1e-5)


def test_interpolate_translation_keeps_orientation_and_moves_center():
    cams = random_cameras(1)
    cam = cams[0]
    offsets = jnp.asarray([[0.0, 0.0, 0.0], [0.1, 0.0, 0.0]], jnp.float32)
    swept = interpolate_camera_translation(cam, offsets)
    np.testing.assert_allclose(np.asarray(swept.R[0]), np.asarray(swept.R[1]))
    # zero offset reproduces the camera center
    c0 = camera_center(cam)
    np.testing.assert_allclose(
        np.asarray(camera_center(swept)[0]), np.asarray(c0), atol=1e-5
    )
    # the second camera center is the world point at view-space (0.1, 0, 0)
    from custom_diffusion360_tpu.geometry.cameras import view_to_world

    expected = view_to_world(cam, offsets[1:2])[0]
    np.testing.assert_allclose(
        np.asarray(camera_center(swept)[1]), np.asarray(expected), atol=1e-5
    )


def test_interpolate_focal():
    cams = random_cameras(1)
    swept = interpolate_camera_focal(cams[0], jnp.asarray([1.0, 2.0]))
    np.testing.assert_allclose(
        np.asarray(swept.focal_length[1]), np.asarray(cams.focal_length[0]) * 2.0
    )
