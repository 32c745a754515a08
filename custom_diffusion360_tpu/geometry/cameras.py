"""Pure-JAX perspective-camera math following pytorch3d's row-vector conventions.

The reference carries camera poses as lists of pytorch3d ``PerspectiveCameras``
objects through its batches (reference: sgm/data/data_co3d.py:631,
sgm/modules/utils_cameraray.py:245-314). Objects can't cross a jit boundary, so
here a camera batch is a plain struct-of-arrays pytree; every op is vectorized
and jit/vmap/shard_map friendly and runs on device (the reference computes its
ray/camera math on CPU — utils_cameraray.py:82-98).

Conventions reproduced (so that delta checkpoints and camera.bin files from the
reference remain semantically compatible):

* world-to-view uses row vectors:  ``X_view = X_world @ R + T``
* camera center:                   ``C = -T @ R^T``
* NDC: +X left, +Y up; for an image of size (H, W) with s = min(H, W) the
  shorter side spans [-1, 1]. Projection of a view-space point (x, y, z):
  ``x_ndc = fx * x / z + px``, ``y_ndc = fy * y / z + py``.
* unprojection from NDC at depth d: ``x_view = (x_ndc - px) * d / fx`` etc.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def _xp(x):
    """numpy for host-resident cameras, jax.numpy otherwise.

    The data loader runs this module's intrinsic/normalization math once per
    frame on tiny (3,3)-ish arrays; through eager jnp that is ~0.1-0.3 ms of
    dispatch per op (~300 ms/item profiled at 5 views) vs ~1 us in numpy.
    Inside jit the fields are tracers, so device callers keep the jnp path.
    """
    return np if isinstance(x, np.ndarray) else jnp


class Cameras(NamedTuple):
    """A batch of perspective cameras; all fields share leading batch dims.

    R: (..., 3, 3)  world-to-view rotation (row-vector convention)
    T: (..., 3)     world-to-view translation
    focal_length: (..., 2)      (fx, fy) in NDC units
    principal_point: (..., 2)   (px, py) in NDC units
    image_size: (..., 2)        (H, W) in pixels; only used by screen-space ops
    """

    R: jnp.ndarray
    T: jnp.ndarray
    focal_length: jnp.ndarray
    principal_point: jnp.ndarray
    image_size: jnp.ndarray

    @property
    def batch_shape(self):
        return self.R.shape[:-2]

    def __getitem__(self, idx):  # slicing a camera batch
        return Cameras(*(f[idx] for f in self))

    def reshape(self, *shape):
        return Cameras(
            self.R.reshape(*shape, 3, 3),
            self.T.reshape(*shape, 3),
            self.focal_length.reshape(*shape, 2),
            self.principal_point.reshape(*shape, 2),
            self.image_size.reshape(*shape, 2),
        )

    @staticmethod
    def create(R, T, focal_length, principal_point, image_size=None, xp=jnp):
        """xp=np builds a host-resident camera batch (numpy fields) — the
        data-loader path; see _xp. Both flavors cross jit boundaries fine."""
        R = xp.asarray(R, np.float32)
        T = xp.asarray(T, np.float32)
        batch = R.shape[:-2]
        focal_length = xp.broadcast_to(
            xp.asarray(focal_length, np.float32), batch + (2,)
        )
        principal_point = xp.broadcast_to(
            xp.asarray(principal_point, np.float32), batch + (2,)
        )
        if image_size is None:
            image_size = 512.0
        image_size = xp.broadcast_to(
            xp.asarray(image_size, np.float32), batch + (2,)
        )
        return Cameras(R, T, focal_length, principal_point, image_size)


def stack_cameras(cams, axis=0):
    """Stack a python list of Cameras along a new batch axis."""
    xp = _xp(cams[0].R)
    return Cameras(*(xp.stack(x, axis=axis) for x in zip(*cams)))


def concat_cameras(cams, axis=0):
    """Concatenate Cameras along an existing batch axis (pytorch3d's
    join_cameras_as_batch equivalent)."""
    xp = _xp(cams[0].R)
    return Cameras(*(xp.concatenate(x, axis=axis) for x in zip(*cams)))


def camera_center(cam: Cameras) -> jnp.ndarray:
    """(...,3) world-space optical center: C = -T @ R^T."""
    return -_xp(cam.R).einsum("...j,...kj->...k", cam.T, cam.R)


def world_to_view(cam: Cameras, points: jnp.ndarray) -> jnp.ndarray:
    """points (..., N, 3) world -> view. Broadcasts camera batch dims."""
    xp = jnp if not isinstance(points, np.ndarray) else _xp(cam.R)
    return xp.einsum("...nj,...jk->...nk", points, cam.R) + cam.T[..., None, :]


def view_to_world(cam: Cameras, points: jnp.ndarray) -> jnp.ndarray:
    xp = jnp if not isinstance(points, np.ndarray) else _xp(cam.R)
    rinv = xp.swapaxes(cam.R, -1, -2)
    return xp.einsum("...nj,...jk->...nk", points - cam.T[..., None, :], rinv)


transform_points_world_to_view = world_to_view


def transform_points_ndc(cam: Cameras, points: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Project world points (..., N, 3) to NDC (..., N, 3).

    Matches pytorch3d ``PerspectiveCameras.transform_points_ndc``: the returned
    z is the (unclamped) inverse view depth; x/y use a sign-preserving eps clamp
    on the depth divisor.
    """
    pv = world_to_view(cam, points)
    xp = _xp(pv)
    z = pv[..., 2:3]
    zdiv = xp.where(z >= 0, xp.maximum(z, eps), xp.minimum(z, -eps))
    xy = pv[..., :2] / zdiv
    xy = xy * cam.focal_length[..., None, :] + cam.principal_point[..., None, :]
    return xp.concatenate([xy, 1.0 / zdiv], axis=-1)


def unproject_ndc_points(cam: Cameras, xy_depth: jnp.ndarray, world_coordinates: bool = True) -> jnp.ndarray:
    """Inverse of transform_points_ndc for (x_ndc, y_ndc, depth) triples.

    xy_depth: (..., N, 3) with depth the view-space z.
    Reference behaviour: pytorch3d ``unproject_points(..., from_ndc=True)`` used
    at utils_cameraray.py:79-82 and data_co3d.py:74.
    """
    depth = xy_depth[..., 2:3]
    xy_view = (
        (xy_depth[..., :2] - cam.principal_point[..., None, :])
        * depth
        / cam.focal_length[..., None, :]
    )
    pv = _xp(xy_view).concatenate([xy_view, depth], axis=-1)
    return view_to_world(cam, pv) if world_coordinates else pv


# ---------------------------------------------------------------------------
# Camera normalization (reference: sgm/data/data_co3d.py:27-125)
# ---------------------------------------------------------------------------


def _intersect_skew_lines(p: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Least-squares point closest to a set of lines (origins p, directions r).

    p, r: (N, 3). Returns (3,). Reference: data_co3d.py:40-56.
    """
    xp = _xp(p)
    r = r / (xp.linalg.norm(r, axis=-1, keepdims=True) + 1e-12)
    eye = xp.eye(3, dtype=p.dtype)
    i_min_cov = eye[None] - r[..., :, None] * r[..., None, :]  # (N, 3, 3)
    a = i_min_cov.sum(axis=0)
    b = xp.einsum("nij,nj->i", i_min_cov, p)
    # 3x3 solve; lstsq in the reference, but A is SPD in non-degenerate cases.
    return xp.linalg.solve(a + 1e-10 * eye, b)


def optical_axis_intersection(cams: Cameras):
    """Point closest to all optical axes + per-camera distance to it.

    cams: batch (N,). Returns (p_intersect (3,), dist (N,)).
    Reference: data_co3d.py:67-91.
    """
    xp = _xp(cams.R)
    centers = camera_center(cams)  # (N, 3)
    pp_ndc = xp.concatenate(
        [cams.principal_point, xp.ones_like(cams.principal_point[..., :1])], -1
    )  # (N, 3): principal point at depth 1
    pp_world = unproject_ndc_points(cams, pp_ndc[:, None, :])[:, 0]  # (N, 3)
    directions = pp_world - centers
    p_intersect = _intersect_skew_lines(centers, directions)
    dist = xp.linalg.norm(p_intersect[None] - centers, axis=-1)
    return p_intersect, dist


def normalize_cameras(cams: Cameras, scale: float | None = None):
    """Translate the optical-axis intersection point to the origin and scale
    translations by the max camera distance (reference: data_co3d.py:94-125).

    Returns (new_cams, p_intersect, scale).
    """
    xp = _xp(cams.R)
    p_intersect, dist = optical_axis_intersection(cams)
    s = xp.max(dist) if scale is None else xp.asarray(scale, cams.T.dtype)
    # new world-to-view: X -> (X + p_intersect) @ R + T, then T /= s
    new_t = (xp.einsum("j,njk->nk", p_intersect, cams.R) + cams.T) / s
    return cams._replace(T=new_t), p_intersect, s


# ---------------------------------------------------------------------------
# Screen-space intrinsic adjustment for crops/rescale
# (reference: pytorch3d implicitron adjust_camera_to_bbox_crop_ /
#  adjust_camera_to_image_scale_, used at data_co3d.py:458-467)
# ---------------------------------------------------------------------------


def _ndc_to_px(cam: Cameras):
    """NDC intrinsics -> pixel intrinsics for the stored image_size."""
    h, w = cam.image_size[..., 0], cam.image_size[..., 1]
    s = _xp(cam.image_size).minimum(h, w) / 2.0
    fx_px = cam.focal_length[..., 0] * s
    fy_px = cam.focal_length[..., 1] * s
    # x_ndc = (w - 2 x_px)/ (2s)*2 ... with +X left: x_px = w/2 - x_ndc * s
    cx_px = w / 2.0 - cam.principal_point[..., 0] * s
    cy_px = h / 2.0 - cam.principal_point[..., 1] * s
    return fx_px, fy_px, cx_px, cy_px


def _px_to_ndc(fx_px, fy_px, cx_px, cy_px, image_size):
    xp = _xp(image_size)
    h, w = image_size[..., 0], image_size[..., 1]
    s = xp.minimum(h, w) / 2.0
    focal = xp.stack([fx_px / s, fy_px / s], -1)
    pp = xp.stack([(w / 2.0 - cx_px) / s, (h / 2.0 - cy_px) / s], -1)
    return focal, pp


def adjust_camera_to_bbox_crop(cam: Cameras, bbox_xywh) -> Cameras:
    """Re-express intrinsics for a crop bbox (x0, y0, w, h) in pixels."""
    xp = _xp(cam.image_size)
    bbox_xywh = xp.asarray(bbox_xywh, np.float32)
    fx_px, fy_px, cx_px, cy_px = _ndc_to_px(cam)
    cx_px = cx_px - bbox_xywh[..., 0]
    cy_px = cy_px - bbox_xywh[..., 1]
    new_size = xp.stack([bbox_xywh[..., 3], bbox_xywh[..., 2]], -1)  # (H, W)
    focal, pp = _px_to_ndc(fx_px, fy_px, cx_px, cy_px, new_size)
    return cam._replace(focal_length=focal, principal_point=pp, image_size=new_size)


def adjust_camera_to_image_scale(cam: Cameras, new_size_hw) -> Cameras:
    """Re-express intrinsics after resizing the image to new_size_hw."""
    xp = _xp(cam.image_size)
    new_size = xp.broadcast_to(
        xp.asarray(new_size_hw, np.float32), cam.image_size.shape
    )
    fx_px, fy_px, cx_px, cy_px = _ndc_to_px(cam)
    sx = new_size[..., 1] / cam.image_size[..., 1]
    sy = new_size[..., 0] / cam.image_size[..., 0]
    focal, pp = _px_to_ndc(fx_px * sx, fy_px * sy, cx_px * sx, cy_px * sy, new_size)
    return cam._replace(focal_length=focal, principal_point=pp, image_size=new_size)


# ---------------------------------------------------------------------------
# Camera interpolation sweeps (reference: utils_cameraray.py:317-391)
# ---------------------------------------------------------------------------


def interpolate_camera_translation(cam: Cameras, offsets: jnp.ndarray) -> Cameras:
    """Move the camera by view-space offsets, keeping orientation.

    cam: single camera (batch shape ()). offsets: (K, 3) view-space
    displacements (e.g. [[i,0,0]] for the x-axis sweep). Returns Cameras with
    batch (K,). Matches interpolate_translate_interpolate_{x,y,z}axis.
    """
    offsets = jnp.asarray(offsets, jnp.float32)
    k = offsets.shape[0]
    new_center = view_to_world(cam, offsets[None])[0]  # (K, 3) world points
    new_t = -jnp.einsum("kj,jl->kl", new_center, cam.R)  # T = -C @ R
    tile = lambda x: jnp.broadcast_to(x[None], (k,) + x.shape)
    return Cameras(
        tile(cam.R), new_t, tile(cam.focal_length), tile(cam.principal_point),
        tile(cam.image_size),
    )


def interpolate_camera_focal(cam: Cameras, scales: jnp.ndarray) -> Cameras:
    scales = jnp.asarray(scales, jnp.float32)[:, None]
    k = scales.shape[0]
    tile = lambda x: jnp.broadcast_to(x[None], (k,) + x.shape)
    return Cameras(
        tile(cam.R), tile(cam.T), cam.focal_length[None] * scales,
        tile(cam.principal_point), tile(cam.image_size),
    )
