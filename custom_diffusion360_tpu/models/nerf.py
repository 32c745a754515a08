"""FeatureNeRF: ray-march the target camera, sample reference-view features,
predict density/feature/RGB with small MLPs, volume-render along the ray.

TPU-native redesign of the reference's NerfSDModule / FeatureNeRFEncoding /
Raymarcher (sgm/modules/nerfsd_pytorch3d.py). Differences in *implementation*
(the math is identical):

* cameras are a ``Cameras`` pytree, rays are generated on device inside the
  jitted program (the reference builds rays on CPU per block,
  utils_cameraray.py:82-98);
* the stochastic branches (stratified jitter, the 90% importance-sampling
  coin flip, nerfsd_pytorch3d.py:345-353) take explicit PRNG keys and use
  ``jnp.where`` selection so the program has a single static shape;
* pytorch3d ``_C.sample_pdf`` is replaced by the fused ops.sample_pdf;
* ``F.grid_sample`` is replaced by ops.grid_sample_2d (channels-last).

Everything runs in float32 (the reference forces fp32 here regardless of
autocast — attention.py:626).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

from ..geometry.cameras import Cameras, transform_points_ndc
from ..geometry.rays import (
    get_patch_rays,
    plucker_parameterization,
    points_to_view_space,
    positional_encoding,
    ray_points_from_rays,
    rays_to_target_space,
    rays_to_view_space,
)
from ..ops.grid_sample import grid_sample_2d
from ..ops.sample_pdf import sample_pdf
from .nn import linear, linear_init, nearest_resize_tokens, silu


@dataclasses.dataclass(frozen=True)
class NerfConfig:
    dim: int  # transformer channel dim = in_channels = out_channels
    num_samples: int = 24
    far_plane: float = 2.0
    near_plane: float = 0.0
    num_freqs: int = 16
    rgb_predict: bool = True
    average: bool = False
    stratified: bool = True
    imp_sampling_percent: float = 0.9
    # stream the hw (ray/token) axis in chunks of this many rays through the
    # encoding: the per-view point tensors are (B, N, hw, S, C+geom) — at the
    # 1024^2 workload that is ~19 GB unchunked, beyond a v5e chip's HBM.
    # 0 disables chunking. Each chunk is rematerialized on backward.
    chunk_size: int = 512

    @property
    def total_far(self) -> float:
        # reference quirk: NerfSDModule passes far_plane=near+far into the
        # Raymarcher, which then spans [near, near + (near+far)]
        # (nerfsd_pytorch3d.py:417-423,251).
        return self.near_plane + (self.near_plane + self.far_plane)

    @property
    def geom_feat_dim(self) -> int:
        # num_freqs * 3 * 4 + 2 * 3 (nerfsd_pytorch3d.py:41)
        return self.num_freqs * 3 * 4 + 6


def init_nerf_params(key, cfg: NerfConfig):
    """Parameter pytree for one FeatureNeRF block.

    Names mirror the roles in the reference so delta-checkpoint import is a
    pure rename (nerfsd_pytorch3d.py:40-51): plane_coefs (2-layer MLP),
    nviews (per-view attention logit), decoder (zero-init, no bias).
    """
    k1, k2, k3 = jax.random.split(key, 3)
    in_dim = cfg.dim + cfg.geom_feat_dim
    p = {
        "plane_coefs": {
            "l1": linear_init(k1, in_dim, cfg.dim),
            "l2": linear_init(k2, cfg.dim, cfg.dim),
        },
        "decoder": linear_init(
            k3, cfg.dim, 1 + (3 if cfg.rgb_predict else 0), bias=False, zero=True
        ),
    }
    if not cfg.average:
        p["nviews"] = linear_init(jax.random.split(k3)[0], in_dim, 1)
    return p


# ---------------------------------------------------------------------------
# Raymarcher (reference: nerfsd_pytorch3d.py:234-394)
# ---------------------------------------------------------------------------


def _length_edges(cfg: NerfConfig):
    return jnp.linspace(
        cfg.near_plane, cfg.total_far, cfg.num_samples + 1, dtype=jnp.float32
    )


def _stratified_lengths(cfg: NerfConfig, batch, num_rays, key, training):
    """(lengths (B, hw, S), dists (B, hw, S)) — jittered bin centers."""
    edges = _length_edges(cfg)
    if cfg.stratified and training:
        center = (edges[1:] + edges[:-1]) / 2.0
        upper = jnp.concatenate([center, edges[-1:]])
        lower = jnp.concatenate([edges[:1], center])
        t = jax.random.uniform(key, (batch, num_rays, cfg.num_samples + 1))
        jittered = lower + (upper - lower) * t
        lengths = (jittered[..., :-1] + jittered[..., 1:]) / 2.0
        dists = jittered[..., 1:] - jittered[..., :-1]
        return lengths, dists
    centers = (edges[1:] + edges[:-1]) / 2.0
    dists = edges[1:] - edges[:-1]
    shape = (batch, num_rays, cfg.num_samples)
    return jnp.broadcast_to(centers, shape), jnp.broadcast_to(dists, shape)


def _uniform_lengths(cfg: NerfConfig, batch, num_rays):
    edges = _length_edges(cfg)
    centers = (edges[1:] + edges[:-1]) / 2.0
    dists = edges[1:] - edges[:-1]
    shape = (batch, num_rays, cfg.num_samples)
    return jnp.broadcast_to(centers, shape), jnp.broadcast_to(dists, shape)


def _importance_lengths(cfg: NerfConfig, prev_weights, num_rays, key, training):
    """Inverse-CDF depths from the previous block's uniform render weights.

    prev_weights: (B, hw_prev, S, 1). Reference: nerfsd_pytorch3d.py:264-306.
    """
    s = cfg.num_samples
    cdf = prev_weights[..., 0] + 0.01  # (B, hw_prev, S)
    hw_prev = cdf.shape[1]
    if hw_prev != num_rays:
        src = int(math.sqrt(hw_prev))
        dst = int(math.sqrt(num_rays))
        img = cdf.reshape(cdf.shape[0], src, src, s)
        img = jax.image.resize(
            img, (cdf.shape[0], dst, dst, s), method="bilinear", antialias=True
        )
        cdf = img.reshape(cdf.shape[0], num_rays, s)

    cdf_sum = jnp.sum(cdf, axis=-1, keepdims=True)
    padding = jax.nn.relu(1e-5 - cdf_sum)
    cdf = cdf + padding / s
    pdf = cdf / (cdf_sum + padding)

    edges = jnp.broadcast_to(_length_edges(cfg), (cdf.shape[0], num_rays, s + 1))
    u_max = 1.0 / s
    u = jnp.broadcast_to(
        jnp.arange(s, dtype=jnp.float32) * u_max, (cdf.shape[0], num_rays, s)
    )
    if cfg.stratified and training:
        u = u + jax.random.uniform(key, u.shape) * u_max

    depths = sample_pdf(edges, pdf, u)
    dists = jnp.concatenate(
        [depths[..., 1:] - depths[..., :-1], edges[..., -1:] - depths[..., -1:]],
        axis=-1,
    )
    return depths, dists


def raymarch(
    cams: Cameras,
    resolution: int,
    cfg: NerfConfig,
    key,
    training: bool,
    prev_weights=None,
    imp_sample_next_step: bool = False,
):
    """Build target rays + sample points (reference Raymarcher.forward,
    nerfsd_pytorch3d.py:332-394).

    cams: (B, N+1) — camera 0 is the target. Returns dict with
      rays (B, N+1, hw, 6), ray_points (B, hw, S, 3), dists (B, hw, S),
      ray_points_uniform / dists_uniform (or None).
    """
    if key is None:
        # eval path is deterministic (no stratified jitter / coin flips); a
        # fixed key keeps the split calls valid without consuming randomness
        key = jax.random.PRNGKey(0)
    k_rays, k_len, k_coin = jax.random.split(key, 3)
    rays, _ = get_patch_rays(
        cams, resolution, stratified=cfg.stratified and training, key=k_rays
    )
    b = rays.shape[0]
    num_rays = resolution * resolution

    if prev_weights is None or cfg.imp_sampling_percent <= 0:
        lengths, dists = _stratified_lengths(cfg, b, num_rays, k_len, training)
    else:
        imp_lengths, imp_dists = _importance_lengths(
            cfg, prev_weights, num_rays, k_len, training
        )
        if training:
            strat_lengths, strat_dists = _stratified_lengths(
                cfg, b, num_rays, k_len, training
            )
            take_strat = (
                jax.random.uniform(k_coin, ()) < (1.0 - cfg.imp_sampling_percent)
            )
            lengths = jnp.where(take_strat, strat_lengths, imp_lengths)
            dists = jnp.where(take_strat, strat_dists, imp_dists)
        else:
            lengths, dists = imp_lengths, imp_dists

    target_rays = rays[:, 0]  # (B, hw, 6)
    ray_points = ray_points_from_rays(target_rays, lengths)

    ray_points_uniform = dists_uniform = None
    if imp_sample_next_step:
        lengths_u, dists_uniform = _uniform_lengths(cfg, b, num_rays)
        ray_points_uniform = ray_points_from_rays(target_rays, lengths_u)

    return dict(
        rays=jax.lax.stop_gradient(rays),
        ray_points=jax.lax.stop_gradient(ray_points),
        dists=jax.lax.stop_gradient(dists),
        ray_points_uniform=ray_points_uniform,
        dists_uniform=dists_uniform,
    )


# ---------------------------------------------------------------------------
# FeatureNeRF encoding (reference: nerfsd_pytorch3d.py:23-161)
# ---------------------------------------------------------------------------


def apply_ref_mask(xref, mask_ref):
    """Zero padded regions of the reference feature maps
    (nerfsd_pytorch3d.py:66-77). xref: (B, N, hw, C); mask_ref: (B, N, Hm, Wm)."""
    if mask_ref is None:
        return xref
    b, n, hw, _ = xref.shape
    res = int(math.sqrt(hw))
    m = mask_ref.reshape(b, n, -1, 1).astype(xref.dtype)
    src = int(math.sqrt(m.shape[2]))
    m = nearest_resize_tokens(m, src, res)
    return xref * m


def nerf_encoding_apply(
    params, cams: Cameras, xref, ray_points, rays, mask_ref, cfg: NerfConfig
):
    """Per-point features + density logits.

    cams: (B, N+1) with camera 0 = target; xref: (B, N, hw_full, C) reference
    features (hw_full = res^2 token grid); ray_points: (B, hw, S, 3) target
    ray points (world) — hw may be a chunk of the full grid;
    rays: (B, N+1, hw, 6); mask_ref: (B, N, Hm, Wm) or None.
    Returns (out (B, hw, S, C + 1 [+3]), attn (B, N, hw, S, 1) | None).
    """
    xref = xref.astype(jnp.float32)
    b, n, hw_full, c = xref.shape
    hw = ray_points.shape[1]
    s = ray_points.shape[-2]
    res = int(math.sqrt(hw_full))
    nf = cfg.num_freqs

    xref = apply_ref_mask(xref, mask_ref)

    # project target ray points into every camera of each sample's rig
    ndc = transform_points_ndc(cams, ray_points.reshape(b, 1, hw * s, 3))
    # reference flips sign and clips (nerfsd_pytorch3d.py:89-95);
    # stop_gradient matches its .detach()
    grid = jnp.clip(
        jnp.nan_to_num(-jax.lax.stop_gradient(ndc[:, 1:, :, :2])), -1.2, 1.2
    )
    feat_maps = xref.reshape(b, n, res, res, c)
    plane_features = grid_sample_2d(feat_maps, grid).reshape(b, n, hw, s, c)

    # geometry features
    pts_view = points_to_view_space(cams, ray_points)  # (B, N+1, hw, S, 3)
    pe_pts_view = positional_encoding(pts_view, nf)  # (B, N+1, hw, S, 6nf)
    rays_view = rays_to_view_space(cams, rays[:, 0])[:, 1:]  # (B, N, hw, 6)
    cam_inview = jnp.broadcast_to(
        rays_view[:, :, :, None, :], (b, n, hw, s, 6)
    )
    pe_cam_inview = positional_encoding(
        plucker_parameterization(cam_inview), nf // 2
    )  # (B, N, hw, S, 6nf)

    mlp_in = jnp.concatenate(
        [
            plane_features,
            pe_pts_view[:, 1:],
            pts_view[:, 1:],
            pe_cam_inview,
            cam_inview[..., 3:],
        ],
        axis=-1,
    )
    h = linear(params["plane_coefs"]["l1"], mlp_in)
    h = silu(h)
    h = linear(params["plane_coefs"]["l2"], h)  # (B, N, hw, S, C)

    if not cfg.average:
        # per-view softmax attention pooling (nerfsd_pytorch3d.py:138-155)
        cam_target = rays_to_target_space(cams, rays[:, 1:])[..., :3]
        cam_target = jnp.broadcast_to(
            cam_target[:, :, :, None, :], (b, n, hw, s, 3)
        )
        pe_cam_target = positional_encoding(cam_target, nf)
        pe_pts_target = jnp.broadcast_to(
            pe_pts_view[:, :1], (b, n, hw, s, pe_pts_view.shape[-1])
        )
        pts_target = jnp.broadcast_to(pts_view[:, :1], (b, n, hw, s, 3))
        attn_in = jnp.concatenate(
            [plane_features, pe_pts_target, pts_target, cam_target, pe_cam_target],
            axis=-1,
        )
        attn = jax.nn.softmax(linear(params["nviews"], attn_in), axis=1)
        pooled = jnp.sum(h * attn, axis=1)  # (B, hw, S, C)
    else:
        pooled = jnp.mean(h, axis=1)
        attn = None

    out = linear(params["decoder"], pooled)
    return jnp.concatenate([pooled, out], axis=-1), attn


# ---------------------------------------------------------------------------
# Full module (reference: NerfSDModule, nerfsd_pytorch3d.py:397-464)
# ---------------------------------------------------------------------------


def nerfsd_apply(
    params,
    cams: Cameras,
    xref,
    mask_ref,
    cfg: NerfConfig,
    key,
    training: bool,
    prev_weights=None,
    imp_sample_next_step: bool = False,
):
    """Ray-march + encode. Returns dict(features, sigma, dists, attn, rgb,
    sigma_uniform, dists_uniform); shapes (B, hw, S, *)."""
    resolution = int(math.sqrt(xref.shape[2]))
    march = raymarch(
        cams,
        resolution,
        cfg,
        key,
        training,
        prev_weights=prev_weights,
        imp_sample_next_step=imp_sample_next_step,
    )
    xref = apply_ref_mask(xref.astype(jnp.float32), mask_ref)

    def encode(points):
        hw = points.shape[1]
        chunk = cfg.chunk_size
        if not chunk or hw <= chunk:
            return nerf_encoding_apply(
                params, cams, xref, points, march["rays"], None, cfg
            )
        while hw % chunk:
            chunk //= 2
        nc = hw // chunk
        b = points.shape[0]
        s = points.shape[2]
        n1 = march["rays"].shape[1]
        pts = jnp.moveaxis(points.reshape(b, nc, chunk, s, 3), 1, 0)
        rys = jnp.moveaxis(
            march["rays"].reshape(b, n1, nc, chunk, 6), 2, 0
        )

        @jax.checkpoint
        def one(args):
            p, r = args
            return nerf_encoding_apply(params, cams, xref, p, r, None, cfg)[0]

        out = jax.lax.map(one, (pts, rys))
        out = jnp.moveaxis(out, 0, 1).reshape(b, hw, s, -1)
        return out, None

    out, attn = encode(march["ray_points"])
    sigma = out[..., -1:]
    features = out[..., :-1]
    rgb = None
    if cfg.rgb_predict:
        rgb = features[..., -3:]
        features = features[..., :-3]

    sigma_uniform = dists_uniform = None
    if imp_sample_next_step:
        out_u, _ = encode(march["ray_points_uniform"])
        sigma_uniform = jax.lax.stop_gradient(out_u[..., -1:])
        dists_uniform = march["dists_uniform"][..., None]

    return dict(
        features=features,
        sigma=sigma,
        dists=march["dists"][..., None],
        attn=attn,
        rgb=rgb,
        sigma_uniform=sigma_uniform,
        dists_uniform=dists_uniform,
    )
