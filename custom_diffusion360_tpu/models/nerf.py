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
import os
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
from ..ops.onehot_sample import bilinear_sample
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
    # chunk_size is tuned for this many batch rows (CFG copies x images);
    # when the incoming batch carries more rows, the effective chunk is
    # scaled down proportionally (floor 128) so the per-chunk working set —
    # (rows, N, chunk, S, C) activations in the 1280-dim pose blocks, the
    # b=4 1024^2 OOM (27.9 G vs 15.75 G HBM) — stays at the tuned level
    # regardless of batch. 0 disables the scaling.
    chunk_rows_ref: int = 2
    # dtype for the encoding's big matmuls (map projection, sampling, MLPs).
    # float32 reproduces the reference's forced-fp32 NeRF islands
    # (attention.py:626); bfloat16 is the TPU inference choice — softmax,
    # density (trunc_exp input) and the volume render stay float32 either way.
    compute_dtype: str = "float32"
    # bilinear sampler implementation: "auto" = one-hot MXU matmul on TPU,
    # gather-based XLA elsewhere (see ops/onehot_sample.py)
    sample_impl: str = "auto"

    @property
    def cdtype(self):
        return jnp.dtype(self.compute_dtype)

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

    # independent draws per branch, as the reference does (it calls fresh
    # torch randomness in each of the stratified / importance paths,
    # nerfsd_pytorch3d.py:296-298,345-353)
    k_strat, k_imp = jax.random.split(k_len)
    if prev_weights is None or cfg.imp_sampling_percent <= 0:
        lengths, dists = _stratified_lengths(cfg, b, num_rays, k_strat, training)
    else:
        imp_lengths, imp_dists = _importance_lengths(
            cfg, prev_weights, num_rays, k_imp, training
        )
        if training:
            strat_lengths, strat_dists = _stratified_lengths(
                cfg, b, num_rays, k_strat, training
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


@jax.tree_util.register_pytree_node_class
class CompactRefTokens:
    """Delta-checkpoint reference tokens held in COMPACT form: one
    zero-image/uncond plane + the chosen reference views, with the
    (batch x CFG-copies) expansion deferred into ``project_ref_maps``.

    The eager expansion (engine.build_ref_features dense mode,
    reference sample.py:86-97 layout) materializes
    (copies*B, N, hw, C) float32 buffers for EVERY pose block that stay
    live across the whole render step — ~2.5 GB at batch 1 / 1024^2 /
    8 views, which is what OOMed the b=4 render (NOTES.md). Keeping the
    compact planes as the jit inputs and expanding only the *projected*
    maps (C+1 channels, compute dtype) inside each block makes the
    expansion a per-block transient the scheduler can free.

    zero: (hw, C) — the zero-image row (buffer row -1, main.py:611-625).
    chosen: (n, hw, C) — the selected reference views.
    batch/copies: static ints; expanded row layout is
    [zero-rows x batch | chosen-rows x batch x (copies-1)].
    sharding: optional NamedSharding for the EXPANDED (B_exp, N, hw, C)
    tokens — latency-mode view-axis sharding (e.g. P('cfg', 'view')):
    project_ref_maps pins the expanded projection to it and GSPMD
    partitions the whole per-view render, reducing across views only at
    the softmax/pool all-reduce (engine.sample ref_sharding). Static aux
    data (NamedSharding is hashable), so no kwarg threading through the
    UNet layers is needed.
    """

    def __init__(self, zero, chosen, batch: int, copies: int, sharding=None,
                 shared_cams: bool = False):
        self.zero = zero
        self.chosen = chosen
        self.batch = int(batch)
        self.copies = int(copies)
        self.sharding = sharding
        # caller's declaration that every CFG copy carries the SAME target
        # camera rows (engine.sample shared_target_cams) — the licence for
        # the x3 render dedupe in transformer._reference_attn
        self.shared_cams = bool(shared_cams)

    def tree_flatten(self):
        return (self.zero, self.chosen), (
            self.batch, self.copies, self.sharding, self.shared_cams
        )

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(leaves[0], leaves[1], *aux)

    @property
    def shape(self):
        """The dense (B_expanded, N, hw, C) shape this stands in for."""
        return (
            self.batch * self.copies,
            self.chosen.shape[0],
        ) + self.chosen.shape[1:]

    def expand_rows(self, zero_rows, chosen_rows):
        """[zero_rows x batch | chosen_rows x batch x (copies-1)] along a
        new leading batch axis. zero_rows: (N, hw, ...) built from the zero
        plane; chosen_rows: (N, hw, ...)."""
        b, k = self.batch, self.copies
        z = jnp.broadcast_to(zero_rows[None], (b,) + zero_rows.shape)
        if k == 1:
            return jnp.broadcast_to(chosen_rows[None],
                                    (b,) + chosen_rows.shape)
        s = jnp.broadcast_to(
            chosen_rows[None], ((k - 1) * b,) + chosen_rows.shape
        )
        return jnp.concatenate([z, s], axis=0)


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
# Split/commuted encoding — the TPU production path.
#
# Algebraically identical to nerf_encoding_apply (which stays as the
# reference/golden path), restructured for the hardware:
#
# 1. bilinear sampling commutes with channel-wise linear maps:
#    grid_sample(X) @ W == grid_sample(X @ W). Applying the l1 / nviews
#    plane-feature weight to the (N, res^2) feature map ONCE instead of to
#    every (ray, sample) point cuts the encoding's dominant matmul by the
#    average sample multiplicity (~24x at production shapes).
# 2. the big concat inputs (mlp_in / attn_in, nerfsd_pytorch3d.py:124-155)
#    are never materialized — the l1 / nviews weights are split by input
#    segment and each segment is contracted separately;
# 3. segments that are constant along the sample axis (Plücker ray PE,
#    target-space camera origins) are contracted per-ray and broadcast over
#    S; the segment constant across views (target-space point PE in attn_in)
#    is contracted once and broadcast over N;
# 4. for the uniform-grid density pass (imp_sample_next_step) only sigma is
#    needed, and everything after the silu is linear, so
#    decoder(sum_n attn_n * l2(silu(h_n))) collapses to
#    sum_n attn_n * (silu(h_n) @ (W2 @ Wd)[:, -1:]) + b2 @ Wd[:, -1:] —
#    skipping the full C x C l2 matmul.
# ---------------------------------------------------------------------------

def _l1_row_splits(cfg: NerfConfig):
    """Row ranges of the l1 weight by input segment.

    mlp_in concat order (nerf_encoding_apply / nerfsd_pytorch3d.py:124-137):
    [plane_features (C), pe_pts_view (6nf), pts_view (3),
     pe_cam_inview (6nf), cam_inview_dir (3)].
    """
    c = cfg.dim
    pe = cfg.num_freqs * 6
    return c, c + pe + 3, c + 2 * pe + 6


def _nviews_row_splits(cfg: NerfConfig):
    """attn_in concat order (nerfsd_pytorch3d.py:139-151):
    [plane_features (C), pe_pts_target (6nf), pts_target (3),
     cam_target (3), pe_cam_target (6nf)]."""
    c = cfg.dim
    pe = cfg.num_freqs * 6
    return c, c + pe + 3, c + pe + 6 + pe


def project_ref_maps(params, xref, mask_ref, cfg: NerfConfig):
    """One-time per-block projection of the reference feature maps by the
    plane-feature rows of l1 and nviews (trick 1 above).

    xref: (B, N, HW, C) dense, or CompactRefTokens (delta-buffer inference
    path) — projected compact then batch/CFG-expanded, so the big per-row
    buffers never exist un-projected (see CompactRefTokens).
    Returns (B, N, HW, C+1) = [l1-projected | nviews-projected] (or
    (B, N, HW, C) when cfg.average — no nviews head).
    """
    cdt = cfg.cdtype
    c = cfg.dim

    def proj(x):
        g1 = x @ params["plane_coefs"]["l1"]["w"][:c].astype(cdt)
        if cfg.average:
            return g1
        gv = x @ params["nviews"]["w"][:c].astype(cdt)
        return jnp.concatenate([g1, gv], axis=-1)

    if isinstance(xref, CompactRefTokens):
        # captured buffers are stored post-mask; per-row masks don't apply
        assert mask_ref is None, "mask_ref requires dense reference tokens"
        n = xref.chosen.shape[0]
        g_chosen = proj(xref.chosen.astype(jnp.float32).astype(cdt))
        g_zero = proj(xref.zero.astype(jnp.float32).astype(cdt))
        zero_rows = jnp.broadcast_to(g_zero[None], (n,) + g_zero.shape)
        out = xref.expand_rows(zero_rows, g_chosen)
        if xref.sharding is not None:
            # latency mode: pin (batch, view) so GSPMD partitions the
            # per-view sampling/MLP work; only softmax+pool cross views
            out = jax.lax.with_sharding_constraint(out, xref.sharding)
        return out

    xref = apply_ref_mask(xref.astype(jnp.float32), mask_ref)
    return proj(xref.astype(cdt))


def ray_shared_terms(params, cams: Cameras, rays, cfg: NerfConfig):
    """Sample-axis-invariant geometry contractions, once per ray (trick 3).

    rays: (B, N+1, hw, 6) with index 0 the target camera.
    Returns (geo_ray (B, N, hw, C) — l1's Plücker-PE segment + l1 bias,
             logit_ray (B, N, hw, 1) | None — nviews' camera segment + bias).
    """
    cdt = cfg.cdtype
    nf = cfg.num_freqs
    _, s1, _ = _l1_row_splits(cfg)
    rays_view = rays_to_view_space(cams, rays[:, 0])[:, 1:]  # (B, N, hw, 6)
    ray_feat = jnp.concatenate(
        [
            positional_encoding(plucker_parameterization(rays_view), nf // 2),
            rays_view[..., 3:],
        ],
        axis=-1,
    ).astype(cdt)
    l1 = params["plane_coefs"]["l1"]
    geo_ray = ray_feat @ l1["w"][s1:].astype(cdt)
    if "b" in l1:
        geo_ray = geo_ray + l1["b"].astype(cdt)

    logit_ray = None
    if not cfg.average:
        _, v1, _ = _nviews_row_splits(cfg)
        ct = rays_to_target_space(cams, rays[:, 1:])[..., :3]  # (B, N, hw, 3)
        att_ray = jnp.concatenate(
            [ct, positional_encoding(ct, nf)], axis=-1
        ).astype(cdt)
        nv = params["nviews"]
        logit_ray = att_ray @ nv["w"][v1:].astype(cdt)
        if "b" in nv:
            logit_ray = logit_ray + nv["b"].astype(cdt)
    return geo_ray, logit_ray


def nerf_encoding_split(
    params,
    cams: Cameras,
    proj,
    geo_ray,
    logit_ray,
    ray_points,
    cfg: NerfConfig,
    sigma_only: bool = False,
):
    """Per-point features + density — split/commuted form.

    proj: (B, N, HW_full, C[+1]) from project_ref_maps; geo_ray/logit_ray
    from ray_shared_terms, sliced to this hw chunk; ray_points (B, hw, S, 3).
    Returns (out (B, hw, S, C+1[+3]), attn) like nerf_encoding_apply, or
    (sigma (B, hw, S, 1), attn) when sigma_only.
    """
    cdt = cfg.cdtype
    c = cfg.dim
    nf = cfg.num_freqs
    b, n = proj.shape[:2]
    hw, s = ray_points.shape[1], ray_points.shape[2]
    res = int(math.sqrt(proj.shape[2]))
    _, s1, _ = _l1_row_splits(cfg)

    # project target ray points into every reference camera and sample the
    # pre-projected maps (reference sign flip + clip, nerfsd_pytorch3d.py:89-95)
    ndc = transform_points_ndc(cams, ray_points.reshape(b, 1, hw * s, 3))
    grid = jnp.clip(
        jnp.nan_to_num(-jax.lax.stop_gradient(ndc[:, 1:, :, :2])), -1.2, 1.2
    )
    fm = proj.reshape((b * n, res, res) + proj.shape[3:])
    sampled = bilinear_sample(
        fm, grid.reshape(b * n, hw * s, 2), impl=cfg.sample_impl
    ).reshape(b, n, hw, s, -1)

    # Per-point view-space geometry in COORDINATE-PLANES layout: tensors
    # shaped (..., coords, P) with the flattened point axis minor. The
    # reference-shaped (..., P, 3) layout puts 3 elements on the 128-lane
    # axis — every transform/PE op then moves 42x the logical bytes
    # (profiled: the plain layout makes geometry ~1/3 of the render cost).
    p_pts = hw * s
    pts_t = jnp.swapaxes(ray_points.reshape(b, p_pts, 3), 1, 2)  # (B, 3, P)
    R, T = cams.R, cams.T  # (B, N+1, 3, 3), (B, N+1, 3)
    pv = jnp.stack(
        [
            pts_t[:, None, 0] * R[..., 0, e][..., None]
            + pts_t[:, None, 1] * R[..., 1, e][..., None]
            + pts_t[:, None, 2] * R[..., 2, e][..., None]
            + T[..., e][..., None]
            for e in range(3)
        ],
        axis=2,
    )  # (B, N+1, 3, P) — X_view = X . R + T (pytorch3d row-vector)

    # PE planes in the reference's channel order (all sines freq-major,
    # then all cosines — geometry/rays.positional_encoding)
    start = -(nf / 2.0)
    freqs = (2.0 ** (start + jnp.arange(nf, dtype=pv.dtype))) * jnp.pi
    scaled = pv[:, :, None, :, :] * freqs[None, None, :, None, None]
    sin = jnp.sin(scaled).reshape(b, n + 1, nf * 3, p_pts)
    cos = jnp.cos(scaled).reshape(b, n + 1, nf * 3, p_pts)
    pe = jnp.concatenate([sin, cos], axis=2)  # (B, N+1, 6nf, P)

    # mlp_in geometry segment [pe_pts_view | pts_view], contracted with the
    # matching l1 rows; output channels-minor to join `sampled`
    feat = jnp.concatenate([pe[:, 1:], pv[:, 1:]], axis=2).astype(cdt)
    l1w = params["plane_coefs"]["l1"]["w"]
    h_geo = jnp.einsum(
        "bnfp,fc->bnpc", feat, l1w[c:s1].astype(cdt)
    ).reshape(b, n, hw, s, c)
    # explicit cast: under CD360_ONEHOT_OUT=f32 the sampler returns the f32
    # accumulator and the convert fuses HERE instead of standing alone
    h_pre = sampled[..., :c].astype(cdt) + h_geo + geo_ray[..., None, :]
    h_act = silu(h_pre)

    attn = None
    if not cfg.average:
        _, v1, _ = _nviews_row_splits(cfg)
        vw = params["nviews"]["w"]
        # attn_in geometry segment for the target view (index 0): constant
        # across views — contract once, broadcast over N. Single output
        # column: contract to (B, P), no trailing-1 lane padding.
        tgt = jnp.concatenate([pe[:, 0], pv[:, 0]], axis=1).astype(cdt)
        logit_pts = jnp.einsum(
            "bfp,f->bp", tgt, vw[c:v1, 0].astype(cdt)
        ).reshape(b, 1, hw, s)
        logits = (
            sampled[..., c].astype(cdt) + logit_pts + logit_ray[..., :1]
        ).astype(jnp.float32)
        attn = jax.nn.softmax(logits, axis=1)  # (B, N, hw, S) f32

    attn_out = None if attn is None else attn[..., None]  # API: (...,S,1)
    if sigma_only:
        # trick 4: collapse l2 -> pool -> decoder to one C -> 1 contraction
        l2 = params["plane_coefs"]["l2"]
        wd = params["decoder"]["w"]
        w2d = (l2["w"] @ wd)[:, -1]  # sigma column, (C,)
        h_sig = jnp.einsum("bnwsc,c->bnws", h_act, w2d.astype(cdt))
        if attn is None:
            sigma = jnp.mean(h_sig.astype(jnp.float32), axis=1)
        else:
            sigma = jnp.sum(
                h_sig * attn.astype(cdt), axis=1, dtype=jnp.float32
            )
        if "b" in l2:
            sigma = sigma + (l2["b"] @ wd)[-1]
        return sigma[..., None], attn_out

    h = linear(params["plane_coefs"]["l2"], h_act)  # (B, N, hw, S, C)
    if attn is None:
        pooled = jnp.mean(h.astype(jnp.float32), axis=1)
    else:
        pooled = jnp.sum(
            h * attn[..., None].astype(cdt), axis=1, dtype=jnp.float32
        )
    out = linear(params["decoder"], pooled)  # f32 (density feeds trunc_exp)
    return jnp.concatenate([pooled, out], axis=-1), attn_out


# ---------------------------------------------------------------------------
# Full module (reference: NerfSDModule, nerfsd_pytorch3d.py:397-464)
# ---------------------------------------------------------------------------


# A/B switch: defer the chunk-scan output transpose until after the volume
# render (see nerfsd_apply docstring). Flip via env without code edits.
_CHUNKED_OUT = os.environ.get("CD360_CHUNKED_RENDER", "") == "1"


def effective_chunk(chunk: int, rows: int, chunk_rows_ref: int, hw: int) -> int:
    """Batch-scaled ray-chunk size, rounded DOWN to a power of two.

    chunk_size is tuned for ``chunk_rows_ref`` batch rows; more rows scale
    the chunk down QUADRATICALLY (floor 128). Linear scaling (keeping
    rows x chunk constant) holds the per-chunk activation working set at
    the tuned level but ignores that the render's per-row buffers (NeRF
    caches, one-hot/plane-sample temporaries) grow with the row count too:
    from the chunk-4096 base, linear gave rows=8 chunk 1024 and a 23.7 G
    compile-time OOM (round-5 bench, batch-4), while quadratic reproduces
    every measured-good config — rows=3 -> 1024 (the 897 ms deduped x3
    render), rows=8 -> 256 (the proven 13.98 G batch-4 fit, r4).

    The power-of-two rounding matters: ``hw`` is always a power of two
    here, and the old halve-until-divides loop sent any non-pow2 scaled
    chunk (e.g. rows=3 -> 682) cascading to chunk=2 — a 2048-step scan
    that made the x3 render 2.6x the x2 render instead of ~1.6x (round-5
    A/B: 2061 ms pathological vs 1269 fixed vs 791 at x2).
    """
    if not chunk:
        return 0
    if chunk_rows_ref and rows > chunk_rows_ref:
        chunk = max(128, chunk * chunk_rows_ref**2 // rows**2)
    chunk = 1 << (chunk.bit_length() - 1)  # round down to a power of two
    while hw % chunk:  # hw not pow2 (non-square crops): old fallback
        chunk //= 2
    return chunk


def _to_chunked(x, nc):
    """(B, hw, ...) -> (nc, B, hw//nc, ...). Small per-ray tensors only."""
    b, hw = x.shape[:2]
    return jnp.moveaxis(x.reshape((b, nc, hw // nc) + x.shape[2:]), 1, 0)


def from_chunked(x):
    """(nc, B, chunk, ...) -> (B, nc*chunk, ...) — undo the scan layout."""
    nc, b, chunk = x.shape[:3]
    return jnp.moveaxis(x, 0, 1).reshape((b, nc * chunk) + x.shape[3:])


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
    chunked: bool | None = None,
):
    """Ray-march + encode. Returns dict(features, sigma, dists, attn, rgb,
    sigma_uniform, dists_uniform); shapes (B, hw, S, *).

    NOTE the result dict's ``chunked`` entry is a STATIC Python int (or
    None) mixed in with array leaves — jit-safe for the single in-repo
    caller (_reference_attn reads it at trace time), but tree-mapping or
    device-transferring the dict wholesale will trip on it. ``chunked=True``
    is also best-effort: when hw <= chunk_size the scan never runs and the
    output comes back in the default (B, hw, S, *) layout with chunked=None.

    When ``chunked`` (default: env CD360_CHUNKED_RENDER=1) and the ray-chunk
    scan runs, the per-point tensors are returned in the scan's native
    (nc, B, chunk, S, *) layout and the result dict carries ``chunked=nc``.
    Assembling (B, hw, S, C) from the stacked chunk outputs is a full
    feature-volume transpose (~0.5 GB at ds2); the caller's per-point text
    attention and the volume render are ray-order-invariant, so the
    transpose can wait until after the render collapses S (24x fewer bytes).

    Uses the split/commuted encoding (see nerf_encoding_split): the
    plane-feature map projection and the per-ray geometry contractions are
    hoisted out of the ray-chunk loop and shared between the main and the
    uniform-grid (importance-chain) passes.

    (Negative result, don't re-chase: computing ray/PE/one-hot geometry
    once per *distinct* camera row and broadcasting over the guider's CFG
    copies — which carry identical cameras in every shipped caller — was
    measured SLOWER on v5e both as a channel-folded sampling matmul (~2x)
    and as broadcast-adds with per-copy sampling (+13% on the eligible
    blocks; trace in NOTES.md). The batched row-per-row form is what XLA
    schedules best here.)
    """
    if chunked is None:
        chunked = _CHUNKED_OUT
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
    proj = project_ref_maps(params, xref, mask_ref, cfg)
    geo_ray, logit_ray = ray_shared_terms(params, cams, march["rays"], cfg)

    def encode(points, sigma_only=False):
        hw = points.shape[1]
        chunk = effective_chunk(
            cfg.chunk_size, points.shape[0], cfg.chunk_rows_ref, hw
        )
        if not chunk or hw <= chunk:
            return nerf_encoding_split(
                params, cams, proj, geo_ray, logit_ray, points, cfg,
                sigma_only=sigma_only,
            ) + (None,)
        nc = hw // chunk
        b, _, s, _ = points.shape
        width = 1 if sigma_only else (
            cfg.dim + 1 + (3 if cfg.rgb_predict else 0)
        )

        # scan with dynamic slices in / stacked ys out. lax.map over
        # pre-moveaxis'd chunk stacks materialized ~100 ms of input
        # transpose copies per render (negative result); ys-stacking and
        # update-slice-into-carry measured equal (903 vs 902 ms t_first) —
        # ys kept for the simpler dataflow (no carry buffer).
        @jax.checkpoint
        def body(_, i):
            start = i * chunk
            pts = jax.lax.dynamic_slice_in_dim(points, start, chunk, 1)
            gr = jax.lax.dynamic_slice_in_dim(geo_ray, start, chunk, 2)
            lr = (
                None
                if logit_ray is None
                else jax.lax.dynamic_slice_in_dim(logit_ray, start, chunk, 2)
            )
            o = nerf_encoding_split(
                params, cams, proj, gr, lr, pts, cfg, sigma_only=sigma_only
            )[0]
            return None, o.astype(jnp.float32)

        _, ys = jax.lax.scan(body, None, jnp.arange(nc))
        if chunked:
            return ys, None, nc  # (nc, b, chunk, s, width) — scan-native
        out = jnp.moveaxis(ys, 0, 1).reshape(b, hw, s, width)
        return out, None, None

    out, attn, nc = encode(march["ray_points"])
    sigma = out[..., -1:]
    features = out[..., :-1]
    rgb = None
    if cfg.rgb_predict:
        rgb = features[..., -3:]
        features = features[..., :-3]

    dists = march["dists"][..., None]
    if nc:
        dists = _to_chunked(dists, nc)

    sigma_uniform = dists_uniform = None
    if imp_sample_next_step:
        sig_u, _, nc_u = encode(march["ray_points_uniform"], sigma_only=True)
        sigma_uniform = jax.lax.stop_gradient(sig_u)
        dists_uniform = march["dists_uniform"][..., None]
        if nc_u:
            dists_uniform = _to_chunked(dists_uniform, nc_u)

    return dict(
        features=features,
        sigma=sigma,
        dists=dists,
        attn=attn,
        rgb=rgb,
        sigma_uniform=sigma_uniform,
        dists_uniform=dists_uniform,
        chunked=nc,
    )
