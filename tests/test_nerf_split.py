"""The split/commuted FeatureNeRF encoding must match the reference-shaped
v1 path (nerf_encoding_apply) — same math, restructured for TPU."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_diffusion360_tpu.geometry.cameras import Cameras
from custom_diffusion360_tpu.geometry.rays import get_patch_rays
from custom_diffusion360_tpu.models.nerf import (
    NerfConfig,
    apply_ref_mask,
    init_nerf_params,
    nerf_encoding_apply,
    nerf_encoding_split,
    nerfsd_apply,
    project_ref_maps,
    ray_shared_terms,
    raymarch,
)
from custom_diffusion360_tpu.ops.grid_sample import grid_sample_2d
from custom_diffusion360_tpu.ops.onehot_sample import bilinear_sample_matmul

B, N, RES, C, S = 2, 3, 8, 32, 6


def make_cams(n, seed=0):
    r = np.random.default_rng(seed)
    thetas = r.uniform(0, 2 * np.pi, n)
    Rm = np.zeros((n, 3, 3), np.float32)
    for i, t in enumerate(thetas):
        c, s = np.cos(t), np.sin(t)
        Rm[i] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    T = np.tile(np.array([0, 0, 2.7], np.float32), (n, 1))
    return Cameras.create(Rm, T, focal_length=2.0, principal_point=0.0)


def setup(average=False, rgb=True):
    cfg = NerfConfig(
        dim=C, num_samples=S, average=average, rgb_predict=rgb, chunk_size=0
    )
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    cams = make_cams(B * (1 + N)).reshape(B, 1 + N)
    xref = jax.random.normal(jax.random.PRNGKey(1), (B, N, RES * RES, C)) * 0.3
    march = raymarch(cams, RES, cfg, None, False)
    return cfg, params, cams, xref, march


@pytest.mark.parametrize("average", [False, True])
@pytest.mark.parametrize("rgb", [True, False])
def test_split_matches_v1(average, rgb):
    cfg, params, cams, xref, march = setup(average, rgb)
    xm = apply_ref_mask(xref.astype(jnp.float32), None)
    out1, attn1 = nerf_encoding_apply(
        params, cams, xm, march["ray_points"], march["rays"], None, cfg
    )
    proj = project_ref_maps(params, xref, None, cfg)
    geo_ray, logit_ray = ray_shared_terms(params, cams, march["rays"], cfg)
    out2, attn2 = nerf_encoding_split(
        params, cams, proj, geo_ray, logit_ray, march["ray_points"], cfg
    )
    np.testing.assert_allclose(out1, out2, rtol=2e-4, atol=2e-5)
    if attn1 is not None:
        np.testing.assert_allclose(attn1, attn2, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("average", [False, True])
def test_sigma_only_collapse(average):
    cfg, params, cams, xref, march = setup(average)
    proj = project_ref_maps(params, xref, None, cfg)
    geo_ray, logit_ray = ray_shared_terms(params, cams, march["rays"], cfg)
    full, _ = nerf_encoding_split(
        params, cams, proj, geo_ray, logit_ray, march["ray_points"], cfg
    )
    sig, _ = nerf_encoding_split(
        params, cams, proj, geo_ray, logit_ray, march["ray_points"], cfg,
        sigma_only=True,
    )
    np.testing.assert_allclose(full[..., -1:], sig, rtol=2e-4, atol=2e-5)


def test_chunked_matches_unchunked():
    cfg, params, cams, xref, _ = setup()
    out_full = nerfsd_apply(params, cams, xref, None, cfg, None, False,
                            imp_sample_next_step=True)
    cfg_c = NerfConfig(dim=C, num_samples=S, chunk_size=16)
    out_chunk = nerfsd_apply(params, cams, xref, None, cfg_c, None, False,
                             imp_sample_next_step=True)
    for k in ("features", "sigma", "rgb", "sigma_uniform"):
        np.testing.assert_allclose(
            out_full[k], out_chunk[k], rtol=2e-4, atol=2e-5, err_msg=k
        )


def test_chunk_rows_scaling_matches():
    """chunk_rows_ref scales the effective ray chunk down when the batch
    carries more rows than the tuned reference (the b=4 1024^2 OOM guard);
    numerics must be invariant to the scaling."""
    b = 4  # > chunk_rows_ref=2 -> effective chunk 32 -> 16
    cfg_ref = NerfConfig(dim=C, num_samples=S, chunk_size=32,
                         chunk_rows_ref=0)
    cfg_scaled = NerfConfig(dim=C, num_samples=S, chunk_size=32,
                            chunk_rows_ref=2)
    params = init_nerf_params(jax.random.PRNGKey(0), cfg_ref)
    cams = make_cams(b * (1 + N)).reshape(b, 1 + N)
    xref = jax.random.normal(jax.random.PRNGKey(1), (b, N, RES * RES, C)) * 0.3
    out_ref = nerfsd_apply(params, cams, xref, None, cfg_ref, None, False)
    out_scaled = nerfsd_apply(params, cams, xref, None, cfg_scaled, None,
                              False)
    for k in ("features", "sigma", "rgb"):
        np.testing.assert_allclose(
            out_ref[k], out_scaled[k], rtol=2e-4, atol=2e-5, err_msg=k
        )


def test_effective_chunk_pow2_rounding():
    """Non-pow2 scaled chunks must round DOWN to a power of two instead of
    cascading through the halve-until-divides loop to chunk=2 (the x3
    guider rows=3 pathology that made its render 2.6x the x2 render)."""
    from custom_diffusion360_tpu.models.nerf import effective_chunk

    # the x3 case from the 4096 base: 4096 * 4 // 9 = 1820 -> 1024 (NOT 2)
    assert effective_chunk(4096, 3, 2, 4096) == 1024
    # quadratic row scaling: rows=8 from the 4096 base reproduces the
    # proven batch-4 fit (256); linear (1024) compile-OOMed at 23.7 G
    assert effective_chunk(4096, 8, 2, 4096) == 256
    assert effective_chunk(1024, 3, 2, 4096) == 256
    # no scaling at/below the tuned row count
    assert effective_chunk(1024, 2, 2, 4096) == 1024
    assert effective_chunk(4096, 2, 2, 4096) == 4096
    # floor 128 before rounding
    assert effective_chunk(1024, 64, 2, 4096) == 128
    # disabled chunking passes through
    assert effective_chunk(0, 3, 2, 4096) == 0
    # non-pow2 hw falls back to the divisor search
    assert effective_chunk(512, 1, 2, 768) == 256


def test_chunked_layout_matches_assembled():
    """chunked=True returns the scan-native (nc, B, chunk, S, *) layout;
    reassembling with from_chunked must reproduce the default layout."""
    from custom_diffusion360_tpu.models.nerf import from_chunked

    cfg_c = NerfConfig(dim=C, num_samples=S, chunk_size=16)
    params = init_nerf_params(jax.random.PRNGKey(0), cfg_c)
    cams = make_cams(B * (1 + N)).reshape(B, 1 + N)
    xref = jax.random.normal(jax.random.PRNGKey(1), (B, N, RES * RES, C)) * 0.3
    base = nerfsd_apply(params, cams, xref, None, cfg_c, None, False,
                        imp_sample_next_step=True, chunked=False)
    chk = nerfsd_apply(params, cams, xref, None, cfg_c, None, False,
                       imp_sample_next_step=True, chunked=True)
    nc = chk["chunked"]
    assert nc == (RES * RES) // 16
    for k in ("features", "sigma", "rgb", "sigma_uniform", "dists",
              "dists_uniform"):
        np.testing.assert_allclose(
            base[k], from_chunked(chk[k]), rtol=1e-6, atol=1e-7, err_msg=k
        )


def test_onehot_sampler_matches_gather():
    key = jax.random.PRNGKey(0)
    fm = jax.random.normal(key, (4, 8, 8, 16))
    # include out-of-range points to cover the zero-padding path
    grid = jax.random.uniform(
        jax.random.PRNGKey(1), (4, 50, 2), minval=-1.2, maxval=1.2
    )
    a = grid_sample_2d(fm, grid)
    b = bilinear_sample_matmul(fm, grid)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_mask_commutes_with_projection():
    cfg, params, cams, xref, march = setup()
    mask = (
        jax.random.uniform(jax.random.PRNGKey(2), (B, N, RES, RES)) > 0.4
    ).astype(jnp.float32)
    xm = apply_ref_mask(xref.astype(jnp.float32), mask)
    out1, _ = nerf_encoding_apply(
        params, cams, xm, march["ray_points"], march["rays"], None, cfg
    )
    proj = project_ref_maps(params, xref, mask, cfg)
    geo_ray, logit_ray = ray_shared_terms(params, cams, march["rays"], cfg)
    out2, _ = nerf_encoding_split(
        params, cams, proj, geo_ray, logit_ray, march["ray_points"], cfg
    )
    np.testing.assert_allclose(out1, out2, rtol=2e-4, atol=2e-5)


def test_bf16_path_close_to_f32():
    cfg, params, cams, xref, march = setup()
    cfg16 = NerfConfig(
        dim=C, num_samples=S, chunk_size=0, compute_dtype="bfloat16"
    )
    out32 = nerfsd_apply(params, cams, xref, None, cfg, None, False)
    out16 = nerfsd_apply(params, cams, xref, None, cfg16, None, False)
    # bf16 matmuls: loose tolerance, but must be the same function
    np.testing.assert_allclose(
        out32["features"], out16["features"], rtol=0.1, atol=0.05
    )
