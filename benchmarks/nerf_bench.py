#!/usr/bin/env python
"""FeatureNeRF microbenchmark: where does the render time go?

Times nerfsd_apply end-to-end at the two production block shapes of the
1024^2 sampling workload (CFG batch 2, 8 reference views):

  ds2: C=640,  res=64 (4096 rays)  -- the 3 "big" blocks
  ds4: C=1280, res=32 (1024 rays)  -- the 9 smaller blocks

and decomposes one ray-chunk of the encoding into its stages
(projection+grid_sample / geometry PE / MLP+pool) so kernel work targets
the real bottleneck. Run on the TPU; CPU works for smoke (--res 16).
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def force(t):
    import jax.numpy as jnp

    return float(jnp.sum(t.astype(jnp.float32)))


def timeit(fn, *args, iters=5):
    out = fn(*args)
    force(out if not isinstance(out, (tuple, dict)) else next(
        iter(out.values() if isinstance(out, dict) else out)))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    force(out if not isinstance(out, (tuple, dict)) else next(
        iter(out.values() if isinstance(out, dict) else out)))
    return (time.time() - t0) / iters


def make_cams(n, seed=0):
    import numpy as np
    from custom_diffusion360_tpu.geometry.cameras import Cameras

    r = np.random.default_rng(seed)
    thetas = r.uniform(0, 2 * np.pi, n)
    Rm = np.zeros((n, 3, 3), np.float32)
    for i, t in enumerate(thetas):
        c, s = np.cos(t), np.sin(t)
        Rm[i] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    T = np.tile(np.array([0, 0, 2.7], np.float32), (n, 1))
    return Cameras.create(Rm, T, focal_length=2.0, principal_point=0.0)


def bench_block(b, n, res, c, chunk, imp_next, iters, dtype="float32"):
    import jax
    import jax.numpy as jnp

    from custom_diffusion360_tpu.models.nerf import (
        NerfConfig,
        init_nerf_params,
        nerfsd_apply,
    )

    cfg = NerfConfig(dim=c, chunk_size=chunk, compute_dtype=dtype)
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    cams = make_cams(b * (1 + n)).reshape(b, 1 + n)
    xref = jax.random.normal(jax.random.PRNGKey(1), (b, n, res * res, c)) * 0.05

    @jax.jit
    def full(params, xref):
        return nerfsd_apply(
            params, cams, xref, None, cfg, None, False,
            imp_sample_next_step=imp_next,
        )["features"]

    t = timeit(full, params, xref, iters=iters)
    print(f"  nerfsd_apply b{b} n{n} res{res} C{c} imp_next={imp_next} {dtype}: "
          f"{t*1e3:.1f} ms")
    return t


def bench_stages(b, n, res, c, chunk, iters):
    """Decompose one encoding chunk into stages."""
    import jax
    import jax.numpy as jnp

    from custom_diffusion360_tpu.geometry.cameras import transform_points_ndc
    from custom_diffusion360_tpu.geometry.rays import (
        get_patch_rays,
        plucker_parameterization,
        points_to_view_space,
        positional_encoding,
        rays_to_target_space,
        rays_to_view_space,
    )
    from custom_diffusion360_tpu.models.nerf import (
        NerfConfig,
        init_nerf_params,
        nerf_encoding_apply,
    )
    from custom_diffusion360_tpu.models.nn import linear, silu
    from custom_diffusion360_tpu.ops.grid_sample import grid_sample_2d

    cfg = NerfConfig(dim=c, chunk_size=0)
    params = init_nerf_params(jax.random.PRNGKey(0), cfg)
    cams = make_cams(b * (1 + n)).reshape(b, 1 + n)
    xref = jax.random.normal(jax.random.PRNGKey(1), (b, n, res * res, c)) * 0.05
    s = cfg.num_samples
    hw = chunk
    rays, _ = get_patch_rays(cams, res)
    rays = rays[:, :, :hw]
    lengths = jnp.linspace(0.05, 2.0, s)
    pts = (rays[:, 0, :, None, :3]
           + rays[:, 0, :, None, 3:] * lengths[None, None, :, None])
    nf = cfg.num_freqs

    @jax.jit
    def stage_sample(xref, pts):
        ndc = transform_points_ndc(cams, pts.reshape(b, 1, hw * s, 3))
        grid = jnp.clip(jnp.nan_to_num(-ndc[:, 1:, :, :2]), -1.2, 1.2)
        fm = xref.reshape(b, n, res, res, c)
        return grid_sample_2d(fm, grid).reshape(b, n, hw, s, c)

    @jax.jit
    def stage_geom(pts, rays):
        pv = points_to_view_space(cams, pts)
        pe_pv = positional_encoding(pv, nf)
        rv = rays_to_view_space(cams, rays[:, 0])[:, 1:]
        civ = jnp.broadcast_to(rv[:, :, :, None, :], (b, n, hw, s, 6))
        pe_civ = positional_encoding(plucker_parameterization(civ), nf // 2)
        ct = rays_to_target_space(cams, rays[:, 1:])[..., :3]
        ct = jnp.broadcast_to(ct[:, :, :, None, :], (b, n, hw, s, 3))
        pe_ct = positional_encoding(ct, nf)
        return pe_pv, pe_civ, pe_ct

    in_dim = c + cfg.geom_feat_dim
    mlp_in = jax.random.normal(jax.random.PRNGKey(2), (b, n, hw, s, in_dim))

    @jax.jit
    def stage_mlp(params, mlp_in):
        h = linear(params["plane_coefs"]["l1"], mlp_in)
        h = silu(h)
        h = linear(params["plane_coefs"]["l2"], h)
        attn = jax.nn.softmax(linear(params["nviews"], mlp_in), axis=1)
        pooled = jnp.sum(h * attn, axis=1)
        return linear(params["decoder"], pooled)

    @jax.jit
    def stage_full(params, xref, pts, rays):
        return nerf_encoding_apply(params, cams, xref, pts, rays, None, cfg)[0]

    t_s = timeit(stage_sample, xref, pts, iters=iters)
    t_g = timeit(lambda a, r: stage_geom(a, r)[0], pts, rays, iters=iters)
    t_m = timeit(stage_mlp, params, mlp_in, iters=iters)
    t_f = timeit(stage_full, params, xref, pts, rays, iters=iters)
    print(f"  chunk={chunk} of res{res} C{c}: sample={t_s*1e3:.1f}ms "
          f"geom={t_g*1e3:.1f}ms mlp(l1+l2+attn)={t_m*1e3:.1f}ms "
          f"full-encode={t_f*1e3:.1f}ms")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--chunk", type=int, default=512)
    ap.add_argument("--res", type=int, default=0, help="override: smoke res")
    ap.add_argument("--stages", action="store_true")
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()

    if args.res:
        bench_block(2, 8, args.res, 64, args.chunk, False, args.iters, args.dtype)
        if args.stages:
            bench_stages(2, 8, args.res, 64, min(args.chunk, args.res**2),
                         args.iters)
        return

    print("== full blocks (production shapes, CFG batch 2, 8 views) ==")
    bench_block(2, 8, 64, 640, args.chunk, False, args.iters, args.dtype)   # ds2
    bench_block(2, 8, 32, 1280, args.chunk, False, args.iters, args.dtype)  # ds4
    bench_block(2, 8, 32, 1280, args.chunk, True, args.iters, args.dtype)   # ds4 + uniform
    if args.stages:
        print("== stage decomposition (one chunk) ==")
        bench_stages(2, 8, 64, 640, args.chunk, args.iters)
        bench_stages(2, 8, 32, 1280, args.chunk, args.iters)


if __name__ == "__main__":
    main()
