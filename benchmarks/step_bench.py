#!/usr/bin/env python
"""Diagnostic stitched benchmark: times the render step / cached step / VAE
decode separately at production shapes (the round-1 bench.py, kept for
per-phase attribution; the headline bench.py times Engine.sample end-to-end).

Workload = the reference's sample.py headline path (BASELINE.md): 50-step
Euler-EDM, CFG x2 (VanillaCFGImgRef), 8 reference views from precomputed
FeatureNeRF buffers, NeRF rendered at step 1 then cached, plus the VAE
decode. Default 1024^2 output (128^2 latent; the reference samples at 512^2
— the north-star workload is 1024^2).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the driver-supplied north-star of
2x A100 images/min (BASELINE.json): we take 5 images/min as the A100
estimate for this pipeline (no number is published by the reference;
README "Evaluation: to be released"), so baseline = 10 images/min.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

A100_X2_IMAGES_PER_MIN = 10.0


def _enable_compile_cache():
    """Persistent compile cache: first bench run on a machine pays the big
    XLA compile; later runs (and driver re-runs) restore in seconds."""
    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


def main():
    _enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--latent", type=int, default=128, help="latent side (128 = 1024^2 image)")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--nref", type=int, default=8)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--copies", type=int, default=2, choices=(2, 3),
                    help="CFG guider copies: 2 = VanillaCFGImgRef headline, "
                    "3 = ScheduledCFGImgTextRef (reference CLI default)")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--nerf_chunk", type=int, default=1024,
                    help="FeatureNeRF ray-chunk size (memory/speed knob; "
                    "matches the bench.py / cli.sample inference default)")
    ap.add_argument("--iters", type=int, default=10, help="timed step iterations")
    ap.add_argument("--skip-vae", action="store_true")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="write a jax.profiler trace of the cached-step loop "
                    "(parse with benchmarks/trace_attrib.py)")
    ap.add_argument("--dump_hlo", default=None, metavar="FILE",
                    help="write the compiled cached-step HLO text to FILE")
    ap.add_argument("--dump_hlo_render", default=None, metavar="FILE",
                    help="write the compiled render-step HLO text to FILE "
                    "(--render_iters 0 to dump without timing)")
    ap.add_argument("--profile_render", default=None, metavar="DIR",
                    help="write a jax.profiler trace of the render step")
    ap.add_argument("--profile_vae", default=None, metavar="DIR",
                    help="write a jax.profiler trace of the VAE decode")
    ap.add_argument("--render_only", action="store_true",
                    help="time only the render (first) step and exit")
    ap.add_argument("--render_iters", type=int, default=1,
                    help="timed render-step iterations (A/B averaging)")
    ap.add_argument("--dense_refs", action="store_true",
                    help="eager per-CFG-copy reference buffers (the "
                    "pre-CompactRefTokens layout) instead of the shipped "
                    "compact form")
    ap.add_argument("--cached_only", action="store_true",
                    help="time only the cached step (synthetic caches; "
                    "skips the render-step compile for fast A/B experiments)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from custom_diffusion360_tpu.diffusion import (
        Denoiser,
        DenoiserConfig,
        legacy_ddpm_sigmas,
        vanilla_cfg_img_ref,
    )
    from custom_diffusion360_tpu.diffusion.sampling import to_d
    from custom_diffusion360_tpu.io.delta import iter_pose_blocks
    from custom_diffusion360_tpu.models.unet import (
        UNetConfig,
        attn_block_meta,
        init_unet_params,
        unet_apply,
    )
    from custom_diffusion360_tpu.models.vae import (
        VAEConfig,
        decode_first_stage,
        init_vae_params,
    )
    from custom_diffusion360_tpu.geometry.cameras import Cameras

    dtype = jnp.dtype(args.dtype)
    b, n_ref, latent = args.batch, args.nref, args.latent
    cfg = UNetConfig(nerf_dtype=args.dtype, nerf_chunk_size=args.nerf_chunk)
    key = jax.random.PRNGKey(0)

    from custom_diffusion360_tpu.utils.fastinit import fast_random_params
    params = fast_random_params(lambda k: init_unet_params(k, cfg), key, dtype)
    from custom_diffusion360_tpu.models.transformer import fuse_attention_params
    params = jax.jit(fuse_attention_params)(params)

    meta = attn_block_meta(cfg)
    rng = np.random.default_rng(0)
    refs = {}
    from custom_diffusion360_tpu.models.nerf import CompactRefTokens

    for _, _, attn_id, d in iter_pose_blocks(cfg):
        ds, ch, _ = meta[attn_id]
        hw = (latent // ds) ** 2
        if getattr(args, "dense_refs", False):
            # the pre-CompactRefTokens layout: eager per-CFG-copy buffers
            refs.setdefault(attn_id, {})[d] = jnp.asarray(
                rng.normal(
                    size=(args.copies * b, n_ref, hw, ch)
                ).astype(np.float32) * 0.05
            )
        else:
            # the shipped engine.build_ref_features(compact=True) form
            buf = rng.normal(size=(n_ref + 1, hw, ch)).astype(np.float32)
            refs.setdefault(attn_id, {})[d] = CompactRefTokens(
                jnp.asarray(buf[-1] * 0.05),
                jnp.asarray(buf[:-1] * 0.05),
                b, args.copies, shared_cams=True,
            )

    def make_cams(n, seed):
        r = np.random.default_rng(seed)
        thetas = r.uniform(0, 2 * np.pi, n)
        Rm = np.zeros((n, 3, 3), np.float32)
        for i, t in enumerate(thetas):
            c, s = np.cos(t), np.sin(t)
            Rm[i] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        T = np.tile(np.array([0, 0, 2.7], np.float32), (n, 1))
        return Cameras.create(Rm, T, focal_length=2.0, principal_point=0.0)

    # CFG-replicated cameras, as every shipped caller builds them
    # (engine/cli replicate the target pose per guider copy)
    cams_one = make_cams((1 + n_ref) * b, 1).reshape(b, 1 + n_ref)
    cams = jax.tree.map(
        lambda x: jnp.concatenate([x] * args.copies, axis=0), cams_one
    )

    if args.copies == 3:
        from custom_diffusion360_tpu.diffusion.guiders import (
            scheduled_cfg_img_text_ref,
        )

        guider = scheduled_cfg_img_text_ref(scale=7.5, scale_im=3.5)
    else:
        guider = vanilla_cfg_img_ref(scale=7.5)
    den = Denoiser(DenoiserConfig())
    sigmas = legacy_ddpm_sigmas(args.steps)
    ctx = jnp.zeros((b, 77, 2048), dtype)
    y = jnp.zeros((b, 2816), dtype)
    cond = {"crossattn": ctx, "vector": y}
    uc = {"crossattn": jnp.zeros_like(ctx), "vector": jnp.zeros_like(y)}

    # params/refs/caches are explicit jit args — closing over them bakes GBs
    # of constants into the lowering and multiplies compile time
    def render_step(params, refs, x, sigma):
        def network(xs, t, c, **kw):
            return unet_apply(
                params, cfg, xs, t, c["crossattn"], c["vector"],
                cams=cams, ref_features=refs, compute_dtype=dtype,
            )

        s = jnp.full((b,), sigma, jnp.float32)
        xb, sb, cb = guider.prepare(x, s, cond, uc)
        denoised, aux = den(network, xb, sb, cb)
        return guider.combine(denoised, s), aux["rendered"]

    # mirror engine.make_denoise: cached steps dedupe the guider-declared
    # duplicate-copy prefix (x3 rows 0/1); CD360_PREFIX_DEDUPE=0 for the A/B
    prefix_dedupe = None
    if os.environ.get("CD360_PREFIX_DEDUPE", "1") != "0":
        prefix_dedupe = getattr(guider, "prefix_copy_groups", None)

    def cached_step(params, caches, x, sigma, next_sigma):
        def network(xs, t, c, **kw):
            return unet_apply(
                params, cfg, xs, t, c["crossattn"], c["vector"],
                cams=cams, nerf_caches=caches, compute_dtype=dtype,
                prefix_dedupe=prefix_dedupe,
            )

        s = jnp.full((b,), sigma, jnp.float32)
        xb, sb, cb = guider.prepare(x, s, cond, uc)
        denoised, _ = den(network, xb, sb, cb)
        denoised = guider.combine(denoised, s)
        d = to_d(x, s, denoised)
        return x + (next_sigma - sigma) * d

    x = jax.random.normal(jax.random.PRNGKey(1), (b, latent, latent, 4)) * float(
        jnp.sqrt(1 + sigmas[0] ** 2)
    )

    def force(t):
        # block_until_ready can return early over the device tunnel; a scalar
        # host read is the only reliable fence
        return float(jnp.sum(t.astype(jnp.float32)))

    if args.cached_only or (args.dump_hlo and args.iters == 0):
        # skip the render-step compile: synthesize caches (same shape/dtype
        # as rendered feats). --cached_only times just the cached step.
        caches = {
            aid: {d: jnp.zeros((args.copies * b,) + r.shape[2:], jnp.float32)
                  for d, r in blocks.items()}
            for aid, blocks in refs.items()
        }
        step_jit = jax.jit(cached_step)
        if args.dump_hlo:
            txt = step_jit.lower(params, caches, x, sigmas[1], sigmas[2]).compile().as_text()
            with open(args.dump_hlo, "w") as f:
                f.write(txt)
            print(f"# wrote {args.dump_hlo} ({len(txt)} bytes)", file=sys.stderr)
            if args.iters == 0:
                return
        t0 = time.time()
        x1 = step_jit(params, caches, x, sigmas[1], sigmas[2])
        force(x1)
        compile_step = time.time() - t0
        t0 = time.time()
        for i in range(args.iters):
            x1 = step_jit(params, caches, x1, sigmas[1], sigmas[2])
        force(x1)
        t_step = (time.time() - t0) / max(args.iters, 1)
        if args.profile:
            with jax.profiler.trace(args.profile):
                for i in range(3):
                    x1 = step_jit(params, caches, x1, sigmas[1], sigmas[2])
                force(x1)
        print(f"# t_step={t_step*1e3:.1f}ms compile_step={compile_step:.0f}s",
              file=sys.stderr)
        return

    # first (render) step
    render_jit = jax.jit(render_step)
    if args.dump_hlo_render:
        txt = render_jit.lower(params, refs, x, sigmas[0]).compile().as_text()
        with open(args.dump_hlo_render, "w") as f:
            f.write(txt)
        print(f"# wrote {args.dump_hlo_render} ({len(txt)} bytes)",
              file=sys.stderr)
        if args.render_iters == 0:
            return
    t0 = time.time()
    denoised, caches = render_jit(params, refs, x, sigmas[0])
    force(denoised)
    compile_first = time.time() - t0
    r_iters = max(1, args.render_iters)
    t0 = time.time()
    for _ in range(r_iters):
        denoised, caches = render_jit(params, refs, x, sigmas[0])
    force(denoised)
    t_first = (time.time() - t0) / r_iters
    if args.profile_render:
        with jax.profiler.trace(args.profile_render):
            for _ in range(2):
                denoised, caches = render_jit(params, refs, x, sigmas[0])
            force(denoised)
    if args.render_only:
        print(f"# t_first={t_first*1e3:.0f}ms compile_first={compile_first:.0f}s",
              file=sys.stderr)
        return
    d = to_d(x, jnp.full((b,), sigmas[0]), denoised)
    x = x + (sigmas[1] - sigmas[0]) * d

    step_jit = jax.jit(cached_step)
    if args.dump_hlo:
        txt = step_jit.lower(params, caches, x, sigmas[1], sigmas[2]).compile().as_text()
        with open(args.dump_hlo, "w") as f:
            f.write(txt)
        print(f"# wrote {args.dump_hlo} ({len(txt)} bytes)", file=sys.stderr)
    t0 = time.time()
    x1 = step_jit(params, caches, x, sigmas[1], sigmas[2])
    force(x1)
    compile_step = time.time() - t0
    t0 = time.time()
    for i in range(args.iters):
        x1 = step_jit(params, caches, x1, sigmas[1], sigmas[2])
    force(x1)
    t_step = (time.time() - t0) / args.iters

    if args.profile:
        with jax.profiler.trace(args.profile):
            for i in range(3):
                x1 = step_jit(params, caches, x1, sigmas[1], sigmas[2])
            force(x1)

    t_vae = 0.0
    if not args.skip_vae:
        vae_cfg = VAEConfig()
        from custom_diffusion360_tpu.utils.fastinit import fast_random_params as frp
        vparams = frp(lambda k: init_vae_params(k, vae_cfg), jax.random.PRNGKey(2), dtype)
        dec = jax.jit(
            lambda vp, z: decode_first_stage(vp, z.astype(dtype), vae_cfg)
        )
        force(dec(vparams, x1))  # compile
        t0 = time.time()
        force(dec(vparams, x1))
        t_vae = time.time() - t0
        if args.profile_vae:
            with jax.profiler.trace(args.profile_vae):
                for _ in range(3):
                    y = dec(vparams, x1)
                force(y)

    total = t_first + (args.steps - 1) * t_step + t_vae
    images_per_min = 60.0 * b / total
    result = {
        "metric": f"images/min 1-chip SDXL {8*latent}^2 {args.steps}-step pose-conditioned sampling (CFGx2, {n_ref} ref views, NeRF render-once)",
        "value": round(images_per_min, 3),
        "unit": "images/min",
        "vs_baseline": round(images_per_min / A100_X2_IMAGES_PER_MIN, 3),
    }
    print(json.dumps(result))
    print(
        f"# t_first={t_first*1e3:.0f}ms t_step={t_step*1e3:.1f}ms t_vae={t_vae*1e3:.0f}ms "
        f"compile_first={compile_first:.0f}s compile_step={compile_step:.0f}s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
