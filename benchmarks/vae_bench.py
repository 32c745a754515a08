#!/usr/bin/env python
"""VAE decode micro-benchmark at the sampling workload (128^2 latent ->
1024^2 image), with optional jax.profiler trace and A/B of decode dtype.

The decode is ~120-145 ms of the 6.6 s image (NOTES.md); its convs ran at
~31 TFLOPS in the round-2 trace — this isolates them for emitter
experiments (space-to-batch tiling, dtype, fusion barriers).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from custom_diffusion360_tpu.utils.cache import setup_compile_cache

    setup_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--latent", type=int, default=128)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--profile", default=None, metavar="DIR")
    ap.add_argument("--tiles", type=int, default=0,
                    help="decode in NxN latent tiles batched together "
                    "(space-to-batch; 0 = whole image). PROBE ONLY: no "
                    "halo exchange, so tile seams differ numerically — "
                    "measures conv emitter efficiency at smaller spatial "
                    "extents, not a shippable decode")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from custom_diffusion360_tpu.models.vae import (
        VAEConfig,
        decode_first_stage,
        init_vae_params,
    )
    from custom_diffusion360_tpu.utils.fastinit import fast_random_params

    dtype = jnp.dtype(args.dtype)
    cfg = VAEConfig()
    params = fast_random_params(
        lambda k: init_vae_params(k, cfg), jax.random.PRNGKey(0), dtype
    )
    z = jax.random.normal(
        jax.random.PRNGKey(1), (args.batch, args.latent, args.latent, 4)
    ).astype(dtype)

    if args.tiles:
        t = args.tiles

        @jax.jit
        def dec(params, z):
            b, s, _, c = z.shape
            zt = z.reshape(b, t, s // t, t, s // t, c)
            zt = zt.transpose(0, 1, 3, 2, 4, 5).reshape(
                b * t * t, s // t, s // t, c
            )
            img = decode_first_stage(params, zt, cfg)
            o = img.shape[1]
            img = img.reshape(b, t, t, o, o, 3).transpose(0, 1, 3, 2, 4, 5)
            return img.reshape(b, t * o, t * o, 3)
    else:

        @jax.jit
        def dec(params, z):
            return decode_first_stage(params, z, cfg)

    def force(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    t0 = time.time()
    img = dec(params, z)
    force(img)
    print(f"# compile {time.time()-t0:.0f}s  out {img.shape}", file=sys.stderr)

    if args.profile:
        jax.profiler.start_trace(args.profile)
    times = []
    for _ in range(args.iters):
        t0 = time.time()
        force(dec(params, z))
        times.append(time.time() - t0)
    if args.profile:
        jax.profiler.stop_trace()
    print(f"t_vae={min(times)*1e3:.1f}ms (runs {[round(t*1e3) for t in times]})")


if __name__ == "__main__":
    main()
