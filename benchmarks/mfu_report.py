#!/usr/bin/env python
"""MFU wall report: measured per-op-class time vs roofline for the headline
sampling workload (1024^2, CFGx2, 8 ref views) — the driver-checkable form
of the "bf16 single-chip ceiling" claim.

Runs the cached denoiser step (the 49x term of the 50-step sample), traces
it, attributes device time by op class (benchmarks/trace_attrib.py), pulls
the analytical FLOP count from XLA's cost analysis, and prints:

  * achieved aggregate TFLOPS vs the measured sustained matmul peak,
  * the per-class ms table with each class's roofline disposition,
  * the implied end-to-end img/min ceiling if every non-floor class were
    driven to zero.

One JSON line on stdout (the table in "classes"); human table on stderr.

Methodology / measured constants (see NOTES.md "Measured performance
facts" for the probes behind them):
  * sustained in-graph matmul peak on this v5e chip: ~141 TFLOPS bf16
    (big-square probe 176; production shapes overlap to ~141 aggregate).
  * flash-attention floor at d=64 heads: ~19 ms/step (kernel-bound,
    measured across block sizes; the Pallas kernel is within 10% of its
    arithmetic bound).
  * conv floor: XLA conv emitters at the UNet shapes, measured ~24 ms.

CAVEAT on t_step: this script times 10 individually-dispatched step calls,
which pays per-call host dispatch (~9 ms over the axon tunnel). The
production sampler runs the 49 steps inside ONE lax.scan with no per-step
dispatch; the canonical in-scan step cost is derived from bench.py's
end-to-end time ((t_sample - t_first - t_vae) / 49 ≈ 115.6 ms round 3).
The per-class table is device-op time from the trace and unaffected.
"""
import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUSTAINED_MATMUL_TFLOPS = 141.0


def main():
    from custom_diffusion360_tpu.utils.cache import setup_compile_cache

    setup_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=("step", "render", "vae"),
                    default="step",
                    help="which phase of the 50-step sample to account: the "
                    "cached denoiser step (default), the NeRF render+step-0, "
                    "or the VAE decode")
    ap.add_argument("--latent", type=int, default=128)
    ap.add_argument("--nerf_chunk", type=int, default=4096,
                    help="ray-chunk size (4096 = the shipped unchunked "
                    "inference default, round 5)")
    ap.add_argument("--copies", type=int, default=2, choices=(2, 3),
                    help="CFG guider copies: 2 = headline, 3 = reference "
                    "CLI default (ScheduledCFGImgTextRef)")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--nref", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--trace_steps", type=int, default=3)
    ap.add_argument("--t_first_ms", type=float, default=825.0,
                    help="render-step time (measure with step_bench "
                    "--render_only; default = round-3 measurement)")
    ap.add_argument("--t_vae_ms", type=float, default=145.0,
                    help="VAE decode time (benchmarks/vae_bench.py)")
    args = ap.parse_args()

    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarks.trace_attrib import attribute

    # --- build the cached step exactly as step_bench does -------------------
    from custom_diffusion360_tpu.diffusion import (
        Denoiser,
        DenoiserConfig,
        legacy_ddpm_sigmas,
        vanilla_cfg_img_ref,
    )
    from custom_diffusion360_tpu.diffusion.sampling import to_d
    from custom_diffusion360_tpu.geometry.cameras import Cameras
    from custom_diffusion360_tpu.io.delta import iter_pose_blocks
    from custom_diffusion360_tpu.models.transformer import (
        fuse_attention_params,
    )
    from custom_diffusion360_tpu.models.unet import (
        UNetConfig,
        attn_block_meta,
        init_unet_params,
        unet_apply,
    )
    from custom_diffusion360_tpu.utils.fastinit import fast_random_params

    b, n_ref, latent = 1, args.nref, args.latent
    dtype = jnp.bfloat16
    cfg = UNetConfig(nerf_dtype="bfloat16", nerf_chunk_size=args.nerf_chunk)
    params = fast_random_params(
        lambda k: init_unet_params(k, cfg), jax.random.PRNGKey(0), dtype
    )
    params = jax.jit(fuse_attention_params)(params)

    meta = attn_block_meta(cfg)
    caches = {}
    for _, _, attn_id, d in iter_pose_blocks(cfg):
        ds, ch, _ = meta[attn_id]
        hw = (latent // ds) ** 2
        # rendered features are per CFG-batch row (view axis collapsed by
        # the volume render) — same shape step_bench synthesizes
        caches.setdefault(attn_id, {})[d] = jnp.zeros(
            (args.copies * b, hw, ch), jnp.float32
        )

    def make_cams(n, seed):
        r = np.random.default_rng(seed)
        thetas = r.uniform(0, 2 * np.pi, n)
        Rm = np.zeros((n, 3, 3), np.float32)
        for i, t in enumerate(thetas):
            c, s = np.cos(t), np.sin(t)
            Rm[i] = np.array(
                [[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32
            )
        T = np.tile(np.array([0, 0, 2.7], np.float32), (n, 1))
        return Cameras.create(Rm, T, focal_length=2.0, principal_point=0.0)

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
    cond = {
        "crossattn": jnp.zeros((b, 77, 2048), dtype),
        "vector": jnp.zeros((b, 2816), dtype),
    }
    uc = jax.tree.map(jnp.zeros_like, cond)

    def force(t):
        return float(jnp.sum(t.astype(jnp.float32)))

    def report_phase(label, fn, operands, t_unit_calls=1):
        """Generic per-phase accounting: compile, cost-analyse, time, trace,
        and bucket device time by XLA's own hlo_category (authoritative: the
        render's dot-rooted fusions are 'convolution fusion' MXU work that
        the name-regex buckets misfile as elementwise). The 'while' umbrella
        row (the ray-chunk lax.scan) double-counts its body ops in the trace
        and is reported separately, not as a class."""
        jf = jax.jit(fn)
        lowered = jf.lower(*operands)
        compiled = lowered.compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0] if cost else {}
        flops = float((cost or {}).get("flops", 0.0))
        out0 = jf(*operands)
        jax.tree.map(
            lambda t: force(t) if hasattr(t, "astype") else t, out0
        )
        t0 = time.time()
        for _ in range(args.iters):
            out0 = jf(*operands)
        jax.tree.map(
            lambda t: force(t) if hasattr(t, "astype") else t, out0
        )
        t_phase = (time.time() - t0) / max(args.iters, 1) / t_unit_calls
        with tempfile.TemporaryDirectory(prefix="mfu_trace_") as td:
            with jax.profiler.trace(td):
                for _ in range(args.trace_steps):
                    out0 = jf(*operands)
                jax.tree.map(
                    lambda t: force(t) if hasattr(t, "astype") else t, out0
                )
            _, by_name, _, _, _, by_cat = attribute(td)
        div = args.trace_steps * t_unit_calls
        per = {k: v / div for k, v in by_cat.items() if v / div >= 0.05}
        while_ms = by_name.get("while", 0.0) / div
        if while_ms:
            per.pop("while", None)
        tflops = flops / t_phase / 1e12
        classes = [
            {"class": k, "ms": round(v, 2)}
            for k, v in sorted(per.items(), key=lambda kv: -kv[1])
        ]
        out = {
            "metric": f"{label} per-hlo-category device time",
            "t_ms": round(t_phase * 1e3, 1),
            "achieved_tflops": round(tflops, 1),
            "sustained_peak_tflops": SUSTAINED_MATMUL_TFLOPS,
            "flops": flops,
            "classes_hlo": classes,
            "while_umbrella_ms_excluded": round(while_ms, 1),
        }
        print(json.dumps(out))
        print(f"\n# {label}: t={t_phase*1e3:.1f} ms  {tflops:.1f} TFLOPS "
              f"({tflops/SUSTAINED_MATMUL_TFLOPS:.2f} of sustained peak)",
              file=sys.stderr)
        for c in classes:
            print(f"#   {c['ms']:8.2f} ms  {c['class']}", file=sys.stderr)
        if while_ms:
            print(f"#   (while umbrella {while_ms:.1f} ms excluded — "
                  f"double-counts the scan body)", file=sys.stderr)

    def cached_step(params, caches, x, sigma, next_sigma):
        def network(xs, t, c, **kw):
            return unet_apply(
                params, cfg, xs, t, c["crossattn"], c["vector"],
                cams=cams, nerf_caches=caches, compute_dtype=dtype,
            )

        s = jnp.full((b,), sigma, jnp.float32)
        xb, sb, cb = guider.prepare(x, s, cond, uc)
        denoised, _ = den(network, xb, sb, cb)
        denoised = guider.combine(denoised, s)
        d = to_d(x, s, denoised)
        return x + (next_sigma - sigma) * d

    x = jax.random.normal(jax.random.PRNGKey(1), (b, latent, latent, 4))

    if args.phase == "vae":
        from custom_diffusion360_tpu.models.vae import (
            VAEConfig,
            decode_first_stage,
            init_vae_params,
        )

        vae_cfg = VAEConfig()
        vparams = fast_random_params(
            lambda k: init_vae_params(k, vae_cfg), jax.random.PRNGKey(2),
            dtype,
        )
        report_phase(
            f"VAE decode {8 * latent}^2",
            lambda vp, z: decode_first_stage(vp, z.astype(dtype), vae_cfg),
            (vparams, x),
        )
        return

    if args.phase == "render":
        # compact reference tokens, exactly the shape
        # engine.build_ref_features(compact=True) feeds the shipped sampler
        from custom_diffusion360_tpu.models.nerf import CompactRefTokens

        rng = np.random.default_rng(0)
        refs = {}
        for _, _, attn_id, d in iter_pose_blocks(cfg):
            ds, ch, _ = meta[attn_id]
            hw = (latent // ds) ** 2
            buf = rng.normal(size=(n_ref + 1, hw, ch)).astype(np.float32)
            refs.setdefault(attn_id, {})[d] = CompactRefTokens(
                jnp.asarray(buf[-1] * 0.05), jnp.asarray(buf[:-1] * 0.05),
                b, args.copies, shared_cams=True,
            )

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

        report_phase(
            f"NeRF render + UNet step 0 ({8 * latent}^2, CFGx{args.copies})",
            render_step, (params, refs, x, sigmas[0]),
        )
        return

    step_jit = jax.jit(cached_step)
    lowered = step_jit.lower(params, caches, x, sigmas[1], sigmas[2])
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):  # older jax returns [dict]
        cost = cost[0] if cost else {}
    flops = float((cost or {}).get("flops", 0.0))

    def force(t):
        return float(jnp.sum(t.astype(jnp.float32)))

    x1 = step_jit(params, caches, x, sigmas[1], sigmas[2])
    force(x1)
    t0 = time.time()
    for _ in range(args.iters):
        x1 = step_jit(params, caches, x1, sigmas[1], sigmas[2])
    force(x1)
    t_step = (time.time() - t0) / args.iters

    with tempfile.TemporaryDirectory(prefix="mfu_trace_") as td:
        with jax.profiler.trace(td):
            for _ in range(args.trace_steps):
                x1 = step_jit(params, caches, x1, sigmas[1], sigmas[2])
            force(x1)
        buckets, *_ = attribute(td)

    per_step = {k: v / args.trace_steps for k, v in buckets.items()}
    tflops = flops / t_step / 1e12
    mfu = tflops / SUSTAINED_MATMUL_TFLOPS

    # roofline disposition per class (measured floors; NOTES.md)
    floors = {
        "fusion (elementwise)": (
            "matmul+epilogue fusions at ~141 TFLOPS sustained peak (floor)"
        ),
        "conv": "XLA conv emitters, measured floor ~24 ms at these shapes",
        "other": "flash-attention Pallas kernel ~19 ms floor + scheduling",
        "copy/transpose": "fragmented layout copies around convs (~0.2-0.4 "
                          "ms each) — the only class not at a floor",
        "convert/reduce (norm stats)": "norm statistics, f32 by design",
        "gather/slice": "negligible",
        "pallas/custom-call": "attention kernel (attributed under 'other' "
                              "when named after the jit scope)",
    }
    classes = [
        {"class": k, "ms_per_step": round(v, 2),
         "disposition": floors.get(k, "")}
        for k, v in sorted(per_step.items(), key=lambda kv: -kv[1])
    ]

    # ceiling if the copy class went to zero and nothing else changed
    t_total = args.t_first_ms / 1e3 + (args.steps - 1) * t_step \
        + args.t_vae_ms / 1e3
    copies = per_step.get("copy/transpose", 0.0) / 1e3
    t_no_copies = t_total - (args.steps - 1) * copies
    out = {
        "metric": "cached-step MFU vs measured sustained matmul peak",
        "value": round(mfu, 3),
        "unit": "fraction",
        "t_step_ms": round(t_step * 1e3, 1),
        "step_tflops": round(tflops, 1),
        "sustained_peak_tflops": SUSTAINED_MATMUL_TFLOPS,
        "flops_per_step": flops,
        "classes": classes,
        "img_per_min_now": round(60.0 / t_total, 3),
        "img_per_min_if_zero_copies": round(60.0 / t_no_copies, 3),
    }
    print(json.dumps(out))
    print(f"\n# t_step={t_step*1e3:.1f} ms  {tflops:.1f} TFLOPS  "
          f"MFU={mfu:.2f} of sustained peak", file=sys.stderr)
    for c in classes:
        print(f"#   {c['ms_per_step']:7.2f} ms  {c['class']:28s} "
              f"{c['disposition']}", file=sys.stderr)
    print(f"# end-to-end now {out['img_per_min_now']} img/min; zeroing the "
          f"copy class entirely -> {out['img_per_min_if_zero_copies']}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
