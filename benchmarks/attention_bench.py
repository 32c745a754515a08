#!/usr/bin/env python
"""Attention micro-benchmarks (mirrors the reference's inline harness,
sgm/modules/attention.py:889-1113): per-backend latency at the UNet's shapes.

    python benchmarks/attention_bench.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bench(name, f, q, kv, iters=50):
    """Chained in-jit loop + scalar host read: on the axon tunnel,
    block_until_ready returns early for small programs and big host fetches
    run at ~35 MB/s — this is the only honest timing recipe."""

    @jax.jit
    def loop(q, kv):
        def body(i, x):
            return f(x, kv, kv).astype(q.dtype)

        out = jax.lax.fori_loop(0, iters, body, q)
        return jnp.float32(out.sum())

    try:
        float(loop(q, kv))  # compile + run once
    except Exception as e:
        print(f"{name:40s} FAILED: {type(e).__name__} {str(e)[:80]}")
        return
    t0 = time.time()
    float(loop(q, kv))
    print(f"{name:40s} {(time.time() - t0) / iters * 1e3:8.3f} ms")


def main():
    from custom_diffusion360_tpu.ops.attention import (
        _xla_attention,
        dot_product_attention,
    )

    key = jax.random.PRNGKey(0)
    # (batch, seq, heads, d_head) — SDXL UNet shapes at 1024² and 512² latents
    shapes = [
        ("self ds2 1024²", (2, 4096, 10, 64), None),
        ("self ds4 1024²", (2, 1024, 20, 64), None),
        ("self ds2 512²", (2, 1024, 10, 64), None),
        ("self ds4 512²", (2, 256, 20, 64), None),
        ("cross ds2 1024²", (2, 4096, 10, 64), 77),
        ("cross ds4 1024²", (2, 1024, 20, 64), 77),
        ("vae bottleneck 1024²", (1, 16384, 1, 512), None),
    ]
    for name, (b, n, h, d), m in shapes:
        q = jax.random.normal(key, (b, n, h, d), jnp.bfloat16) * 0.1
        kv = (
            q
            if m is None
            else jax.random.normal(jax.random.fold_in(key, 1), (b, m, h, d), jnp.bfloat16)
        )
        bench(f"{name} auto", lambda x, k, v: dot_product_attention(x, k, v), q, kv)
        bench(
            f"{name} xla-f32",
            lambda x, k, v, d=d: _xla_attention(x, k, v, d**-0.5),
            q, kv,
        )
        if h > 1 and 128 < kv.shape[1] <= 4096:
            from custom_diffusion360_tpu.ops.block_attention import (
                block_attention_bnhd,
            )

            bq = 256 if kv.shape[1] > 2048 else 512
            bench(
                f"{name} block-bnhd",
                lambda x, k, v, d=d, bq=bq: block_attention_bnhd(
                    x, k, v, d**-0.5, None, bq
                ),
                q, kv,
            )


if __name__ == "__main__":
    main()
