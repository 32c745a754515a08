"""Fast synthetic parameter trees for benchmarks / smoke runs.

Real checkpoints are loaded from safetensors; proper random init
(init_unet_params etc.) is exact but builds thousands of threefry ops — on
this environment that is minutes of XLA compile (and CPU init + host->device
shipping of SDXL-sized trees runs at tunnel speed, ~30 MB/s). Benchmarks
only need tensors with representative shapes/magnitudes, so:

1. jax.eval_shape the real initializer — structure without compute;
2. fill leaves from a handful of big flat normal draws (one RNG op per
   ~512 MB bucket, sliced and reshaped), entirely on device.

Compiles in seconds; peak memory = params + one bucket.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_BUCKET_ELEMS = 256 * 1024 * 1024  # 512 MB of bf16 per RNG draw


def fast_random_params(init_fn, key, dtype=jnp.bfloat16, scale=0.02):
    """Device-resident random pytree with the same structure/shapes as
    ``init_fn(key)``. Values are N(0, scale^2) in ``dtype`` — placeholders
    for throughput measurement, NOT a faithful init."""
    shapes = jax.eval_shape(init_fn, key)
    leaves, treedef = jax.tree.flatten(shapes)

    buckets, cur, cur_n = [], [], 0
    for i, l in enumerate(leaves):
        n = math.prod(l.shape) if l.shape else 1
        cur.append((i, l.shape, n))
        cur_n += n
        if cur_n >= _BUCKET_ELEMS:
            buckets.append((cur, cur_n))
            cur, cur_n = [], 0
    if cur:
        buckets.append((cur, cur_n))

    @jax.jit
    def make(key):
        out = [None] * len(leaves)
        for bi, (items, total) in enumerate(buckets):
            flat = (
                jax.random.normal(
                    jax.random.fold_in(key, bi), (total,), jnp.float32
                ).astype(dtype)
                * scale
            )
            off = 0
            for i, shape, n in items:
                out[i] = flat[off : off + n].reshape(shape)
                off += n
        return out

    return jax.tree.unflatten(treedef, make(key))
