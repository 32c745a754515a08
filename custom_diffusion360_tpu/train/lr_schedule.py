"""LR schedulers.

Reference: sgm/lr_scheduler.py — LambdaWarmUpCosineScheduler(2) and
LambdaLinearScheduler, consumed as LambdaLR multipliers
(diffusion.py:363-372). Returned as optax-compatible schedule fns mapping
step -> lr multiplier (compose with a base lr via optax.scale_by_schedule
or pass lr_fn directly to adamw).
"""
from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp


def lambda_warmup_cosine(
    warm_up_steps: int,
    lr_min: float,
    lr_max: float,
    lr_start: float,
    max_decay_steps: int,
):
    """LambdaWarmUpCosineScheduler (lr_scheduler.py:6-35)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = lr_start + step / max(warm_up_steps, 1) * (lr_max - lr_start)
        t = (step - warm_up_steps) / max(max_decay_steps - warm_up_steps, 1)
        t = jnp.minimum(t, 1.0)
        cos = lr_min + 0.5 * (lr_max - lr_min) * (1 + jnp.cos(t * math.pi))
        return jnp.where(step < warm_up_steps, warm, cos)

    return schedule


def _cycle_schedule(step, cum_cycles, fn):
    step = jnp.asarray(step, jnp.float32)
    n = len(cum_cycles) - 1
    cum = jnp.asarray(cum_cycles, jnp.float32)
    cycle = jnp.clip(jnp.searchsorted(cum[1:], step, side="right"), 0, n - 1)
    return fn(step - cum[cycle], cycle)


def lambda_warmup_cosine2(
    warm_up_steps: Sequence[int],
    f_min: Sequence[float],
    f_max: Sequence[float],
    f_start: Sequence[float],
    cycle_lengths: Sequence[int],
):
    """LambdaWarmUpCosineScheduler2 (lr_scheduler.py:38-76): repeated
    warmup+cosine cycles."""
    cum = [0]
    for c in cycle_lengths:
        cum.append(cum[-1] + c)
    wu = jnp.asarray(warm_up_steps, jnp.float32)
    fmin = jnp.asarray(f_min, jnp.float32)
    fmax = jnp.asarray(f_max, jnp.float32)
    fstart = jnp.asarray(f_start, jnp.float32)
    cl = jnp.asarray(cycle_lengths, jnp.float32)

    def fn(n, cycle):
        warm = fstart[cycle] + n / jnp.maximum(wu[cycle], 1) * (
            fmax[cycle] - fstart[cycle]
        )
        t = (n - wu[cycle]) / jnp.maximum(cl[cycle] - wu[cycle], 1)
        t = jnp.minimum(t, 1.0)
        cos = fmin[cycle] + 0.5 * (fmax[cycle] - fmin[cycle]) * (
            1 + jnp.cos(t * math.pi)
        )
        return jnp.where(n < wu[cycle], warm, cos)

    return lambda step: _cycle_schedule(step, cum, fn)


def lambda_linear(
    warm_up_steps: Sequence[int],
    f_min: Sequence[float],
    f_max: Sequence[float],
    f_start: Sequence[float],
    cycle_lengths: Sequence[int],
):
    """LambdaLinearScheduler (lr_scheduler.py:79-96)."""
    cum = [0]
    for c in cycle_lengths:
        cum.append(cum[-1] + c)
    wu = jnp.asarray(warm_up_steps, jnp.float32)
    fmin = jnp.asarray(f_min, jnp.float32)
    fmax = jnp.asarray(f_max, jnp.float32)
    fstart = jnp.asarray(f_start, jnp.float32)
    cl = jnp.asarray(cycle_lengths, jnp.float32)

    def fn(n, cycle):
        warm = fstart[cycle] + n / jnp.maximum(wu[cycle], 1) * (
            fmax[cycle] - fstart[cycle]
        )
        lin = fmin[cycle] + (fmax[cycle] - fmin[cycle]) * (cl[cycle] - n) / cl[cycle]
        return jnp.where(n < wu[cycle], warm, lin)

    return lambda step: _cycle_schedule(step, cum, fn)
