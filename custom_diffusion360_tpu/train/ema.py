"""Exponential moving average of trainable params.

Reference: sgm/modules/ema.py (LitEma shadow buffers; available but
use_ema=False by default — diffusion.py:107-110). Functional: the EMA state
is a pytree of the same structure restricted to the trainable mask, updated
with the reference's decay schedule min(decay, (1+updates)/(10+updates)).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EmaState(NamedTuple):
    shadow: Any
    updates: jnp.ndarray


def ema_init(params, mask=None) -> EmaState:
    # jnp.copy, not aliasing: the train loop donates its carried state into
    # the jitted step (train.py donate_argnums), which DELETES the original
    # param buffers — an aliased shadow would then hold dead arrays and the
    # first ema_update after step 0 raises "Array has been deleted".
    if mask is not None:
        shadow = jax.tree.map(
            lambda p, m: jnp.copy(p) if m else None, params, mask
        )
    else:
        shadow = jax.tree.map(jnp.copy, params)
    return EmaState(shadow, jnp.zeros((), jnp.int32))


def ema_update(state: EmaState, params, decay: float = 0.9999) -> EmaState:
    updates = state.updates + 1
    d = jnp.minimum(decay, (1.0 + updates) / (10.0 + updates))

    def upd(s, p):
        if s is None:
            return None
        return s - (1.0 - d) * (s - p)

    shadow = jax.tree.map(upd, state.shadow, params, is_leaf=lambda x: x is None)
    return EmaState(shadow, updates)


def ema_swap(params, state: EmaState):
    """Params with EMA values substituted where tracked (ema_scope equivalent)."""
    return jax.tree.map(
        lambda p, s: p if s is None else s,
        params,
        state.shadow,
        is_leaf=lambda x: x is None,
    )
