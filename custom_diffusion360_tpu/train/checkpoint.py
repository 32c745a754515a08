"""Full training-state checkpoints with orbax (+ resume discovery).

Reference: Lightning ModelCheckpoint every 1600 steps with save_last and
--resume re-discovering the latest last.ckpt (main.py:877-899,271-295);
delta checkpoints are the distribution format (io/delta.py handles those).
Here the full state {params, opt_state, step} is an orbax PyTree checkpoint
under <dir>/step_<N>; resume picks the highest step.
"""
from __future__ import annotations

import os
import re
from typing import Optional

import jax


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_train_state(ckpt_dir: str, state, step: Optional[int] = None) -> str:
    step = int(state.step) if step is None else step
    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step:08d}"))
    _ckptr().save(
        path,
        {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
        },
        force=True,
    )
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"step_(\d+)", name)
        if m:
            steps.append((int(m.group(1)), name))
    if not steps:
        return None
    return os.path.join(ckpt_dir, max(steps)[1])


def restore_train_state(path: str, state):
    """Restore into the structure of an existing (template) state."""
    template = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    restored = _ckptr().restore(os.path.abspath(path), item=template)
    return state._replace(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )
