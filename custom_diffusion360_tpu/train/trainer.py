"""Optimizer + train step.

Replaces the reference's requires_grad string-matching freeze
(sgm/models/diffusion.py:119-148) and configure_optimizers param groups
(diffusion.py:310-373) with pytree-level label trees:

  'train'  — pose_emb_layers / pose_featurenerf leaves + V* modifier rows
             (AdamW at lr);
  'lowlr'  — with trainkeys='poseattn': attn1/attn2 of pose blocks, or with
             'all': every other UNet leaf (AdamW at multiplier*lr,
             diffusion.py:357-361);
  'frozen' — everything else (no update, no optimizer state).

Gradients for frozen leaves are never computed: the loss closes over
stop_gradient(frozen) and JAX's unused-input cotangents are symbolic zeros.
The V* gradient masking of main.py:627-643 is structural — only
modifier_rows is trainable, the embedding tables are frozen leaves.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 1e-4
    multiplier: float = 0.05  # low-lr group factor (diffusion.py:66)
    trainkeys: str = "pose"  # pose | poseattn | all
    weight_decay: float = 0.01  # torch AdamW default
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    accumulate_grad_batches: int = 1
    max_grad_norm: Optional[float] = None
    # optional lr-multiplier schedule (train/lr_schedule.py fns); the
    # reference trains with a constant lr (scheduler_config unset)
    lr_schedule: Optional[Any] = None


# ---------------------------------------------------------------------------
# label trees
# ---------------------------------------------------------------------------


def _label_tree(node, trainkeys: str, in_pose_block: bool, label_ctx: str):
    """Recursively build a same-structure tree of labels."""
    if isinstance(node, dict):
        has_pose = "pose_emb_layers" in node
        out = {}
        for k, v in node.items():
            if k in ("pose_emb_layers", "pose_featurenerf"):
                out[k] = jax.tree.map(lambda _: "train", v)
            elif k == "modifier_rows":
                out[k] = "train"
            elif has_pose and k in ("attn1", "attn2") and trainkeys == "poseattn":
                out[k] = jax.tree.map(lambda _: "lowlr", v)
            else:
                out[k] = _label_tree(v, trainkeys, in_pose_block or has_pose, label_ctx)
        return out
    if isinstance(node, (list, tuple)):
        t = [_label_tree(v, trainkeys, in_pose_block, label_ctx) for v in node]
        return type(node)(t) if isinstance(node, tuple) else t
    return label_ctx


def label_params(params: dict, trainkeys: str = "pose"):
    """Label tree for the full {unet, vae, conditioner} params."""
    default = "lowlr" if trainkeys == "all" else "frozen"
    labels = {}
    for top, sub in params.items():
        ctx = default if top == "unet" else "frozen"
        labels[top] = _label_tree(sub, trainkeys, False, ctx)
    return labels


def trainable_mask(params: dict, trainkeys: str = "pose"):
    labels = label_params(params, trainkeys)
    return jax.tree.map(lambda l: l != "frozen", labels)


# ---------------------------------------------------------------------------
# optimizer / train state
# ---------------------------------------------------------------------------


def make_optimizer(params, cfg: TrainConfig):
    labels = label_params(params, cfg.trainkeys)

    def adamw(lr):
        if cfg.lr_schedule is not None:
            base = lr
            lr = lambda step: base * cfg.lr_schedule(step)  # noqa: E731
        tx = optax.adamw(
            lr, b1=cfg.b1, b2=cfg.b2, eps=cfg.eps, weight_decay=cfg.weight_decay
        )
        if cfg.max_grad_norm is not None:
            tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), tx)
        return tx

    tx = optax.multi_transform(
        {
            "train": adamw(cfg.lr),
            "lowlr": adamw(cfg.lr * cfg.multiplier),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
    if cfg.accumulate_grad_batches > 1:
        tx = optax.MultiSteps(tx, cfg.accumulate_grad_batches)
    return tx


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


class Trainer:
    """Pure-function train step around an Engine; jit/shard_map-composable."""

    def __init__(self, engine, cfg: TrainConfig = TrainConfig()):
        self.engine = engine
        self.cfg = cfg
        self.mask = None  # built on first init_state
        self._tx = None

    def init_state(self, params) -> TrainState:
        self.mask = trainable_mask(params, self.cfg.trainkeys)
        self._tx = make_optimizer(params, self.cfg)
        opt_state = self._tx.init(params)
        return TrainState(params, opt_state, jnp.zeros((), jnp.int32))

    def train_step(self, state: TrainState, batch, key):
        """One optimizer step. Jit this (optionally with batch sharded over a
        mesh — XLA inserts the grad all-reduce, replacing DDP)."""
        mask = self.mask
        frozen = jax.lax.stop_gradient(state.params)

        def loss_fn(trainable):
            params = jax.tree.map(
                lambda m, t, f: t if m else f, mask, trainable, frozen
            )
            loss, metrics = self.engine.training_loss(
                params, batch, key, state.step
            )
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = self._tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics, grad_norm=optax.global_norm(grads))
        return TrainState(params, opt_state, state.step + 1), metrics
