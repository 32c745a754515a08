"""Tensor-parallel (data x model mesh) equivalence over 8 virtual devices.

The reference is DP-only; TP is a beyond-parity capability
(parallel/tp.py): transformer projections shard Megatron-style via GSPMD
param annotations, XLA inserts the collectives.
"""
import functools
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from custom_diffusion360_tpu.diffusion import vanilla_cfg_img_ref
from custom_diffusion360_tpu.engine import Engine
from custom_diffusion360_tpu.io.delta import iter_pose_blocks
from custom_diffusion360_tpu.parallel import (
    make_mesh_2d,
    replicate,
    shard_batch,
    shard_params_tp,
    tp_param_specs,
)
from tests.test_cameras import random_cameras
from tests.test_engine import N, TINY_CFG, _train_batch


@pytest.fixture(scope="module")
def engine_and_params():
    eng = Engine(TINY_CFG)
    return eng, eng.init_params(jax.random.PRNGKey(0))


def test_tp_specs_routing(engine_and_params):
    _, params = engine_and_params
    specs = tp_param_specs(params, n_model=4)
    leaves = jax.tree_util.tree_leaves_with_path(specs)
    by_suffix = {}
    for path, s in leaves:
        names = [str(getattr(k, "key", getattr(k, "idx", "")))
                 for k in path]
        by_suffix.setdefault(tuple(names[-2:]), set()).add(s)
    assert by_suffix[("to_q", "w")] == {P(None, "model")}
    assert by_suffix[("to_out", "w")] == {P("model", None)}
    assert by_suffix[("to_out", "b")] == {P()}
    # GEGLU ff
    assert P(None, "model") in by_suffix[("proj", "w")]
    assert P("model", None) in by_suffix[("out", "w")]
    # norms/convs replicated
    assert by_suffix[("out_conv", "w")] == {P()}

    # non-divisible dims fall back to replicated
    specs63 = tp_param_specs(params, n_model=63)
    for path, s in jax.tree_util.tree_leaves_with_path(specs63):
        assert s == P()


def test_tp_training_loss_matches_replicated(engine_and_params):
    eng, params = engine_and_params
    mesh = make_mesh_2d(2, 4)
    batch = _train_batch()
    # 2 sample rows so the data axis has work
    batch = jax.tree.map(
        lambda x: (jnp.concatenate([x, x], axis=0)
                   if hasattr(x, "ndim") and x.ndim > 0 else x),
        batch,
    )
    key = jax.random.PRNGKey(1)

    loss_fn = jax.jit(
        lambda p, b: eng.training_loss(p, b, key, global_step=1)
    )
    base = loss_fn(params, batch)

    params_tp = shard_params_tp(params, mesh)
    batch_s = shard_batch(batch, mesh)
    out = loss_fn(params_tp, batch_s)

    base_l, out_l = jax.tree.leaves(base), jax.tree.leaves(out)
    for a, b_ in zip(base_l, out_l):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-3,
                                   atol=2e-4)


def test_tp_sampling_matches_and_partitions(engine_and_params):
    eng, params = engine_and_params
    mesh = make_mesh_2d(2, 4)
    b = 2

    rng = np.random.default_rng(3)
    refs = {}
    for _, _, attn_id, d in iter_pose_blocks(TINY_CFG.unet):
        refs.setdefault(attn_id, {})[d] = jnp.asarray(
            rng.normal(size=(N + 1, 16, 128)).astype(np.float32) * 0.1
        )
    cond = {
        "crossattn": jnp.ones((b, 16, 96)) * 0.1,
        "vector": jnp.ones((b, 72)) * 0.1,
    }
    guider = vanilla_cfg_img_ref(scale=5.0)
    cams = random_cameras((1 + N) * 2 * b, seed=4).reshape(2 * b, 1 + N)

    def sample(p, refs, cond, cams, key):
        return eng.sample(
            p, cond, cond, guider, key,
            shape=(b, 8, 8, 4), cams=cams, references=refs,
            choices=np.arange(N), num_steps=2,
        )

    key = jax.random.PRNGKey(5)
    base = sample(params, refs, cond, cams, key)

    jsample = jax.jit(sample)
    args = (
        shard_params_tp(params, mesh), replicate(refs, mesh),
        shard_batch(cond, mesh), shard_batch(cams, mesh), key,
    )
    out = jsample(*args)
    assert out.shape == (b, 8, 8, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=3e-4)

    txt = jsample.lower(*args).compile().as_text()
    assert re.search(r"all-reduce|all-gather|reduce-scatter", txt)
