"""Multi-chip (DP) pose-conditioned sampling over the 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_diffusion360_tpu.diffusion import vanilla_cfg_img_ref
from custom_diffusion360_tpu.engine import Engine
from custom_diffusion360_tpu.io.delta import iter_pose_blocks
from custom_diffusion360_tpu.parallel import make_mesh, replicate, shard_batch
from tests.test_cameras import random_cameras
from tests.test_engine import N, TINY_CFG


def test_dp_sampling_over_mesh():
    """Sampling is batch-parallel end to end (UNet + NeRF + guider): jit with
    the latent/cams batch sharded over the data axis, params replicated.
    XLA partitions the whole scan; per-device results must match a
    single-device run of the same rows."""
    eng = Engine(TINY_CFG)
    params = eng.init_params(jax.random.PRNGKey(0))
    mesh = make_mesh()
    ndev = mesh.devices.size
    b = ndev  # one image per device

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

    def sample(params, refs, cond, cams, key):
        return eng.sample(
            params, cond, cond, guider, key,
            shape=(b, 8, 8, 4), cams=cams, references=refs,
            choices=np.arange(N), num_steps=2,
        )

    key = jax.random.PRNGKey(5)
    # single-device baseline
    base = sample(params, refs, cond, cams, key)

    # sharded: batch rows over the mesh, params/refs replicated
    params_r = replicate(params, mesh)
    refs_r = replicate(refs, mesh)
    cond_s = shard_batch(cond, mesh)
    cams_s = shard_batch(cams, mesh)
    out = jax.jit(sample)(params_r, refs_r, cond_s, cams_s, key)

    assert out.shape == (b, 8, 8, 4)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(base), atol=2e-4
    )


def test_cfg_sharded_single_image_latency_mode():
    """Latency-mode multi-chip sampling: the guider's CFG copies of ONE
    image are sharded across chips (engine.sample cfg_sharding); only the
    guider combine crosses the mesh. Must match the single-device run and
    actually partition the program (collectives present)."""
    import re

    from custom_diffusion360_tpu.parallel.mesh import batch_sharding

    eng = Engine(TINY_CFG)
    params = eng.init_params(jax.random.PRNGKey(0))
    mesh = make_mesh(2)  # CFG axis has guider.num_copies == 2 rows
    b = 1

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
    cams1 = random_cameras((1 + N) * b, seed=4).reshape(b, 1 + N)
    cams = jax.tree.map(lambda x: jnp.concatenate([x, x], axis=0), cams1)

    def sample(params, refs, cond, cams, key, sh=None):
        return eng.sample(
            params, cond, cond, guider, key,
            shape=(b, 8, 8, 4), cams=cams, references=refs,
            choices=np.arange(N), num_steps=2, cfg_sharding=sh,
        )

    key = jax.random.PRNGKey(5)
    base = sample(params, refs, cond, cams, key)

    import functools

    jsample = jax.jit(
        functools.partial(sample, sh=batch_sharding(mesh))
    )
    args = (
        replicate(params, mesh), replicate(refs, mesh),
        replicate(cond, mesh), shard_batch(cams, mesh), key,
    )
    out = jsample(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=2e-4)

    txt = jsample.lower(*args).compile().as_text()
    assert re.search(r"all-reduce|all-gather|collective-permute", txt)


def test_cfg_x_view_sharded_render_latency_mode():
    """First-step latency mode squared: CFG copies over the 'cfg' mesh axis
    AND the NeRF render over the reference-VIEW axis (engine.sample
    ref_sharding; VERDICT r3 #5). The only cross-view reduction is the
    per-point view softmax + pool (one all-reduce); results must match the
    single-device run and the program must carry collectives."""
    import functools
    import re

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    eng = Engine(TINY_CFG)
    params = eng.init_params(jax.random.PRNGKey(0))
    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("cfg", "view"))  # 2 CFG rows x N=2 reference views
    b = 1

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
    cams1 = random_cameras((1 + N) * b, seed=4).reshape(b, 1 + N)
    cams = jax.tree.map(lambda x: jnp.concatenate([x, x], axis=0), cams1)

    def sample(params, refs, cond, cams, key, cfg_sh=None, ref_sh=None):
        return eng.sample(
            params, cond, cond, guider, key,
            shape=(b, 8, 8, 4), cams=cams, references=refs,
            choices=np.arange(N), num_steps=2,
            cfg_sharding=cfg_sh, ref_sharding=ref_sh,
        )

    key = jax.random.PRNGKey(5)
    base = sample(params, refs, cond, cams, key)

    jsample = jax.jit(
        functools.partial(
            sample,
            cfg_sh=NamedSharding(mesh, P("cfg")),
            ref_sh=NamedSharding(mesh, P("cfg", "view")),
        )
    )
    args = (
        replicate(params, mesh), replicate(refs, mesh),
        replicate(cond, mesh), shard_batch(cams, mesh, axis="cfg"), key,
    )
    out = jsample(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=2e-4)

    txt = jsample.lower(*args).compile().as_text()
    assert re.search(r"all-reduce|all-gather|collective-permute", txt)


def test_view_sharded_render_dense_path():
    """ref_sharding must also hold on the dense (mask_ref) expansion path:
    build_ref_features(compact=False) pins the expanded tokens directly."""
    eng = Engine(TINY_CFG)
    mesh = make_mesh(2, axis="view")
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(3)
    buf = jnp.asarray(rng.normal(size=(N + 1, 16, 128)).astype(np.float32))
    dense = eng.build_ref_features(
        {"m1": {0: buf}}, np.arange(N), 1, 2, compact=False,
        ref_sharding=NamedSharding(mesh, P(None, "view")),
    )
    want = eng.build_ref_features({"m1": {0: buf}}, np.arange(N), 1, 2,
                                  compact=False)
    np.testing.assert_allclose(
        np.asarray(dense["m1"][0]), np.asarray(want["m1"][0])
    )


def test_cfg3_sharded_latency_mode_with_shared_cams():
    """The reference-default x3 guider under cfg_sharding with
    shared_target_cams=True — exactly what cli/sample.py --latency_shard
    passes. The x3 render dedupe and the pose-block prefix dedupe must
    gate themselves OFF under cfg_sharding (their copy-axis slices would
    cross the 'cfg' mesh axis), so the 3 CFG rows partition cleanly over
    a 3-device cfg axis and match the unsharded (deduped) run."""
    import functools

    from custom_diffusion360_tpu.diffusion.guiders import (
        scheduled_cfg_img_text_ref,
    )
    from custom_diffusion360_tpu.parallel.mesh import batch_sharding

    eng = Engine(TINY_CFG)
    params = eng.init_params(jax.random.PRNGKey(0))
    mesh = make_mesh(3)  # cfg axis = guider.num_copies == 3 rows
    b = 1

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
    guider = scheduled_cfg_img_text_ref(scale=5.0, scale_im=2.0)
    cams1 = random_cameras((1 + N) * b, seed=4).reshape(b, 1 + N)
    cams = jax.tree.map(lambda x: jnp.concatenate([x] * 3, axis=0), cams1)

    def sample(params, refs, cond, cams, key, sh=None):
        return eng.sample(
            params, cond, cond, guider, key,
            shape=(b, 8, 8, 4), cams=cams, references=refs,
            choices=np.arange(N), num_steps=2, cfg_sharding=sh,
            shared_target_cams=True,
        )

    key = jax.random.PRNGKey(5)
    base = sample(params, refs, cond, cams, key)  # deduped, unsharded

    jsample = jax.jit(functools.partial(sample, sh=batch_sharding(mesh)))
    args = (
        replicate(params, mesh), replicate(refs, mesh),
        replicate(cond, mesh), shard_batch(cams, mesh), key,
    )
    out = jsample(*args)
    assert out.shape == (b, 8, 8, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=2e-4)
