"""Trainer tests: masking, optimizer groups, train step, DP mesh, capture."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_diffusion360_tpu.engine import Engine
from custom_diffusion360_tpu.io.delta import _get_block, iter_pose_blocks
from custom_diffusion360_tpu.parallel import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
from custom_diffusion360_tpu.train import (
    TrainConfig,
    Trainer,
    capture_references,
    label_params,
    trainable_mask,
)
from tests.test_cameras import random_cameras
from tests.test_engine import B, N, RES, TINY_CFG, _toks, _train_batch


@pytest.fixture(scope="module")
def engine_and_params():
    eng = Engine(TINY_CFG)
    params = eng.init_params(jax.random.PRNGKey(0))
    return eng, params


class TestMasking:
    def test_pose_mask(self, engine_and_params):
        _, params = engine_and_params
        mask = trainable_mask(params, "pose")
        # pose leaves trainable
        _, path, attn_id, d = next(iter(iter_pose_blocks(TINY_CFG.unet)))
        blk_mask = _get_block(mask["unet"], path, d)
        assert jax.tree.all(jax.tree.map(bool, blk_mask["pose_emb_layers"]))
        assert jax.tree.all(jax.tree.map(bool, blk_mask["pose_featurenerf"]))
        # attn / vae / embedding tables frozen
        assert not blk_mask["attn1"]["to_q"]["w"]
        assert not jax.tree.all(jax.tree.map(bool, mask["vae"]))
        assert not mask["conditioner"]["clip_l"]["token_embedding"]
        # V* rows trainable
        assert mask["conditioner"]["clip_l"]["modifier_rows"]
        assert mask["conditioner"]["open_clip"]["modifier_rows"]

    def test_poseattn_labels(self, engine_and_params):
        _, params = engine_and_params
        labels = label_params(params, "poseattn")
        _, path, attn_id, d = next(iter(iter_pose_blocks(TINY_CFG.unet)))
        blk = _get_block(labels["unet"], path, d)
        assert blk["attn1"]["to_q"]["w"] == "lowlr"
        assert blk["pose_emb_layers"]["w"] == "train"
        assert blk["ff"]["proj"]["w"] == "frozen"

    def test_all_labels(self, engine_and_params):
        _, params = engine_and_params
        labels = label_params(params, "all")
        assert labels["unet"]["out_conv"]["w"] == "lowlr"
        assert labels["vae"]["quant_conv"]["w"] == "frozen"

    def test_trainable_fraction_tiny(self, engine_and_params):
        _, params = engine_and_params
        mask = trainable_mask(params, "pose")
        leaves = jax.tree.leaves(
            jax.tree.map(lambda p, m: p.size * m, params, mask)
        )
        total = sum(int(x.size) for x in jax.tree.leaves(params))
        trainable = sum(int(x) for x in leaves)
        assert 0 < trainable < 0.2 * total


class TestTrainStep:
    def test_step_updates_only_trainable(self, engine_and_params):
        eng, params = engine_and_params
        trainer = Trainer(eng, TrainConfig(lr=1e-3))
        state = trainer.init_state(params)
        batch = _train_batch()
        state2, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss_total"]))
        assert int(state2.step) == 1

        mask = trainer.mask
        changed = jax.tree.map(
            lambda a, b: bool(jnp.any(a != b)), state.params, state2.params
        )
        # frozen leaves unchanged
        frozen_changed = jax.tree.leaves(
            jax.tree.map(lambda c, m: c and not m, changed, mask)
        )
        assert not any(frozen_changed)
        # at least the pose fusion weights changed
        _, path, attn_id, d = next(iter(iter_pose_blocks(TINY_CFG.unet)))
        blk_changed = _get_block(changed["unet"], path, d)
        assert blk_changed["pose_featurenerf"]["plane_coefs"]["l1"]["w"]

    def test_jit_step(self, engine_and_params):
        eng, params = engine_and_params
        trainer = Trainer(eng, TrainConfig())
        state = trainer.init_state(params)
        step = jax.jit(trainer.train_step)
        state, m = step(state, _train_batch(), jax.random.PRNGKey(2))
        state, m = step(state, _train_batch(), jax.random.PRNGKey(3))
        assert int(state.step) == 2
        assert np.isfinite(float(m["loss_total"]))


class TestDataParallel:
    def test_dp_step_on_8_device_mesh(self, engine_and_params):
        """The jitted train step with a batch sharded over the 8-device CPU
        mesh — XLA inserts the gradient all-reduce (replaces DDP/NCCL)."""
        eng, params = engine_and_params
        mesh = make_mesh()
        assert mesh.devices.size == 8

        trainer = Trainer(eng, TrainConfig())
        state = trainer.init_state(params)
        state = state._replace(
            params=replicate(state.params, mesh),
            opt_state=jax.tree.map(
                lambda x: replicate(x, mesh) if hasattr(x, "shape") else x,
                state.opt_state,
            ),
        )

        # global batch of 8, one item per device
        batch = _train_batch()
        batch8 = jax.tree.map(
            lambda x: (jnp.concatenate([x] * 8, axis=0)
                       if hasattr(x, "ndim") and x.ndim > 0 else x),
            batch,
        )
        batch8 = shard_batch(batch8, mesh)
        step = jax.jit(trainer.train_step)
        state2, metrics = step(state, batch8, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss_total"]))
        # params remain replicated after the update
        leaf = state2.params["conditioner"]["clip_l"]["modifier_rows"]
        assert leaf.sharding.is_fully_replicated


class TestCapture:
    def test_capture_shapes(self, engine_and_params):
        eng, params = engine_and_params
        n_items = 3
        imgs = jnp.zeros((n_items, RES, RES, 3))
        cams = random_cameras(n_items + 2, seed=7).reshape(1, n_items + 2)
        cond = {
            "crossattn": jnp.ones((1 + n_items + 1, 16, 96)) * 0.1,
            "vector": jnp.ones((1 + n_items + 1, 72)) * 0.1,
        }
        refs = capture_references(
            eng, params, imgs, cams, cond, jax.random.PRNGKey(0)
        )
        assert 0 in refs and 0 in refs[0]
        buf = refs[0][0]
        assert buf.shape[0] == n_items + 1  # +1 zero-image uncond row
        assert buf.shape[1] == 16  # 4x4 tokens at ds=2 for 8^2 latent
        # last row comes from the zero image; finite everywhere
        assert np.isfinite(np.asarray(buf)).all()

    def test_capture_roundtrip_into_sampling(self, engine_and_params):
        """Captured buffers must slot directly into Engine.sample."""
        from custom_diffusion360_tpu.diffusion import vanilla_cfg_img_ref

        eng, params = engine_and_params
        n_items = 3
        imgs = jnp.zeros((n_items, RES, RES, 3))
        cams_cap = random_cameras(n_items + 2, seed=7).reshape(1, n_items + 2)
        cond_cap = {
            "crossattn": jnp.ones((n_items + 2, 16, 96)) * 0.1,
            "vector": jnp.ones((n_items + 2, 72)) * 0.1,
        }
        refs = capture_references(
            eng, params, imgs, cams_cap, cond_cap, jax.random.PRNGKey(0)
        )
        n_use = 2
        cond = {
            "crossattn": jnp.ones((B, 16, 96)) * 0.1,
            "vector": jnp.ones((B, 72)) * 0.1,
        }
        cams = random_cameras((1 + n_use) * 2 * B, seed=8).reshape(2 * B, 1 + n_use)
        out = eng.sample(
            params, cond, cond, vanilla_cfg_img_ref(scale=5.0),
            jax.random.PRNGKey(9), shape=(B, 8, 8, 4), cams=cams,
            references=refs, choices=np.arange(n_use), num_steps=2,
        )
        assert np.isfinite(np.asarray(out)).all()

    def test_capture_view_sharded_matches(self, engine_and_params):
        """Multi-chip capture: views sharded over the mesh produce the same
        buffers as the unsharded pass (reference splits capture items
        across DDP ranks + all_gather, main.py:588-603)."""
        from custom_diffusion360_tpu.parallel import make_mesh, replicate
        from custom_diffusion360_tpu.parallel.mesh import batch_sharding

        eng, params = engine_and_params
        n_items = 7  # +1 zero row = 8 views over 8 devices
        rng = np.random.default_rng(11)
        imgs = jnp.asarray(
            rng.uniform(-1, 1, (n_items, RES, RES, 3)).astype(np.float32)
        )
        cams = random_cameras(n_items + 2, seed=7).reshape(1, n_items + 2)
        cond = {
            "crossattn": jnp.ones((1 + n_items + 1, 16, 96)) * 0.1,
            "vector": jnp.ones((1 + n_items + 1, 72)) * 0.1,
        }
        base = capture_references(
            eng, params, imgs, cams, cond, jax.random.PRNGKey(0)
        )
        mesh = make_mesh()
        refs = capture_references(
            eng, replicate(params, mesh), imgs, cams, cond,
            jax.random.PRNGKey(0), view_sharding=batch_sharding(mesh),
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4
            ),
            base, refs,
        )
