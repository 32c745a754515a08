"""Engine extras: MultiDiffusion, log_images, scheduled optimizer."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_diffusion360_tpu.diffusion import vanilla_cfg_img_ref
from custom_diffusion360_tpu.engine import Engine
from custom_diffusion360_tpu.train import TrainConfig, Trainer, lambda_warmup_cosine
from tests.test_cameras import random_cameras
from tests.test_engine import B, N, TINY_CFG, _train_batch


@pytest.fixture(scope="module")
def engine_and_params():
    eng = Engine(TINY_CFG)
    return eng, eng.init_params(jax.random.PRNGKey(0))


class TestMultiDiffusion:
    def test_panorama_shapes(self, engine_and_params):
        eng, params = engine_and_params
        guider = vanilla_cfg_img_ref(scale=5.0)
        n_views = 2
        cond = {
            "crossattn": jnp.ones((B, 16, 96)) * 0.1,
            "vector": jnp.ones((B, 72)) * 0.1,
        }
        cams = [
            random_cameras((1 + N) * 2 * B, seed=i).reshape(2 * B, 1 + N)
            for i in range(n_views)
        ]
        out = eng.samplemulti(
            params, [cond] * n_views, cond, guider, jax.random.PRNGKey(0),
            shape=(B, 8, 8, 4), cams_list=cams,
            num_steps=2, window=8, stride=4,
        )
        assert out.shape == (B, 8, 4 * (n_views + 1), 4)
        assert np.isfinite(np.asarray(out)).all()


class TestLogImages:
    def test_recon_and_samples(self, engine_and_params):
        eng, params = engine_and_params
        batch = _train_batch()
        out = eng.log_images(
            params, batch, jax.random.PRNGKey(0), num_steps=2
        )
        assert out["inputs"].shape == batch["image"].shape
        assert out["reconstructions"].shape == batch["image"].shape
        assert out["samples"].shape == batch["image"].shape
        assert np.isfinite(np.asarray(out["samples"])).all()


class TestScheduledOptimizer:
    def test_lr_schedule_applies(self, engine_and_params):
        eng, params = engine_and_params
        from custom_diffusion360_tpu.io.delta import _get_block, iter_pose_blocks

        sched = lambda_warmup_cosine(2, 0.0, 1.0, 0.0, 10)
        trainer = Trainer(eng, TrainConfig(lr=1.0, lr_schedule=sched))
        state = trainer.init_state(params)
        batch = _train_batch()
        _, path, attn_id, d = next(iter(iter_pose_blocks(TINY_CFG.unet)))

        def leaf(s):
            return np.asarray(
                _get_block(s.params["unet"], path, d)["pose_featurenerf"][
                    "plane_coefs"]["l1"]["w"]
            )

        p0 = leaf(state)
        # step 0: schedule multiplier 0 -> no update at all
        state1, _ = trainer.train_step(state, batch, jax.random.PRNGKey(1))
        np.testing.assert_allclose(p0, leaf(state1), atol=1e-7)
        # later step: nonzero multiplier -> params move
        state2, _ = trainer.train_step(state1, batch, jax.random.PRNGKey(2))
        assert not np.allclose(leaf(state1), leaf(state2), atol=1e-9)


class TestSamplerSelection:
    """Every diffusion.SAMPLERS entry is reachable from Engine.sample
    (reference: config-selectable sampler classes, sgm sampling.py); the
    Euler fast path (unrolled render step 0) must equal the generic cached
    route the other samplers take."""

    def _setup(self, engine_and_params):
        from custom_diffusion360_tpu.io.delta import iter_pose_blocks

        eng, params = engine_and_params
        rng = np.random.default_rng(3)
        refs = {}
        for _, _, attn_id, d in iter_pose_blocks(TINY_CFG.unet):
            refs.setdefault(attn_id, {})[d] = jnp.asarray(
                rng.normal(size=(N + 1, 16, 128)).astype(np.float32) * 0.1
            )
        cond = {
            "crossattn": jnp.ones((B, 16, 96)) * 0.1,
            "vector": jnp.ones((B, 72)) * 0.1,
        }
        cams = random_cameras((1 + N) * 2 * B, seed=4).reshape(2 * B, 1 + N)
        return eng, params, refs, cond, cams

    @pytest.mark.parametrize(
        "name",
        ["heun_edm", "euler_ancestral", "dpmpp2s_ancestral", "dpmpp2m", "lms"],
    )
    def test_each_sampler_runs(self, engine_and_params, name):
        eng, params, refs, cond, cams = self._setup(engine_and_params)
        out = eng.sample(
            params, cond, cond, vanilla_cfg_img_ref(scale=5.0),
            jax.random.PRNGKey(5), shape=(B, 8, 8, 4), cams=cams,
            references=refs, choices=np.arange(N), num_steps=3, sampler=name,
        )
        assert out.shape == (B, 8, 8, 4)
        assert np.isfinite(np.asarray(out)).all()

    def test_euler_fast_path_equals_generic_route(self, engine_and_params):
        """The unrolled-step-0 cache path must match running the full Euler
        sampler through the cached network (the route other samplers take)
        — i.e. the render-once cache is exact, not an approximation."""
        eng, params, refs, cond, cams = self._setup(engine_and_params)

        def run(cache):
            return eng.sample(
                params, cond, cond, vanilla_cfg_img_ref(scale=5.0),
                jax.random.PRNGKey(5), shape=(B, 8, 8, 4), cams=cams,
                references=refs, choices=np.arange(N), num_steps=3,
                cache_nerf=cache,
            )

        np.testing.assert_allclose(
            np.asarray(run(True)), np.asarray(run(False)), atol=2e-4
        )


def test_edm_discretization_selectable(engine_and_params):
    """EngineConfig.discretization_name='edm' routes sampling through the
    EDM sigma schedule (reference: config-instantiated discretization)."""
    import dataclasses

    from custom_diffusion360_tpu.engine import Engine

    eng0, params = engine_and_params
    eng = Engine(dataclasses.replace(eng0.cfg, discretization_name="edm"))
    cond = {
        "crossattn": jnp.ones((B, 16, 96)) * 0.1,
        "vector": jnp.ones((B, 72)) * 0.1,
    }
    cams = random_cameras((1 + N) * 2 * B, seed=4).reshape(2 * B, 1 + N)
    out = eng.sample(
        params, cond, cond, vanilla_cfg_img_ref(scale=5.0),
        jax.random.PRNGKey(5), shape=(B, 8, 8, 4), cams=cams,
        num_steps=2,
    )
    assert np.isfinite(np.asarray(out)).all()
