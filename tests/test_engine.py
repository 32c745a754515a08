"""End-to-end engine tests: training loss, gradients, sampling paths."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_diffusion360_tpu.diffusion import (
    scheduled_cfg_img_text_ref,
    vanilla_cfg_img_ref,
)
from custom_diffusion360_tpu.engine import Engine, EngineConfig
from custom_diffusion360_tpu.io.delta import iter_pose_blocks
from custom_diffusion360_tpu.models.clip import ClipTextConfig
from custom_diffusion360_tpu.models.conditioner import ConditionerConfig
from custom_diffusion360_tpu.models.unet import UNetConfig
from custom_diffusion360_tpu.models.vae import VAEConfig
from tests.test_cameras import random_cameras

TINY_CFG = EngineConfig(
    unet=UNetConfig(
        model_channels=64,
        channel_mult=(1, 2),
        transformer_depth=(1, 1),
        attention_resolutions=(2,),
        context_dim=96,
        adm_in_channels=72,  # pooled 48 + 3 * 2 * 4
        num_head_channels=32,
        image_cross_blocks=(0,),
        num_samples=4,
        num_freqs=4,
    ),
    vae=VAEConfig(ch=16, ch_mult=(1, 2, 4, 4), num_res_blocks=1),
    conditioner=ConditionerConfig(
        clip_l=ClipTextConfig(vocab_size=64, width=48, layers=1, heads=4, context_length=16),
        open_clip=ClipTextConfig(
            vocab_size=64, width=48, layers=2, heads=4, context_length=16,
            act="gelu", text_projection=True,
        ),
        size_outdim=4,
    ),
)

B, N, RES = 1, 2, 64  # image 64² -> latent 8²


@pytest.fixture(scope="module")
def engine_and_params():
    eng = Engine(TINY_CFG)
    params = eng.init_params(jax.random.PRNGKey(0))
    # zero-init layers (proj_out, out_conv, NeRF decoder) block gradient flow
    # at exact init; perturb them so gradient tests are observable
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.default_rng(9)
    leaves = [
        l if float(jnp.abs(l).max()) > 0
        else jnp.asarray(rng.normal(size=l.shape).astype(np.float32)) * 0.02
        for l in leaves
    ]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    return eng, params


def _toks(m):
    return jnp.zeros((m, 16), jnp.int32).at[:, 1].set(7)


def _train_batch():
    rng = np.random.default_rng(0)
    cams = random_cameras((1 + N) * B, seed=2).reshape(B, 1 + N)
    return {
        "image": jnp.asarray(rng.normal(size=(B, RES, RES, 3)).astype(np.float32)) * 0.2,
        "image_ref": jnp.asarray(
            rng.normal(size=(B, N, RES, RES, 3)).astype(np.float32)
        ) * 0.2,
        "mask": jnp.ones((B, RES // 8, RES // 8, 1)),
        "mask_ref": None,
        "opacity": jnp.ones((B, RES, RES, 1)),
        "drop_im": jnp.ones((B,)),
        "cams": cams,
        "tokens_clip": _toks(B),
        "tokens_open": _toks(B),
        "original_size": jnp.full((B, 2), 64.0),
        "crop_coords": jnp.zeros((B, 2)),
        "target_size": jnp.full((B, 2), 64.0),
        "tokens_clip_ref": _toks(B * N),
        "tokens_open_ref": _toks(B * N),
        "original_size_ref": jnp.full((B * N, 2), 64.0),
        "crop_coords_ref": jnp.zeros((B * N, 2)),
        "target_size_ref": jnp.full((B * N, 2), 64.0),
    }


class TestTrainingLoss:
    def test_loss_finite_and_terms(self, engine_and_params):
        eng, params = engine_and_params
        loss, metrics = eng.training_loss(
            params, _train_batch(), jax.random.PRNGKey(1), global_step=1
        )
        assert np.isfinite(float(loss))
        assert "loss" in metrics and "loss_rgb" in metrics
        assert "loss_fg" in metrics and "loss_bg" in metrics

    def test_grad_wrt_pose_params(self, engine_and_params):
        eng, params = engine_and_params
        batch = _train_batch()

        # pick the first pose block, differentiate w.r.t. its fusion weight
        _, path, attn_id, d = next(iter(iter_pose_blocks(TINY_CFG.unet)))
        from custom_diffusion360_tpu.io.delta import _get_block

        def loss_fn(w):
            import copy

            p2 = {**params, "unet": jax.tree.map(lambda a: a, params["unet"])}
            blk = _get_block(p2["unet"], path, d)
            blk["pose_emb_layers"] = {"w": w}
            l, _ = eng.training_loss(p2, batch, jax.random.PRNGKey(1), 1)
            return l

        w = _get_block(params["unet"], path, d)["pose_emb_layers"]["w"]
        g = jax.grad(loss_fn)(w)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0

    def test_jit_compiles(self, engine_and_params):
        eng, params = engine_and_params
        batch = _train_batch()
        f = jax.jit(lambda p, b, k: eng.training_loss(p, b, k, 1)[0])
        l1 = f(params, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(l1))


class TestSampling:
    def _references(self, b_hw=64, c=128):
        # attn_id 0 at ds=2 -> tokens (RES/8/2)^2 = 16; inner dim = 2*64=128
        refs = {}
        rng = np.random.default_rng(3)
        for _, _, attn_id, d in iter_pose_blocks(TINY_CFG.unet):
            refs.setdefault(attn_id, {})[d] = jnp.asarray(
                rng.normal(size=(N + 1, 16, 128)).astype(np.float32) * 0.1
            )
        return refs

    def _cond(self, copies_rows):
        # inference cond: target rows only (ref=False layout)
        return {
            "crossattn": jnp.ones((B, 16, 96)) * 0.1,
            "vector": jnp.ones((B, 72)) * 0.1,
        }

    def test_sample_with_references(self, engine_and_params):
        eng, params = engine_and_params
        guider = vanilla_cfg_img_ref(scale=5.0)
        cams = random_cameras((1 + N) * B * 2, seed=4).reshape(2 * B, 1 + N)
        out = eng.sample(
            params,
            self._cond(2),
            self._cond(2),
            guider,
            jax.random.PRNGKey(5),
            shape=(B, 8, 8, 4),
            cams=cams,
            references=self._references(),
            choices=np.arange(N),
            num_steps=4,
        )
        assert out.shape == (B, 8, 8, 4)
        assert np.isfinite(np.asarray(out)).all()

    def test_cache_equals_no_cache(self, engine_and_params):
        """Render-once caching must be exact at eval (deterministic rays)."""
        eng, params = engine_and_params
        guider = vanilla_cfg_img_ref(scale=5.0)
        cams = random_cameras((1 + N) * B * 2, seed=4).reshape(2 * B, 1 + N)
        kwargs = dict(
            shape=(B, 8, 8, 4),
            cams=cams,
            references=self._references(),
            choices=np.arange(N),
            num_steps=3,
        )
        out1 = eng.sample(
            params, self._cond(2), self._cond(2), guider, jax.random.PRNGKey(5),
            cache_nerf=True, **kwargs,
        )
        out2 = eng.sample(
            params, self._cond(2), self._cond(2), guider, jax.random.PRNGKey(5),
            cache_nerf=False, **kwargs,
        )
        np.testing.assert_allclose(
            np.asarray(out1), np.asarray(out2), atol=1e-4
        )

    def test_compact_refs_match_dense(self, engine_and_params):
        """CompactRefTokens (deferred per-block expansion — the default
        delta-buffer inference path and the b=4 render OOM fix) must be
        numerically identical to the eager dense (copies*B, n, hw, C)
        buffers it replaces, for both CFG layouts (2 and 3 copies)."""
        eng, params = engine_and_params
        refs = self._references()

        def run(guider, copies, seed):
            cams = random_cameras((1 + N) * B * copies, seed=4).reshape(
                copies * B, 1 + N
            )
            return lambda: eng.sample(
                params, self._cond(copies), self._cond(copies), guider,
                jax.random.PRNGKey(seed),
                shape=(B, 8, 8, 4), cams=cams, references=refs,
                choices=np.arange(N), num_steps=3,
            )

        for guider, copies in [
            (vanilla_cfg_img_ref(scale=5.0), 2),
            (scheduled_cfg_img_text_ref(scale=5.0, scale_im=2.0), 3),
        ]:
            f = run(guider, copies, seed=5)
            out_compact = f()
            orig = eng.build_ref_features
            eng.build_ref_features = (
                lambda r, ch, b, k, compact=True, **kw: orig(
                    r, ch, b, k, compact=False, **kw
                )
            )
            try:
                out_dense = f()
            finally:
                eng.build_ref_features = orig
            np.testing.assert_allclose(
                np.asarray(out_compact), np.asarray(out_dense), atol=1e-5
            )

    def test_cfg3_render_dedupe_matches_full(
        self, engine_and_params, monkeypatch
    ):
        """The x3 render dedupe (copies 1/2 share reference planes AND the
        caller-declared shared target cams, so the NeRF encode runs on 2
        unique copies — transformer._reference_attn) must be numerically
        identical to the full 3-copy render. Rays are deterministic at
        eval, so equality is exact up to reduction order."""
        eng, params = engine_and_params
        guider = scheduled_cfg_img_text_ref(scale=5.0, scale_im=2.0)
        # one B-row camera block tiled over the 3 copies — the CLI layout
        block = random_cameras((1 + N) * B, seed=4).reshape(B, 1 + N)
        cams = jax.tree.map(
            lambda x: jnp.concatenate([x] * 3, axis=0), block
        )

        def run():
            return eng.sample(
                params, self._cond(3), self._cond(3), guider,
                jax.random.PRNGKey(5),
                shape=(B, 8, 8, 4), cams=cams, references=self._references(),
                choices=np.arange(N), num_steps=3,
                shared_target_cams=True,
            )

        monkeypatch.setenv("CD360_CFG3_DEDUPE", "0")
        out_full = run()
        monkeypatch.setenv("CD360_CFG3_DEDUPE", "1")
        out_dedupe = run()
        np.testing.assert_allclose(
            np.asarray(out_dedupe), np.asarray(out_full), atol=1e-5
        )

    def test_cfg3_render_dedupe_matches_full_chunked(self, monkeypatch):
        """Same equivalence through the ray-chunk scan + scan-native
        chunked output layout (CD360_CHUNKED_RENDER=1), which expands the
        deduped rows on axis 1 of the (nc, B, chunk, S, *) layout."""
        import dataclasses as dc

        cfg = dc.replace(
            TINY_CFG, unet=dc.replace(TINY_CFG.unet, nerf_chunk_size=8)
        )
        eng = Engine(cfg)
        params = eng.init_params(jax.random.PRNGKey(0))
        guider = scheduled_cfg_img_text_ref(scale=5.0, scale_im=2.0)
        block = random_cameras((1 + N) * B, seed=4).reshape(B, 1 + N)
        cams = jax.tree.map(
            lambda x: jnp.concatenate([x] * 3, axis=0), block
        )
        meta = __import__(
            "custom_diffusion360_tpu.models.unet", fromlist=["attn_block_meta"]
        ).attn_block_meta(cfg.unet)
        rng = np.random.default_rng(3)
        refs = {}
        for _, _, attn_id, d in iter_pose_blocks(cfg.unet):
            ds, ch, _ = meta[attn_id]
            hw = (8 // ds) ** 2
            refs.setdefault(attn_id, {})[d] = jnp.asarray(
                rng.normal(size=(N + 1, hw, ch)).astype(np.float32) * 0.1
            )

        def run():
            return eng.sample(
                params, self._cond(3), self._cond(3), guider,
                jax.random.PRNGKey(5),
                shape=(B, 8, 8, 4), cams=cams, references=refs,
                choices=np.arange(N), num_steps=2,
                shared_target_cams=True,
            )

        from custom_diffusion360_tpu.models import nerf as nerf_mod

        monkeypatch.setattr(nerf_mod, "_CHUNKED_OUT", True)
        monkeypatch.setenv("CD360_CFG3_DEDUPE", "0")
        out_full = run()
        monkeypatch.setenv("CD360_CFG3_DEDUPE", "1")
        out_dedupe = run()
        np.testing.assert_allclose(
            np.asarray(out_dedupe), np.asarray(out_full), atol=1e-5
        )

    def test_ip2p_guider_path(self, engine_and_params):
        eng, params = engine_and_params
        guider = scheduled_cfg_img_text_ref(scale=5.0, scale_im=2.0)
        cams = random_cameras((1 + N) * B * 3, seed=4).reshape(3 * B, 1 + N)
        out = eng.sample(
            params,
            self._cond(3),
            self._cond(3),
            guider,
            jax.random.PRNGKey(6),
            shape=(B, 8, 8, 4),
            cams=cams,
            references=self._references(),
            choices=np.arange(N),
            num_steps=2,
        )
        assert np.isfinite(np.asarray(out)).all()

    def test_prefix_dedupe_matches_full(self, engine_and_params, monkeypatch):
        """The pre-pose-block prefix dedupe (x3 copies 0/1 are identical by
        guider construction, so unet_apply computes conv_in + the
        pre-attention resblocks on 2 unique copies and expands at the first
        attn layer, incl. skip tensors) must match full-row compute through
        the cached sampler steps. cond != uc so the copy groups (0,0,1) are
        actually distinct rows."""
        eng, params = engine_and_params
        guider = scheduled_cfg_img_text_ref(scale=5.0, scale_im=2.0)
        block = random_cameras((1 + N) * B, seed=4).reshape(B, 1 + N)
        cams = jax.tree.map(lambda x: jnp.concatenate([x] * 3, axis=0), block)
        cond = {
            "crossattn": jnp.full((B, 16, 96), 0.2),
            "vector": jnp.full((B, 72), 0.2),
        }
        uc = self._cond(3)

        def run():
            return eng.sample(
                params, cond, uc, guider, jax.random.PRNGKey(5),
                shape=(B, 8, 8, 4), cams=cams, references=self._references(),
                choices=np.arange(N), num_steps=3,
                shared_target_cams=True,
            )

        monkeypatch.setenv("CD360_PREFIX_DEDUPE", "0")
        out_full = run()
        monkeypatch.setenv("CD360_PREFIX_DEDUPE", "1")
        out_dedupe = run()
        # XLA picks different conv reductions for 2- vs 3-row batches;
        # measured noise 1.5e-5 abs on O(50) outputs (exactly 0.0 with the
        # zero-init out layers) — a real row-map bug would be O(1)
        np.testing.assert_allclose(
            np.asarray(out_dedupe), np.asarray(out_full), rtol=1e-4, atol=1e-4
        )

    def test_vanilla_sample_no_refs(self, engine_and_params):
        """Plain SDXL sampling (no pose conditioning) must work too."""
        from custom_diffusion360_tpu.diffusion import vanilla_cfg

        eng, params = engine_and_params
        out = eng.sample(
            params,
            self._cond(2),
            self._cond(2),
            vanilla_cfg(scale=7.5),
            jax.random.PRNGKey(7),
            shape=(B, 8, 8, 4),
            num_steps=2,
        )
        assert np.isfinite(np.asarray(out)).all()
