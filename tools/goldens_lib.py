"""Fixed-seed golden outputs for cross-round numerics anchoring.

With real SDXL weights unavailable in this environment (zero egress), the
committed goldens in ``tests/goldens/`` are the ONLY thing preventing a
silent numerics drift between rounds: every module's output on fixed tiny
configs + fixed seeds is recorded once and asserted in CI
(tests/test_goldens.py). A refactor that changes any module's numerics
fails CI with a per-key diff report. They stand in for the fidelity target
of reference sample.py:201-351 until weights-day (see README runbook).

All computation runs on CPU with float32 matmul precision so results do not
depend on the accelerator or on TPU bf16 matmul passes.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "goldens",
)
GOLDEN_NPZ = os.path.join(GOLDEN_DIR, "goldens.npz")
GOLDEN_JSON = os.path.join(GOLDEN_DIR, "goldens.json")


def _tiny_configs():
    from custom_diffusion360_tpu.models.clip import ClipTextConfig
    from tests.test_engine import TINY_CFG
    from tests.test_io import TINY_UNET, TINY_VAE

    return TINY_CFG, TINY_UNET, TINY_VAE, ClipTextConfig


def compute_goldens():
    """Returns {name: np.ndarray} of deterministic module outputs."""
    import jax
    import jax.numpy as jnp

    from custom_diffusion360_tpu.diffusion import (
        legacy_ddpm_sigmas,
        scheduled_cfg_img_text_ref,
        vanilla_cfg_img_ref,
    )
    from custom_diffusion360_tpu.engine import Engine
    from custom_diffusion360_tpu.geometry.cameras import Cameras
    from custom_diffusion360_tpu.io.delta import iter_pose_blocks
    from custom_diffusion360_tpu.models.clip import (
        clip_text_apply,
        init_clip_text_params,
    )
    from custom_diffusion360_tpu.models.conditioner import (
        get_unconditional_conditioning,
    )
    from custom_diffusion360_tpu.models.unet import init_unet_params, unet_apply
    from custom_diffusion360_tpu.models.vae import (
        init_vae_params,
        vae_decode,
        vae_encode,
    )
    from custom_diffusion360_tpu.train.trainer import TrainConfig, Trainer
    from tests.test_engine import N, TINY_CFG, _train_batch

    TINY_CFG_, TINY_UNET, TINY_VAE, ClipTextConfig = _tiny_configs()
    out = {}

    def rot_cams(n, seed):
        r = np.random.default_rng(seed)
        th = r.uniform(0, 2 * np.pi, n)
        R = np.stack(
            [
                np.array(
                    [
                        [np.cos(t), 0, np.sin(t)],
                        [0, 1, 0],
                        [-np.sin(t), 0, np.cos(t)],
                    ],
                    np.float32,
                )
                for t in th
            ]
        )
        T = np.tile(np.array([0, 0, 2.7], np.float32), (n, 1))
        return Cameras.create(R, T, 2.0, 0.0)

    with jax.default_matmul_precision("float32"):
        # --- VAE ---------------------------------------------------------
        vp = init_vae_params(jax.random.PRNGKey(10), TINY_VAE)
        rng = np.random.default_rng(100)
        x_img = jnp.asarray(
            rng.normal(size=(1, 32, 32, 3)).astype(np.float32) * 0.5
        )
        out["vae_moments"] = vae_encode(vp, x_img, TINY_VAE)
        z_in = jnp.asarray(
            rng.normal(size=(1, 16, 16, TINY_VAE.z_channels)).astype(np.float32)
        )
        out["vae_decode"] = vae_decode(vp, z_in, TINY_VAE)

        # --- text towers -------------------------------------------------
        ccfg = ClipTextConfig(
            vocab_size=32, width=16, layers=2, heads=2, context_length=8
        )
        cp = init_clip_text_params(jax.random.PRNGKey(11), ccfg)
        toks = jnp.asarray(
            np.random.default_rng(101).integers(0, 33, (2, 8)), jnp.int32
        )
        rep = clip_text_apply(cp, toks, ccfg)
        out["clip_final"] = rep["final"]
        out["clip_penultimate"] = rep["penultimate"]

        ocfg = ClipTextConfig(
            vocab_size=32, width=16, layers=3, heads=2, context_length=8,
            act="gelu", text_projection=True,
        )
        op = init_clip_text_params(jax.random.PRNGKey(12), ocfg)
        orep = clip_text_apply(op, toks, ocfg)
        out["open_clip_penultimate"] = orep["penultimate"]
        out["open_clip_pooled"] = orep["pooled"]

        # --- plain UNet --------------------------------------------------
        up = init_unet_params(jax.random.PRNGKey(13), TINY_UNET)
        rng = np.random.default_rng(102)
        xu = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
        ctx = jnp.asarray(
            rng.normal(size=(1, 7, TINY_UNET.context_dim)).astype(np.float32)
            * 0.2
        )
        yv = jnp.asarray(
            rng.normal(size=(1, TINY_UNET.adm_in_channels)).astype(np.float32)
            * 0.2
        )
        eps, _ = unet_apply(up, TINY_UNET, xu, jnp.full((1,), 500.0), ctx, yv)
        out["unet_plain_eps"] = eps

        # --- pose-conditioned UNet (NeRF path on ref buffers) ------------
        # perturb zero-init NeRF decoders so sigma/rgb are observable
        from custom_diffusion360_tpu.io.delta import _get_block

        key = jax.random.PRNGKey(14)
        for _, path, _, d in iter_pose_blocks(TINY_UNET):
            blk = _get_block(up, path, d)
            w = blk["pose_featurenerf"]["decoder"]["w"]
            key, k = jax.random.split(key)
            blk["pose_featurenerf"]["decoder"]["w"] = (
                jax.random.normal(k, w.shape) * 0.05
            )
        from custom_diffusion360_tpu.models.unet import attn_block_meta

        meta = attn_block_meta(TINY_UNET)
        refs = {}
        rng = np.random.default_rng(103)
        n_ref = 2
        for _, _, attn_id, d in iter_pose_blocks(TINY_UNET):
            ds, ch, _ = meta[attn_id]
            hw = max(8 // ds, 1) ** 2
            refs.setdefault(attn_id, {})[d] = jnp.asarray(
                rng.normal(size=(1, n_ref, hw, ch)).astype(np.float32) * 0.1
            )
        cams = rot_cams((1 + n_ref), 104).reshape(1, 1 + n_ref)
        eps_p, aux = unet_apply(
            up, TINY_UNET, xu, jnp.full((1,), 500.0), ctx, yv,
            cams=cams, ref_features=refs,
        )
        out["unet_pose_eps"] = eps_p
        if aux.get("fg_mask"):
            out["unet_pose_fg_mask"] = aux["fg_mask"][0]

        # --- conditioner -------------------------------------------------
        eng = Engine(TINY_CFG)
        params = eng.init_params(jax.random.PRNGKey(0))
        batch = _train_batch()
        c, uc = get_unconditional_conditioning(
            params["conditioner"], batch, batch, TINY_CFG.conditioner,
            force_uc_zero_txt=True, ref=False,
        )
        out["cond_c_crossattn"] = c["crossattn"]
        out["cond_c_vector"] = c["vector"]
        out["cond_uc_crossattn"] = uc["crossattn"]

        # --- 3-step sample fingerprint (TINY_CFG engine) -----------------
        refs_e = {}
        rng = np.random.default_rng(3)
        for _, _, attn_id, d in iter_pose_blocks(TINY_CFG.unet):
            refs_e.setdefault(attn_id, {})[d] = jnp.asarray(
                rng.normal(size=(N + 1, 16, 128)).astype(np.float32) * 0.1
            )
        guider = vanilla_cfg_img_ref(scale=7.5)
        cams_s = rot_cams(2 * (1 + N), 105).reshape(2, 1 + N)
        cond_s = {
            "crossattn": jnp.zeros((1, 16, TINY_CFG.unet.context_dim)),
            "vector": jnp.zeros((1, TINY_CFG.unet.adm_in_channels)),
        }
        z3 = eng.sample(
            params, cond_s, cond_s, guider, jax.random.PRNGKey(0),
            shape=(1, 8, 8, 4), cams=cams_s, references=refs_e,
            choices=np.arange(N), num_steps=3,
        )
        out["sample3_latent"] = z3

        # --- x3 guider, deduped paths (round 5): shared_target_cams
        # licenses the render dedupe (2 unique copies) and the guider's
        # prefix_copy_groups the pre-pose-block prefix dedupe — this key
        # pins the numerics of BOTH new paths, not just their equivalence
        # (tests/test_engine.py) -------------------------------------------
        guider3 = scheduled_cfg_img_text_ref(scale=7.5, scale_im=3.5)
        cams1 = rot_cams(1 + N, 105).reshape(1, 1 + N)
        cams3 = jax.tree.map(
            lambda x: jnp.concatenate([x] * 3, axis=0), cams1
        )
        uc_s = {
            "crossattn": jnp.ones((1, 16, TINY_CFG.unet.context_dim)) * 0.05,
            "vector": jnp.ones((1, TINY_CFG.unet.adm_in_channels)) * 0.05,
        }
        out["sample3_latent_x3_dedupe"] = eng.sample(
            params, cond_s, uc_s, guider3, jax.random.PRNGKey(0),
            shape=(1, 8, 8, 4), cams=cams3, references=refs_e,
            choices=np.arange(N), num_steps=3, shared_target_cams=True,
        )

        # --- one optimizer step (loss + param-update fingerprint) --------
        trainer = Trainer(eng, TrainConfig())
        state = trainer.init_state(params)
        state2, metrics = trainer.train_step(
            state, batch, jax.random.PRNGKey(1)
        )
        out["train1_loss"] = jnp.stack(
            [
                metrics["loss_total"],
                metrics["loss"],
                metrics["loss_fg"],
                metrics["loss_bg"],
                metrics["loss_rgb"],
            ]
        )
        upd = jax.tree_util.tree_leaves(
            jax.tree.map(
                lambda a, b: jnp.sum((a - b).astype(jnp.float32) ** 2),
                state.params,
                state2.params,
            )
        )
        out["train1_update_norm"] = jnp.sqrt(sum(upd))

        # --- TP-sharded sampling (parallel/tp.py over a 1x2 mesh) ---------
        # pins the Megatron-partitioned program's numerics, not just its
        # equivalence (test_tp.py); uses the same refs/cams as sample3
        from custom_diffusion360_tpu.parallel import (
            make_mesh_2d,
            replicate,
            shard_batch,
            shard_params_tp,
        )

        mesh2d = make_mesh_2d(1, 2)
        z3_tp = jax.jit(
            lambda p, r, c, cams, k: eng.sample(
                p, c, c, guider, k,
                shape=(1, 8, 8, 4), cams=cams, references=r,
                choices=np.arange(N), num_steps=3,
            )
        )(
            shard_params_tp(params, mesh2d),
            replicate(refs_e, mesh2d),
            replicate(cond_s, mesh2d),
            shard_batch(cams_s, mesh2d),
            jax.random.PRNGKey(0),
        )
        out["sample3_latent_tp"] = z3_tp

        # --- compact-ref expansion (CompactRefTokens -> projection) ------
        from custom_diffusion360_tpu.models.nerf import (
            CompactRefTokens,
            NerfConfig,
            init_nerf_params,
            project_ref_maps,
        )

        ncfg = NerfConfig(dim=32, num_freqs=4)
        nparams = init_nerf_params(jax.random.PRNGKey(21), ncfg)
        rng = np.random.default_rng(109)
        zero_pl = jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32))
        chosen_pl = jnp.asarray(
            rng.normal(size=(2, 16, 32)).astype(np.float32)
        )
        out["compact_ref_projection"] = project_ref_maps(
            nparams, CompactRefTokens(zero_pl, chosen_pl, 1, 2), None, ncfg
        )

        # --- capture (CUDACallback equivalent, train/capture.py) ---------
        from custom_diffusion360_tpu.train.capture import capture_references

        n_items = 3
        rng = np.random.default_rng(110)
        imgs_cap = jnp.asarray(
            rng.normal(size=(n_items, 64, 64, 3)).astype(np.float32) * 0.2
        )
        cams_cap = rot_cams(n_items + 2, 111).reshape(1, n_items + 2)
        cond_cap = {
            "crossattn": jnp.asarray(
                rng.normal(
                    size=(n_items + 2, 16, TINY_CFG.unet.context_dim)
                ).astype(np.float32) * 0.1
            ),
            "vector": jnp.asarray(
                rng.normal(
                    size=(n_items + 2, TINY_CFG.unet.adm_in_channels)
                ).astype(np.float32) * 0.1
            ),
        }
        cap = capture_references(
            eng, params, imgs_cap, cams_cap, cond_cap, jax.random.PRNGKey(20)
        )
        a0 = sorted(cap.keys())[0]
        out["capture_ref_tokens"] = cap[a0][sorted(cap[a0].keys())[0]]

        # --- AE GAN trainer step (train/ae_engine.py) ---------------------
        from custom_diffusion360_tpu.models.vae import VAEConfig
        from custom_diffusion360_tpu.train.ae_engine import (
            AEEngine,
            AEEngineConfig,
        )

        aeng = AEEngine(AEEngineConfig(
            vae=VAEConfig(ch=32, ch_mult=(1,), num_res_blocks=1, z_channels=4),
            disc_ndf=8, use_lpips=False, lr=1e-3,
        ))
        astate = aeng.init_state(jax.random.PRNGKey(22))
        xa = jax.random.uniform(
            jax.random.PRNGKey(23), (2, 32, 32, 3), jnp.float32, -1.0, 1.0
        )
        astate2, alogs = aeng.train_step(astate, xa, jax.random.PRNGKey(24))
        out["ae1_losses"] = jnp.stack(
            [jnp.asarray(alogs[k], jnp.float32) for k in sorted(alogs)]
        )
        aupd = jax.tree_util.tree_leaves(
            jax.tree.map(
                lambda a, b: jnp.sum((a - b).astype(jnp.float32) ** 2),
                astate.params,
                astate2.params,
            )
        )
        out["ae1_update_norm"] = jnp.sqrt(sum(aupd))

        # --- guiders (pure array math) -----------------------------------
        rng = np.random.default_rng(106)
        xg = jnp.asarray(rng.normal(size=(4, 4, 4, 2)).astype(np.float32))
        out["guider_vanilla_combine"] = vanilla_cfg_img_ref(scale=5.0).combine(
            xg, jnp.ones(())
        )
        xg3 = jnp.asarray(rng.normal(size=(6, 4, 4, 2)).astype(np.float32))
        out["guider_scheduled_combine"] = scheduled_cfg_img_text_ref(
            scale=5.0, scale_im=3.0
        ).combine(xg3, jnp.ones(()))

        # --- discretization ----------------------------------------------
        out["sigmas_legacy_ddpm_50"] = legacy_ddpm_sigmas(50)

    return {k: np.asarray(v, np.float32) for k, v in out.items()}


def sample_sha(goldens):
    import hashlib

    z = goldens["sample3_latent"].astype(np.float64)
    return hashlib.sha256(
        np.round(z / 1e-3).astype(np.int64).tobytes()
    ).hexdigest()[:16]
