"""DiffusionEngine: the glue layer composing UNet + denoiser + conditioner +
VAE + sampler + loss into jittable training / sampling programs.

TPU-native redesign of the reference's DiffusionEngine LightningModule
(sgm/models/diffusion.py:43-557). The torch object with mutable state
(rendered_feat caches, activation hooks, requires_grad toggles) becomes a
thin config holder whose methods are pure functions of
``params = {"unet", "vae", "conditioner"}`` — jit/grad/shard_map compose
directly. The render-once NeRF cache (reference sample.py:122-133) is an
explicit unrolled first sampler step whose rendered features are closed over
by the remaining lax.scan steps.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .diffusion.denoiser import Denoiser, DenoiserConfig
from .diffusion.discretization import legacy_ddpm_sigmas, make_sigmas
from .diffusion.loss import (
    DiffusionLossConfig,
    combine_losses,
    diffusion_loss_img_ref,
)
from .diffusion.sampling import SamplerConfig, euler_edm_sample, to_d
from .geometry.cameras import Cameras
from .models.conditioner import (
    ConditionerConfig,
    apply_conditioner,
    init_conditioner_params,
)
from .models.unet import UNetConfig, init_unet_params, unet_apply
from .models.vae import (
    VAEConfig,
    decode_first_stage,
    encode_first_stage,
    init_vae_params,
)


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    unet: UNetConfig = UNetConfig()
    vae: VAEConfig = VAEConfig()
    conditioner: ConditionerConfig = ConditionerConfig()
    denoiser: DenoiserConfig = DenoiserConfig()
    loss: DiffusionLossConfig = DiffusionLossConfig()
    sampler: SamplerConfig = SamplerConfig()
    sampler_name: str = "euler_edm"  # key into diffusion.SAMPLERS
    discretization_name: str = "legacy_ddpm"  # or "edm" (make_sigmas)
    num_sample_steps: int = 50
    compute_dtype: str = "float32"  # UNet autocast: fp32 train (openaimodel.py:992)

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)


class Engine:
    def __init__(self, cfg: EngineConfig = EngineConfig()):
        self.cfg = cfg
        self.denoiser = Denoiser(cfg.denoiser)
        # training sigma grids (train_co3d_concept.yaml:119-131)
        self.sigmas_cubic = legacy_ddpm_sigmas(
            cfg.loss.num_idx, append_zero=False, flip=True
        )
        self.sigmas_discrete = legacy_ddpm_sigmas(
            cfg.loss.num_idx_ref, append_zero=False, flip=True
        )
        # LPIPS weights imported once (loss_type="lpips", loss.py:31-32)
        self.lpips_params = None
        if cfg.loss.loss_type == "lpips" and cfg.loss.lpips_ckpt:
            from .models.lpips import load_lpips_torch

            self.lpips_params = load_lpips_torch(
                cfg.loss.lpips_ckpt, cfg.loss.vgg_ckpt
            )

    # -- params --------------------------------------------------------------

    def init_params(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "unet": init_unet_params(k1, self.cfg.unet),
            "vae": init_vae_params(k2, self.cfg.vae),
            "conditioner": init_conditioner_params(k3, self.cfg.conditioner),
        }

    # -- first stage ---------------------------------------------------------

    def encode_first_stage(self, params, x, key=None):
        return encode_first_stage(params["vae"], x, key=key, cfg=self.cfg.vae)

    def decode_first_stage(self, params, z):
        return decode_first_stage(params["vae"], z, self.cfg.vae)

    # -- network closure -----------------------------------------------------

    def network_fn(
        self,
        params,
        cams: Optional[Cameras],
        mask_ref=None,
        *,
        training: bool = False,
        nerf_caches=None,
        ref_features=None,
        ctx_kv=None,
        prefix_dedupe=None,
    ):
        """Returns network(x, t, cond, input_ref=, sigmas_ref=, key=) ->
        (eps, aux) — the callable the Denoiser wraps (wrappers.py:24-35)."""

        def network(x, t, cond, input_ref=None, sigmas_ref=None, key=None):
            return unet_apply(
                params["unet"],
                self.cfg.unet,
                x,
                t,
                cond["crossattn"],
                cond["vector"],
                input_ref=input_ref,
                sigmas_ref=sigmas_ref,
                cams=cams,
                mask_ref=mask_ref,
                key=key,
                training=training,
                nerf_caches=nerf_caches,
                ref_features=ref_features,
                ctx_kv=ctx_kv,
                compute_dtype=self.cfg.dtype,
                prefix_dedupe=prefix_dedupe,
            )

        return network

    # -- training ------------------------------------------------------------

    def training_loss(self, params, batch, key, global_step):
        """One forward pass -> (scalar loss, metrics dict).

        batch: image (B,H,W,3) in [-1,1]; image_ref (B,N,H,W,3); mask
        (B,h,w,1) latent-res; mask_ref (B,N,Hi,Wi,1); opacity (B,Hi,Wi,1);
        drop_im (B,); cams: Cameras (B, 1+N); plus conditioner token/size
        keys. Reproduces DiffusionEngine.shared_step + forward
        (diffusion.py:221-249).
        """
        k_enc, k_encr, k_loss = jax.random.split(key, 3)
        x_rgb = batch["image"]
        x = self.encode_first_stage(params, x_rgb, k_enc)

        input_ref = None
        if batch.get("image_ref") is not None:
            ir = batch["image_ref"]
            b, n = ir.shape[:2]
            zr = self.encode_first_stage(
                params, ir.reshape((b * n,) + ir.shape[2:]), k_encr
            )
            zr = zr.reshape((b, n) + zr.shape[1:])
            # reg-image dropout zeroes the reference latents (diffusion.py:243-246)
            drop = batch["drop_im"].reshape(b, 1, 1, 1, 1)
            input_ref = drop * zr

        cond = apply_conditioner(
            params["conditioner"], batch, self.cfg.conditioner, ref=True
        )

        network = self.network_fn(
            params, batch.get("cams"), batch.get("mask_ref"), training=True
        )
        terms = diffusion_loss_img_ref(
            self.denoiser,
            network,
            cond,
            x,
            x_rgb,
            input_ref,
            batch.get("mask"),
            batch["opacity"],
            key=k_loss,
            sigmas_cubic=self.sigmas_cubic,
            sigmas_discrete=self.sigmas_discrete,
            cfg=self.cfg.loss,
            lpips_params=self.lpips_params,
        )
        return combine_losses(
            terms,
            batch["drop_im"],
            global_step,
            cfg=self.cfg.loss,
            rgb=True,
            rgb_predict=self.cfg.unet.rgb_predict,
        )

    # -- inference -----------------------------------------------------------

    def build_ref_features(
        self, references, choices, batch_size, num_copies, compact=True,
        ref_sharding=None, shared_cams=False,
    ):
        """Assemble per-block reference-token structures from delta-
        checkpoint buffers, replicating the reference CFG layouts
        (sample.py:86-97): last buffer row is the zero-image/uncond feature.

        references: {attn_id: {d: (Nref+1, hw, C)}}; choices: (n,) int array.
        num_copies: 2 -> [zero | chosen]; 3 -> [zero | chosen | chosen].

        compact (default): each entry is a CompactRefTokens whose
        (copies*B, n, hw, C) expansion is deferred into the per-block map
        projection — the eager dense buffers kept ~2.5 GB/batch of f32 live
        across the whole render step and OOMed the b=4 1024^2 render
        (NOTES.md). Dense mode (compact=False) materializes the expanded
        tensors; required when per-row ``mask_ref`` masking applies.

        ref_sharding: optional NamedSharding over the expanded
        (B*copies, Nref, hw, C) tokens — view-axis (optionally x CFG-axis)
        latency sharding of the NeRF render (see Engine.sample).
        """
        from .models.nerf import CompactRefTokens

        out = {}
        b = batch_size
        for attn_id, per_d in references.items():
            out[attn_id] = {}
            for d, buf in per_d.items():
                chosen = jnp.take(buf[:-1], jnp.asarray(choices), axis=0)  # (n,hw,C)
                if compact:
                    out[attn_id][d] = CompactRefTokens(
                        buf[-1], chosen, b, num_copies, sharding=ref_sharding,
                        shared_cams=shared_cams,
                    )
                    continue
                n = chosen.shape[0]
                zero = jnp.broadcast_to(buf[-1:][None], (b, n) + buf.shape[1:])
                sel = jnp.broadcast_to(chosen[None], (b,) + chosen.shape)
                if num_copies == 3:
                    ctx = jnp.concatenate([zero, sel, sel], axis=0)
                elif num_copies == 2:
                    ctx = jnp.concatenate([zero, sel], axis=0)
                else:
                    ctx = sel
                if ref_sharding is not None:
                    ctx = jax.lax.with_sharding_constraint(ctx, ref_sharding)
                out[attn_id][d] = ctx
        return out

    def sample(
        self,
        params,
        cond,
        uc,
        guider,
        key,
        *,
        shape,
        cams: Optional[Cameras] = None,
        references=None,
        choices=None,
        input_ref=None,
        sigmas_ref=None,
        mask_ref=None,
        num_steps: Optional[int] = None,
        cache_nerf: bool = True,
        cfg_sharding=None,
        ref_sharding=None,
        sampler: Optional[str] = None,
        noise=None,
        shared_target_cams: bool = False,
    ):
        """Pose-conditioned sampling -> latents (B, h, w, 4).

        shared_target_cams: declare that every guider copy carries the SAME
        target camera rows (i.e. ``cams`` was built by tiling the per-image
        pose over ``guider.num_copies`` — what cli/sample.py and the
        reference's sample.py always do; CFG copies differ in conditioning,
        never in pose). Licenses the x3 render dedupe: copies 1/2 of the
        ScheduledCFGImgTextRef layout share their reference planes too, so
        the NeRF encode runs on 2 unique copies instead of 3
        (transformer._reference_attn, CD360_CFG3_DEDUPE). Leave False if
        you pass genuinely per-copy cameras.

        sampler: diffusion.SAMPLERS key overriding cfg.sampler_name
        (euler_edm / heun_edm / euler_ancestral / dpmpp2s_ancestral /
        dpmpp2m / lms — the reference's config-selectable sampler classes,
        sgm sampling.py).

        Two reference-feature sources: precomputed delta-checkpoint buffers
        (references + choices — the sample.py path) or live reference latents
        (input_ref — the log_images path, diffusion.py:474-557).

        cfg_sharding: optional ``NamedSharding`` over the guider-expanded
        batch axis (B * num_copies rows) — latency-mode multi-chip sampling:
        the CFG copies of ONE image are computed on different chips and only
        the guider combine crosses the ICI (one tiny latent all-gather per
        step). Pass shardings whose leading axis divides B * num_copies;
        ``cams``/``references`` inputs should be placed with the same
        sharding (see tests/test_parallel_sampling.py).

        ref_sharding: optional ``NamedSharding`` over the expanded
        (B * num_copies, Nref, hw, C) reference tokens — shards the NeRF
        RENDER over the reference-view axis (SURVEY: the only cross-view
        reduction is the per-point view softmax + pool, one all-reduce).
        Compose with cfg_sharding on a 2-D ('cfg', 'view') mesh —
        P('cfg', 'view') here, P('cfg') for cfg_sharding — to cut the
        first-step render latency by the view-axis size; the 49 cached
        steps are unaffected (renders are cached per CFG row). Requires
        Nref divisible by the view-axis size.

        The NeRF render happens once: step 0 runs outside the scan, its
        rendered features become nerf_caches for the scanned remainder (at
        eval the rays are deterministic, so this is exact, not an
        approximation).
        """
        n_steps = num_steps or self.cfg.num_sample_steps
        sigmas = make_sigmas(self.cfg.discretization_name, n_steps)
        k_noise, k_samp = jax.random.split(key)
        if noise is None:
            # callers that need per-row reproducibility across batch sizes
            # (cli/sample.py --batch) pass explicit per-job noise instead
            noise = jax.random.normal(k_noise, shape, jnp.float32)
        x = noise * jnp.sqrt(1.0 + sigmas[0] ** 2)
        b = shape[0]
        from .diffusion.sampling import SAMPLERS

        name = sampler or self.cfg.sampler_name
        sampler_fn = SAMPLERS[name]

        # inference-only q/k/v projection fusion (pure re-layout; one concat
        # per block, amortized over all sampler steps)
        from .models.transformer import fuse_attention_params

        params = dict(params, unet=fuse_attention_params(params["unet"]))

        ref_features = None
        if references is not None:
            # per-row masks require the dense per-row expansion; the usual
            # delta-buffer path (mask_ref=None) streams compact tokens
            ref_features = self.build_ref_features(
                references, choices, b, guider.num_copies,
                compact=mask_ref is None, ref_sharding=ref_sharding,
                # the x3 render dedupe slices/concats along the COPY axis —
                # under cfg_sharding those rows live on different chips, so
                # the dedupe would trade the render's per-copy latency
                # sharding for cross-cfg-axis collectives; keep full rows
                # there (same gate as the prefix dedupe below)
                shared_cams=shared_target_cams and cfg_sharding is None,
            )

        def make_denoise(nerf_caches, collect_rendered):
            ctx_kv = None
            if nerf_caches is not None:
                # cached phase: the reference stream is skipped, so the UNet
                # sees exactly the CFG-batched target context every step —
                # hoist the ~140 text K/V projections out of the scan
                from .models.unet import precompute_context_kv

                _, _, cb = guider.prepare(x, jnp.zeros((b,)), cond, uc)
                # the UNet consumes context[:batch]; with live-reference
                # conds (log_images) cb also carries per-view ref rows after
                # the target rows — slice to the target rows only
                ctx = cb["crossattn"][: b * guider.num_copies]
                ctx_kv = precompute_context_kv(
                    params["unet"], self.cfg.unet, ctx.astype(self.cfg.dtype)
                )
            # cached steps only: the guider-declared duplicate copies (x3's
            # rows 0/1) share their pre-pose-block prefix; never under
            # cfg_sharding (the internal row-dedupe gather would cross the
            # cfg axis). CD360_PREFIX_DEDUPE=0 restores full-row compute.
            import os as _os

            prefix_dedupe = None
            if (
                nerf_caches is not None
                and cfg_sharding is None
                and _os.environ.get("CD360_PREFIX_DEDUPE", "1") != "0"
            ):
                prefix_dedupe = getattr(guider, "prefix_copy_groups", None)
            network = self.network_fn(
                params,
                cams,
                mask_ref,
                training=False,
                nerf_caches=nerf_caches,
                ref_features=None if nerf_caches is not None else ref_features,
                ctx_kv=ctx_kv,
                prefix_dedupe=prefix_dedupe,
            )

            def denoise(xi, sigma_vec):
                xb, sb, cb = guider.prepare(xi, sigma_vec, cond, uc)
                if cfg_sharding is not None:
                    # pin the expanded batch to the cfg axis; XLA propagates
                    # the partition through the whole UNet body from here
                    xb = jax.lax.with_sharding_constraint(xb, cfg_sharding)
                kwargs = {}
                if nerf_caches is None and input_ref is not None:
                    kwargs = dict(input_ref=input_ref, sigmas_ref=sigmas_ref)
                denoised, aux = self.denoiser(network, xb, sb, cb, **kwargs)
                if collect_rendered:
                    return guider.combine(denoised, sigma_vec), aux["rendered"]
                return guider.combine(denoised, sigma_vec)

            return denoise

        has_nerf_source = bool(ref_features) or input_ref is not None
        if cache_nerf and has_nerf_source:
            s0 = jnp.full((b,), sigmas[0], jnp.float32)
            denoise0 = make_denoise(None, True)
            denoised, rendered = denoise0(x, s0)
            denoise_rest = make_denoise(rendered if rendered else None, False)
            if name == "euler_edm":
                # unrolled Euler step 0 reuses the render pass's denoised —
                # no duplicate network eval
                d = to_d(x, s0, denoised)
                x = x + (sigmas[1] - sigmas[0]) * d
                x = euler_edm_sample(
                    denoise_rest, x, sigmas[1:], self.cfg.sampler,
                    key=k_samp, scale_init=False,
                )
            else:
                # other samplers: the render pass only builds the caches; the
                # sampler re-evaluates step 0 through the cached network
                # (identical output — the render is sigma-independent) so its
                # own step structure (Heun correction, ancestral noise,
                # multistep history) stays exact. Costs one extra cached eval.
                x = sampler_fn(
                    denoise_rest, x, sigmas, self.cfg.sampler,
                    key=k_samp, scale_init=False,
                )
        else:
            denoise = make_denoise(None, False)
            x = sampler_fn(
                denoise, x, sigmas, self.cfg.sampler, key=k_samp,
                scale_init=False,
            )
        return x

    def samplemulti(
        self,
        params,
        conds,
        uc,
        guider,
        key,
        *,
        shape,
        cams_list,
        references=None,
        choices=None,
        num_steps: Optional[int] = None,
        window: int = 64,
        stride: int = 48,
    ):
        """MultiDiffusion panorama sampling: overlapping horizontal windows
        each denoised under its own pose/conditioning, averaged per step
        (EDMMultidiffusionSampler, sampling.py:155-233 +
        DiffusionEngine.samplemulti, diffusion.py:403-423).

        conds: list of per-view cond dicts; cams_list: list of per-view CFG-
        replicated Cameras. shape: (B, H, _, C) — width derives from stride.
        """
        from .diffusion.sampling import multidiffusion_sample
        from .models.transformer import fuse_attention_params

        n_steps = num_steps or self.cfg.num_sample_steps
        sigmas = make_sigmas(self.cfg.discretization_name, n_steps)
        b = shape[0]
        params = dict(params, unet=fuse_attention_params(params["unet"]))

        # identical for every view — build once, share across view closures
        ref_features = None
        if references is not None:
            ref_features = self.build_ref_features(
                references, choices, b, guider.num_copies
            )

        def make_view_fn(cond_j, cams_j):
            network = self.network_fn(
                params, cams_j, None, training=False, ref_features=ref_features
            )

            def denoise(xi, sigma_vec):
                xb, sb, cb = guider.prepare(xi, sigma_vec, cond_j, uc)
                denoised, _ = self.denoiser(network, xb, sb, cb)
                return guider.combine(denoised, sigma_vec)

            return denoise

        denoise_fns = [
            make_view_fn(c, cams) for c, cams in zip(conds, cams_list)
        ]
        return multidiffusion_sample(
            denoise_fns,
            shape,
            sigmas,
            self.cfg.sampler,
            key=key,
            window=window,
            stride=stride,
        )

    def log_images(
        self,
        params,
        batch,
        key,
        *,
        guider=None,
        num_steps: int = 8,
        sample: bool = True,
    ):
        """Training-preview logging (DiffusionEngine.log_images,
        diffusion.py:474-557): VAE reconstructions + samples conditioned on
        the batch's actual reference images (live dual-stream path).

        Returns dict of (B, H, W, 3) image arrays in [-1, 1].
        """
        from .diffusion.guiders import vanilla_cfg_img_ref

        out = {"inputs": batch["image"]}
        k_enc, k_sample = jax.random.split(key)
        z = self.encode_first_stage(params, batch["image"], k_enc)
        out["reconstructions"] = self.decode_first_stage(params, z)
        if not sample:
            return out

        guider = guider or vanilla_cfg_img_ref(scale=5.0)
        cond = apply_conditioner(
            params["conditioner"], batch, self.cfg.conditioner, ref=True
        )
        uc = apply_conditioner(
            params["conditioner"], batch, self.cfg.conditioner,
            force_zero_txt=True, ref=True,
        )
        ir = batch["image_ref"]
        b, n = ir.shape[:2]
        zr = self.encode_first_stage(
            params, ir.reshape((b * n,) + ir.shape[2:]), k_enc
        ).reshape((b, n) + z.shape[1:])
        # CFG-replicate the live reference latents and cameras
        copies = guider.num_copies
        zr_cfg = jnp.concatenate([jnp.zeros_like(zr)] + [zr] * (copies - 1), 0)
        cams = batch.get("cams")
        cams_cfg = jax.tree.map(
            lambda x: jnp.concatenate([x] * copies, 0), cams
        )
        z_s = self.sample(
            params, cond, uc, guider, k_sample,
            shape=z.shape,
            cams=cams_cfg,
            input_ref=zr_cfg,
            sigmas_ref=jnp.zeros((copies * b,)),
            num_steps=num_steps,
        )
        out["samples"] = self.decode_first_stage(params, z_s)

        # FeatureNeRF diagnostics (reference logs predicted_rgb volume
        # renders + heatmaps, diffusion.py:554-557 / main.py:377-544): one
        # live dual-stream forward at a mid sigma
        import math as _math

        k_diag, _ = jax.random.split(k_sample)
        sig = jnp.full((b,), 3.0)
        noised = z + sig.reshape(-1, 1, 1, 1) * jax.random.normal(
            k_diag, z.shape
        )
        network = self.network_fn(params, cams, training=False)
        _, aux = self.denoiser(
            network, noised, sig, cond,
            input_ref=zr, sigmas_ref=jnp.zeros((b,)),
        )
        for i, rgb in enumerate(aux.get("rgb_list") or []):
            size = int(_math.sqrt(rgb.shape[1]))
            out[f"predicted_rgb_{i}"] = (
                rgb.reshape(b, size, size, 3).astype(jnp.float32) * 2.0 - 1.0
            )
        for i, fg in enumerate(aux.get("fg_mask_list") or []):
            size = int(_math.sqrt(fg.shape[1]))
            heat = jnp.clip(fg.reshape(b, size, size, 1), 0.0, 1.0)
            out[f"fg_mask_{i}"] = (
                jnp.broadcast_to(heat, (b, size, size, 3)) * 2.0 - 1.0
            )
        return out
