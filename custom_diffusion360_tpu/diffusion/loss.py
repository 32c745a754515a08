"""Training losses.

Reference: sgm/modules/diffusionmodules/loss.py:108-217
(StandardDiffusionLossImgRef) + the lambda-weighted combination in
sgm/models/diffusion.py:221-236. All computed in float32.

Loss terms:
  l2   — eps-parameterized MSE masked by the dilated object mask;
  fg   — MSE(rendered fg_mask, antialias-downsampled target opacity), per
         FeatureNeRF block;
  bg   — |alphas - opacity| * (1 - opacity) penalty where opacity < 0.1
         (pushes densities to zero off-object);
  rgb  — masked MSE(volume-rendered RGB, downsampled target image).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .sigma_sampling import sample_sigmas_cubic, sample_sigmas_discrete


def _append_dims(x, ndim):
    return x.reshape(x.shape + (1,) * (ndim - x.ndim))


def _resize_bilinear_aa(x, size):
    """NHWC antialiased bilinear resize (torch F.interpolate antialias=True,
    loss.py:189,199-201)."""
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, size, size, c), method="linear", antialias=True)


@dataclasses.dataclass(frozen=True)
class DiffusionLossConfig:
    loss_type: str = "l2"  # l2 | l1 | lpips (loss.py:119)
    offset_noise_level: float = 0.0
    # sigma samplers (train_co3d_concept.yaml:119-131)
    num_idx: int = 1000       # CubicSampling grid for the target
    num_idx_ref: int = 50     # DiscreteSampling grid for the references
    # lambda weights (train_co3d_concept.yaml:9-11)
    loss_rgb_lambda: float = 5.0
    loss_fg_lambda: float = 10.0
    loss_bg_lambda: float = 10.0
    # loss_type="lpips": torch checkpoint paths imported once at Engine init
    # (taming "vgg.pth" heads + torchvision vgg16 state dict)
    lpips_ckpt: Optional[str] = None
    vgg_ckpt: Optional[str] = None


def diffusion_loss_img_ref(
    denoiser,
    network: Callable,
    cond: dict,
    x: jnp.ndarray,
    x_rgb: jnp.ndarray,
    input_ref: Optional[jnp.ndarray],
    mask: Optional[jnp.ndarray],
    opacity: jnp.ndarray,
    *,
    key: jax.Array,
    sigmas_cubic: jnp.ndarray,
    sigmas_discrete: jnp.ndarray,
    cfg: DiffusionLossConfig = DiffusionLossConfig(),
    lpips_params=None,
    **model_kwargs,
):
    """One training forward; returns dict of per-sample loss terms.

    x: (B, H, W, C) clean target latent. x_rgb: (B, Hi, Wi, 3) pixel image in
    [-1, 1]. input_ref: (B, N, H, W, C) clean reference latents. mask: (B,
    Hl, Wl, 1) latent-res object mask. opacity: (B, Hi', Wi', 1) image-space
    opacity in [0,1]. sigmas_cubic/discrete: ascending training grids.

    Reproduces loss.py:140-175: cubic sigma for target, discrete sigma for
    refs, refs noised here once (and again inside the denoiser — the
    reference's double-noising quirk, via the noise_ref_key we pass down).
    """
    b = x.shape[0]
    k_sig, k_noise, k_sigref, k_noiseref, k_noiseref2, k_model = jax.random.split(
        key, 6
    )

    sigmas = sample_sigmas_cubic(k_sig, sigmas_cubic, b)
    noise = jax.random.normal(k_noise, x.shape, x.dtype)
    noised_input = x + noise * _append_dims(sigmas, x.ndim)

    sigmas_ref = sample_sigmas_discrete(k_sigref, sigmas_discrete, b)
    if input_ref is not None:
        noise_ref = jax.random.normal(k_noiseref, input_ref.shape, input_ref.dtype)
        input_ref = input_ref + noise_ref * _append_dims(sigmas_ref, input_ref.ndim)

    model_output, aux = denoiser(
        network,
        noised_input,
        sigmas,
        cond,
        input_ref=input_ref,
        sigmas_ref=sigmas_ref,
        noise_ref_key=k_noiseref2,
        key=k_model,
        **model_kwargs,
    )

    w = _append_dims(denoiser.w(sigmas), x.ndim)
    return compute_loss_terms(
        model_output,
        aux.get("fg_mask_list", []),
        aux.get("alphas_list", []),
        aux.get("rgb_list", []),
        x,
        x_rgb,
        w,
        mask,
        opacity,
        cfg=cfg,
        lpips_params=lpips_params,
    )


def compute_loss_terms(
    model_output,
    fg_mask_list,
    alphas_list,
    rgb_list,
    target,
    target_rgb,
    w,
    mask,
    opacity,
    *,
    cfg: DiffusionLossConfig = DiffusionLossConfig(),
    lpips_params=None,
):
    """loss.py:177-209 in float32. Returns dict with per-sample vectors:
    'l2' (B,), 'fg'/'bg'/'rgb' (B, n_blocks) or None."""
    f32 = jnp.float32
    model_output = model_output.astype(f32)
    target = target.astype(f32)
    b = target.shape[0]

    if cfg.loss_type == "l1":
        # loss.py:211-214: plain mean, no masking on the l1 path
        loss_l1 = (w.astype(f32) * jnp.abs(model_output - target)).reshape(
            b, -1
        ).mean(axis=1)
        return {"l2": loss_l1, "fg": None, "bg": None, "rgb": None}
    if cfg.loss_type == "lpips":
        # loss.py:214-215: LPIPS applied directly to the model output vs
        # target (the reference, like sgm, feeds whatever the denoiser
        # predicts — a 3-channel pixel-space model; 4-channel latents would
        # fail the VGG conv there exactly as they do here)
        if lpips_params is None:
            raise ValueError(
                "loss_type='lpips' needs lpips params — set "
                "DiffusionLossConfig.lpips_ckpt/vgg_ckpt (imported at Engine "
                "init) or pass lpips_params explicitly"
            )
        if model_output.shape[-1] != 3:
            raise ValueError(
                f"LPIPS expects 3-channel inputs, got {model_output.shape}"
            )
        from ..models.lpips import lpips_apply

        loss_lp = lpips_apply(lpips_params, model_output, target)
        return {"l2": loss_lp, "fg": None, "bg": None, "rgb": None}
    if cfg.loss_type != "l2":
        raise NotImplementedError(f"loss_type={cfg.loss_type!r}")

    loss = w.astype(f32) * (model_output - target) ** 2
    if mask is not None:
        m = mask.astype(f32)
        loss_l2 = (loss * m).sum(axis=(1, 2, 3)) / (m.sum(axis=(1, 2, 3)) + 1e-6)
    else:
        loss_l2 = loss.reshape(b, -1).mean(axis=1)

    out = {"l2": loss_l2, "fg": None, "bg": None, "rgb": None}

    if fg_mask_list and alphas_list:
        fg_terms, bg_terms = [], []
        for fg_mask, alphas in zip(fg_mask_list, alphas_list):
            # fg_mask: (B, hw); alphas: (B, hw, S, 1)
            size = int(math.sqrt(fg_mask.shape[1]))
            op = jax.lax.stop_gradient(
                _resize_bilinear_aa(opacity.astype(f32), size)
            ).reshape(-1, size * size)
            fg = jnp.clip(fg_mask.astype(f32).reshape(-1, size * size), 0.0, 1.0)
            fg_terms.append(((fg - op) ** 2).mean(axis=1))
            op_b = op.reshape(-1, size * size, 1, 1)
            bg = jnp.abs(alphas.astype(f32) - op_b) * (1.0 - op_b)
            bg = bg * (op_b < 0.1).astype(f32)
            bg_terms.append(bg.mean(axis=(1, 2, 3)))
        out["fg"] = jnp.stack(fg_terms, axis=1)
        out["bg"] = jnp.stack(bg_terms, axis=1)

    if rgb_list:
        rgb_terms = []
        m = mask.astype(f32)
        for rgb in rgb_list:
            # rgb: (B, hw, 3) volume-rendered; compare in [0, 1] space
            size = int(math.sqrt(rgb.shape[1]))
            mask_s = jax.lax.stop_gradient(_resize_bilinear_aa(m, size))
            tgt = jax.lax.stop_gradient(
                _resize_bilinear_aa(target_rgb.astype(f32) * 0.5 + 0.5, size)
            )
            pred = rgb.astype(f32).reshape(-1, size, size, 3)
            err = (tgt - pred) ** 2
            rgb_terms.append(
                (err * mask_s).sum(axis=(1, 2, 3)) / (m.sum(axis=(1, 2, 3)) + 1e-6)
            )
        out["rgb"] = jnp.stack(rgb_terms, axis=1)

    return out


def combine_losses(
    terms: dict,
    drop_im: jnp.ndarray,
    global_step,
    *,
    cfg: DiffusionLossConfig = DiffusionLossConfig(),
    rgb: bool = True,
    rgb_predict: bool = True,
):
    """Lambda-weighted total (diffusion.py:221-236). ``drop_im`` is 1 where
    the item kept its reference images (fg/bg/rgb terms only apply there).
    fg/bg gated to global_step > 0 like the reference."""
    loss_mean = terms["l2"].mean()
    loss_dict = {"loss": loss_mean}
    drop = drop_im.reshape(-1)
    denom = drop.sum() + 1e-12

    gate = jnp.asarray(global_step > 0, jnp.float32)
    if rgb and terms["fg"] is not None:
        loss_fg = (terms["fg"].mean(axis=1) * drop).sum() / denom
        loss_bg = (terms["bg"].mean(axis=1) * drop).sum() / denom
        loss_mean = loss_mean + gate * (
            cfg.loss_fg_lambda * loss_fg + cfg.loss_bg_lambda * loss_bg
        )
        loss_dict["loss_fg"] = loss_fg
        loss_dict["loss_bg"] = loss_bg
    if rgb_predict and terms["rgb"] is not None:
        loss_rgb = (terms["rgb"].mean(axis=1) * drop).sum() / denom
        loss_mean = loss_mean + cfg.loss_rgb_lambda * loss_rgb
        loss_dict["loss_rgb"] = loss_rgb
    loss_dict["loss_total"] = loss_mean
    return loss_mean, loss_dict
