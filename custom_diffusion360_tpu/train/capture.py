"""Reference-feature capture — the "publish model" bridge.

Reference: §3.4 of SURVEY — CUDACallback's activation hooks record each pose
block's reference-stream output over the onlyref validation set, all_gather
them across ranks, and register them as 'references' buffers shipped in the
delta checkpoint (main.py:588-625). Here it is an explicit post-training
pass, not hooks: one dual-stream UNet forward whose reference views are ALL
the capture items (each item's square-cropped reference image; the last one
a zero image providing the uncond row), collecting the per-block reference
tokens from unet aux.

The captured tokens match training-time semantics: the reference latents are
noised with a DiscreteSampling(50) sigma draw and noised+scaled again by the
denoiser (the double-noising quirk, loss.py:156-168 + denoiser.py:26-39).

Note a reference quirk: its addlen item zeroes the dummy *target* slot, not
the captured reference slot (data_co3d.py:437-439,476-477 — batch["image"][0]
is jpg, while the captured stream reads jpg_ref), so its buffer's last
"zero-image" row actually holds a real frame's features. Here the last row is
computed from a true zero image, matching the documented intent (the row's
role is the uncond reference feature, sample.py:92-96).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..diffusion.sigma_sampling import sample_sigmas_discrete


def _append_dims(x, ndim):
    return x.reshape(x.shape + (1,) * (ndim - x.ndim))


def capture_references(
    engine,
    params,
    images_ref,
    cams,
    cond,
    key,
    *,
    mask_ref=None,
    timestep: float = 500.0,
    view_sharding=None,
):
    """images_ref: (N, H, W, 3) capture images in [-1, 1] — a zero image is
    appended internally for the uncond row. cams: Cameras (1, N+2) — target
    camera first, then one camera per capture image + one for the zero image
    (the reference reuses the last real camera). cond: conditioner output
    covering (1 + N + 1) rows. Returns {attn_id: {d: (N+1, hw, C)}}.

    view_sharding: optional ``NamedSharding`` over the capture-view axis —
    multi-chip feature extraction: the N+1 reference views run through the
    VAE encoder + UNet reference stream on different chips (the reference
    instead splits capture items across DDP ranks and all_gathers,
    main.py:588-603). Requires (N+1) divisible by the mesh size.
    """
    n = images_ref.shape[0]
    imgs = jnp.concatenate([images_ref, jnp.zeros_like(images_ref[:1])], axis=0)
    k_enc, k_sig, k_noise, k_noise2 = jax.random.split(key, 4)

    if view_sharding is not None:
        imgs = jax.lax.with_sharding_constraint(imgs, view_sharding)

    zr = engine.encode_first_stage(params, imgs, k_enc)  # (N+1, h, w, 4)
    zr = zr[None]  # (1, N+1, h, w, 4)
    if view_sharding is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        zr = jax.lax.with_sharding_constraint(
            zr,
            NamedSharding(
                view_sharding.mesh, PartitionSpec(None, *view_sharding.spec)
            ),
        )

    sigmas_ref = sample_sigmas_discrete(k_sig, engine.sigmas_discrete, 1)
    noise = jax.random.normal(k_noise, zr.shape, zr.dtype)
    zr = zr + noise * _append_dims(sigmas_ref, zr.ndim)

    network = engine.network_fn(params, cams, mask_ref, training=False)
    x = jnp.zeros((1,) + zr.shape[2:4] + (engine.cfg.unet.in_channels,))
    sigma = jnp.full((1,), timestep)
    # denoiser applies the second ref noising + c_in scaling
    _, aux = engine.denoiser(
        network,
        x,
        sigma,
        cond,
        input_ref=zr,
        sigmas_ref=sigmas_ref,
        noise_ref_key=k_noise2,
    )
    # squeeze batch: (1, N+1, hw, C) -> (N+1, hw, C)
    return jax.tree.map(lambda t: t[0], aux["ref_tokens"])
