"""EDM-preconditioned denoiser.

Reference: sgm/modules/diffusionmodules/denoiser.py:6-79. The denoiser wraps
the raw network into x0-prediction space:

    D(x, sigma) = network(x * c_in, c_noise, cond) * c_out + x * c_skip

``DiscreteDenoiser`` additionally quantizes sigma to the nearest entry of a
1000-step LegacyDDPM grid and reports c_noise as the grid *index* (the UNet
was trained on integer timesteps).

The reference also noises + c_in-scales the *reference* latents here with
sigmas_ref (denoiser.py:26-39) — on top of the noising the loss already did
(loss.py:156-168). That double-noising is load-bearing for training parity
and is reproduced via the explicit ``noise_ref`` key.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .discretization import legacy_ddpm_sigmas
from .scaling import get_scaling, get_weighting


def _append_dims(x, ndim):
    return x.reshape(x.shape + (1,) * (ndim - x.ndim))


@dataclasses.dataclass(frozen=True)
class DenoiserConfig:
    scaling: str = "eps"
    weighting: str = "eps"
    # DiscreteDenoiser settings (num_idx=1000, LegacyDDPM — train_co3d_concept.yaml:17-27)
    discrete: bool = True
    num_idx: int = 1000
    quantize_c_noise: bool = True


class Denoiser:
    """Stateless callable; the sigma grid is a static (traced-constant) array."""

    def __init__(self, cfg: DenoiserConfig = DenoiserConfig()):
        self.cfg = cfg
        self.scaling = get_scaling(cfg.scaling)
        self.weighting = get_weighting(cfg.weighting)
        # ascending grid, no zero (denoiser.py:60-63: flip=True, do_append_zero=False)
        self.sigmas = legacy_ddpm_sigmas(
            cfg.num_idx, append_zero=False, flip=True
        ) if cfg.discrete else None

    def sigma_to_idx(self, sigma):
        # denoiser.py:65-67
        return jnp.argmin(jnp.abs(sigma[..., None] - self.sigmas), axis=-1)

    def quantize_sigma(self, sigma):
        if self.sigmas is None:
            return sigma
        return self.sigmas[self.sigma_to_idx(sigma)]

    def quantize_c_noise(self, c_noise):
        if self.sigmas is None or not self.cfg.quantize_c_noise:
            return c_noise
        return self.sigma_to_idx(c_noise).astype(jnp.float32)

    def w(self, sigma):
        return self.weighting(sigma)

    def __call__(
        self,
        network: Callable,
        x: jnp.ndarray,
        sigma: jnp.ndarray,
        cond: dict,
        *,
        input_ref: Optional[jnp.ndarray] = None,
        sigmas_ref: Optional[jnp.ndarray] = None,
        noise_ref_key: Optional[jax.Array] = None,
        **kwargs,
    ):
        """network(x_scaled, c_noise, cond, input_ref=..., sigmas_ref=..., **kw)
        -> (pred, aux). Returns (denoised, aux).

        x: (B, H, W, C) noised latent; sigma: (B,).
        input_ref: (B, N, H, W, C) reference latents (noised again here with
        sigmas_ref when ``noise_ref_key`` is given — the training-parity
        double-noising; pass None key at inference, matching eval behaviour
        where input_ref comes in un-noised and sigmas_ref is all-zero grid
        draws only at train time).
        """
        sigma = self.quantize_sigma(sigma)
        sigma_bc = _append_dims(sigma, x.ndim)

        if input_ref is not None and sigmas_ref is not None:
            if noise_ref_key is not None:
                noise = jax.random.normal(
                    noise_ref_key, input_ref.shape, input_ref.dtype
                )
                input_ref = input_ref + noise * _append_dims(
                    sigmas_ref, input_ref.ndim
                )
            _, _, c_in_ref, _ = self.scaling(
                _append_dims(sigmas_ref, input_ref.ndim)
            )
            input_ref = input_ref * c_in_ref
            sigmas_ref = self.quantize_c_noise(sigmas_ref)

        c_skip, c_out, c_in, c_noise = self.scaling(sigma_bc)
        c_noise = self.quantize_c_noise(sigma)

        pred, aux = network(
            x * c_in, c_noise, cond, input_ref=input_ref, sigmas_ref=sigmas_ref, **kwargs
        )
        return pred * c_out + x * c_skip, aux
