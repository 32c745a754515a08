"""Sigma schedules (noise-level discretizations).

Reference: sgm/modules/diffusionmodules/discretizer.py:28-69. Schedules are
computed host-side with numpy (they are static w.r.t. jit) and returned as
jnp arrays, highest sigma first (the reference's ``flip`` for sampling).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _equally_spaced_steps(num_substeps: int, max_step: int) -> np.ndarray:
    # discretizer.py:11-14
    return np.linspace(max_step - 1, 0, num_substeps, endpoint=False).astype(int)[::-1]


def legacy_ddpm_sigmas(
    n: int,
    *,
    num_timesteps: int = 1000,
    linear_start: float = 0.00085,
    linear_end: float = 0.0120,
    append_zero: bool = True,
    flip: bool = False,
) -> jnp.ndarray:
    """LegacyDDPM linear-beta schedule -> sigma grid (discretizer.py:42-69).

    Returned descending (sigma_max..sigma_min[,0]) when ``append_zero`` —
    the sampling layout; ``flip=True`` gives the ascending training grid
    used by DiscreteDenoiser/DiscreteSampling (flip applied after append).
    """
    betas = (
        np.linspace(linear_start**0.5, linear_end**0.5, num_timesteps, dtype=np.float64)
        ** 2
    )
    alphas_cumprod = np.cumprod(1.0 - betas)
    if n < num_timesteps:
        alphas_cumprod = alphas_cumprod[_equally_spaced_steps(n, num_timesteps)]
    elif n != num_timesteps:
        raise ValueError(f"n={n} > num_timesteps={num_timesteps}")
    sigmas = ((1 - alphas_cumprod) / alphas_cumprod) ** 0.5
    sigmas = sigmas[::-1].astype(np.float32)  # descending
    if append_zero:
        sigmas = np.concatenate([sigmas, np.zeros((1,), np.float32)])
    if flip:
        sigmas = sigmas[::-1]
    return jnp.asarray(sigmas.copy())


def edm_sigmas(
    n: int,
    *,
    sigma_min: float = 0.002,
    sigma_max: float = 80.0,
    rho: float = 7.0,
    append_zero: bool = True,
    flip: bool = False,
) -> jnp.ndarray:
    """Karras rho-schedule (discretizer.py:28-39), descending."""
    ramp = np.linspace(0, 1, n, dtype=np.float64)
    min_inv_rho = sigma_min ** (1 / rho)
    max_inv_rho = sigma_max ** (1 / rho)
    sigmas = ((max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho).astype(
        np.float32
    )
    if append_zero:
        sigmas = np.concatenate([sigmas, np.zeros((1,), np.float32)])
    if flip:
        sigmas = sigmas[::-1]
    return jnp.asarray(sigmas.copy())


def make_sigmas(kind: str, n: int, **kwargs) -> jnp.ndarray:
    """Registry-style constructor (replaces instantiate_from_config targets)."""
    if kind in ("legacy_ddpm", "LegacyDDPMDiscretization"):
        return legacy_ddpm_sigmas(n, **kwargs)
    if kind in ("edm", "EDMDiscretization"):
        return edm_sigmas(n, **kwargs)
    raise ValueError(f"unknown discretization {kind!r}")
