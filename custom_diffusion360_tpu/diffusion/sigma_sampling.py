"""Training-time noise-level samplers.

Reference: sgm/modules/diffusionmodules/sigma_sampling.py. Functional with
explicit PRNG keys; ``sigmas`` is the *ascending* (flip=True) training grid
from :mod:`discretization`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_sigmas_discrete(key, sigmas: jnp.ndarray, n: int, num_idx_start: int = 0):
    """Uniform index draw (DiscreteSampling, sigma_sampling.py:16-32)."""
    idx = jax.random.randint(key, (n,), num_idx_start, sigmas.shape[0])
    return sigmas[idx]


def sample_sigmas_cubic(key, sigmas: jnp.ndarray, n: int):
    """t = (1-u^3)*(num_idx-1) biased to high sigma (sigma_sampling.py:35-53).

    Note the reference grid is ascending, so a high index means high sigma.
    """
    num_idx = sigmas.shape[0]
    u = jax.random.uniform(key, (n,))
    idx = ((1.0 - u**3) * (num_idx - 1)).astype(jnp.int32)
    return sigmas[idx]


def sample_sigmas_edm(key, n: int, p_mean: float = -1.2, p_std: float = 1.2):
    """Log-normal sigma draw (EDMSampling, sigma_sampling.py:6-13)."""
    log_sigma = p_mean + p_std * jax.random.normal(key, (n,))
    return jnp.exp(log_sigma)
