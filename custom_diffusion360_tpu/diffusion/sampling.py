"""Diffusion samplers as jittable lax.scan loops.

Reference: sgm/modules/diffusionmodules/sampling.py (k-diffusion lineage) and
sampling_utils.py. The torch per-step Python loops become ``lax.scan`` over
precomputed (sigma, sigma_next) pairs; churn noise and ancestral noise use
explicit per-step PRNG keys.

Every sampler takes ``denoise_fn(x, sigma_vec) -> denoised`` — guider
batching/combining lives inside that closure (built by the engine), so the
samplers stay guidance-agnostic, like BaseDiffusionSampler.denoise
(sampling.py:57-61).

All samplers reproduce the base-loop init scaling x *= sqrt(1 + sigma_0^2)
(sampling.py:50) unless ``scale_init=False`` (used when resuming mid-
trajectory, e.g. after the unrolled first step that fills the NeRF cache).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _append_dims(x, ndim):
    return x.reshape(x.shape + (1,) * (ndim - x.ndim))


def to_d(x, sigma, denoised):
    """(x - denoised) / sigma  (sampling_utils.py:40-41)."""
    return (x - denoised) / _append_dims(sigma, x.ndim)


def get_ancestral_step(sigma_from, sigma_to, eta=1.0):
    """sampling_utils.py:27-37."""
    if not eta:
        return sigma_to, jnp.zeros_like(sigma_to)
    sigma_up = jnp.minimum(
        sigma_to,
        eta * jnp.sqrt(sigma_to**2 * (sigma_from**2 - sigma_to**2) / sigma_from**2),
    )
    sigma_down = jnp.sqrt(sigma_to**2 - sigma_up**2)
    return sigma_down, sigma_up


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    num_steps: int = 50
    s_churn: float = 0.0
    s_tmin: float = 0.0
    s_tmax: float = float("inf")
    s_noise: float = 1.0
    eta: float = 1.0  # ancestral samplers
    order: int = 4  # LMS


def _gammas(sigmas: jnp.ndarray, cfg: SamplerConfig) -> jnp.ndarray:
    """Per-step churn gamma (EDMSampler, sampling.py:117-121)."""
    n = sigmas.shape[0]
    g = min(cfg.s_churn / max(n - 1, 1), 2**0.5 - 1)
    in_range = (sigmas >= cfg.s_tmin) & (sigmas <= cfg.s_tmax)
    return jnp.where(in_range, g, 0.0)[:-1]


def _sigma_vec(sigma, batch):
    return jnp.full((batch,), sigma, jnp.float32)


def _prep(x, sigmas, scale_init):
    if scale_init:
        x = x * jnp.sqrt(1.0 + sigmas[0] ** 2)
    return x


def _step_keys(key, n):
    if key is None:
        return jnp.zeros((n, 2), jnp.uint32)
    return jax.random.split(key, n)


def euler_edm_sample(
    denoise_fn: Callable,
    x: jnp.ndarray,
    sigmas: jnp.ndarray,
    cfg: SamplerConfig = SamplerConfig(),
    *,
    key: Optional[jax.Array] = None,
    scale_init: bool = True,
) -> jnp.ndarray:
    """EulerEDMSampler (sampling.py:88-137 + :387-391)."""
    x = _prep(x, sigmas, scale_init)
    b = x.shape[0]
    n = sigmas.shape[0] - 1
    gammas = _gammas(sigmas, cfg)
    use_churn = cfg.s_churn > 0.0 and key is not None
    keys = _step_keys(key, n)

    def step(x, inp):
        sigma, next_sigma, gamma, k = inp
        sigma_hat = sigma * (gamma + 1.0)
        if use_churn:
            eps = jax.random.normal(k, x.shape, x.dtype) * cfg.s_noise
            add = jnp.sqrt(jnp.maximum(sigma_hat**2 - sigma**2, 0.0))
            x = x + eps * add
        denoised = denoise_fn(x, _sigma_vec(sigma_hat, b))
        d = to_d(x, _sigma_vec(sigma_hat, b), denoised)
        x = x + (next_sigma - sigma_hat) * d
        return x, None

    x, _ = jax.lax.scan(step, x, (sigmas[:-1], sigmas[1:], gammas, keys))
    return x


def heun_edm_sample(
    denoise_fn,
    x,
    sigmas,
    cfg: SamplerConfig = SamplerConfig(),
    *,
    key=None,
    scale_init: bool = True,
):
    """HeunEDMSampler (sampling.py:394-412): 2nd-order correction unless the
    next sigma is ~0."""
    x = _prep(x, sigmas, scale_init)
    b = x.shape[0]
    n = sigmas.shape[0] - 1
    gammas = _gammas(sigmas, cfg)
    use_churn = cfg.s_churn > 0.0 and key is not None
    keys = _step_keys(key, n)

    def step(x, inp):
        sigma, next_sigma, gamma, k = inp
        sigma_hat = sigma * (gamma + 1.0)
        if use_churn:
            eps = jax.random.normal(k, x.shape, x.dtype) * cfg.s_noise
            x = x + eps * jnp.sqrt(jnp.maximum(sigma_hat**2 - sigma**2, 0.0))
        denoised = denoise_fn(x, _sigma_vec(sigma_hat, b))
        d = to_d(x, _sigma_vec(sigma_hat, b), denoised)
        dt = next_sigma - sigma_hat
        euler = x + dt * d

        def correct(euler):
            denoised2 = denoise_fn(euler, _sigma_vec(next_sigma, b))
            d2 = to_d(euler, _sigma_vec(next_sigma, b), denoised2)
            return x + dt * 0.5 * (d + d2)

        x = jax.lax.cond(next_sigma > 1e-14, correct, lambda e: e, euler)
        return x, None

    x, _ = jax.lax.scan(step, x, (sigmas[:-1], sigmas[1:], gammas, keys))
    return x


def euler_ancestral_sample(
    denoise_fn,
    x,
    sigmas,
    cfg: SamplerConfig = SamplerConfig(),
    *,
    key,
    scale_init: bool = True,
):
    """EulerAncestralSampler (sampling.py:415-423)."""
    x = _prep(x, sigmas, scale_init)
    b = x.shape[0]
    n = sigmas.shape[0] - 1
    keys = jax.random.split(key, n)

    def step(x, inp):
        sigma, next_sigma, k = inp
        sigma_down, sigma_up = get_ancestral_step(sigma, next_sigma, cfg.eta)
        denoised = denoise_fn(x, _sigma_vec(sigma, b))
        d = to_d(x, _sigma_vec(sigma, b), denoised)
        x = x + (sigma_down - sigma) * d
        noise = jax.random.normal(k, x.shape, x.dtype)
        x = jnp.where(next_sigma > 0.0, x + noise * cfg.s_noise * sigma_up, x)
        return x, None

    x, _ = jax.lax.scan(step, x, (sigmas[:-1], sigmas[1:], keys))
    return x


def dpmpp2s_ancestral_sample(
    denoise_fn,
    x,
    sigmas,
    cfg: SamplerConfig = SamplerConfig(),
    *,
    key,
    scale_init: bool = True,
):
    """DPMPP2SAncestralSampler (sampling.py:426-462)."""
    x = _prep(x, sigmas, scale_init)
    b = x.shape[0]
    n = sigmas.shape[0] - 1
    keys = jax.random.split(key, n)

    def step(x, inp):
        sigma, next_sigma, k = inp
        sigma_down, sigma_up = get_ancestral_step(sigma, next_sigma, cfg.eta)
        denoised = denoise_fn(x, _sigma_vec(sigma, b))
        d = to_d(x, _sigma_vec(sigma, b), denoised)
        x_euler = x + (sigma_down - sigma) * d

        def dpm_step(_):
            t, t_next = -jnp.log(sigma), -jnp.log(sigma_down)
            h = t_next - t
            s = t + 0.5 * h
            mult1 = jnp.exp(-s) / jnp.exp(-t)
            mult2 = jnp.expm1(-0.5 * h)
            mult3 = jnp.exp(-t_next) / jnp.exp(-t)
            mult4 = jnp.expm1(-h)
            x2 = mult1 * x - mult2 * denoised
            denoised2 = denoise_fn(x2, _sigma_vec(jnp.exp(-s), b))
            return mult3 * x - mult4 * denoised2

        x_new = jax.lax.cond(sigma_down > 1e-14, dpm_step, lambda _: x_euler, None)
        noise = jax.random.normal(k, x.shape, x.dtype)
        x_new = jnp.where(
            next_sigma > 0.0, x_new + noise * cfg.s_noise * sigma_up, x_new
        )
        return x_new, None

    x, _ = jax.lax.scan(step, x, (sigmas[:-1], sigmas[1:], keys))
    return x


def dpmpp2m_sample(
    denoise_fn,
    x,
    sigmas,
    cfg: SamplerConfig = SamplerConfig(),
    *,
    key=None,
    scale_init: bool = True,
):
    """DPMPP2MSampler (sampling.py:465-560): multistep with old_denoised carry."""
    x = _prep(x, sigmas, scale_init)
    b = x.shape[0]
    n = sigmas.shape[0] - 1
    idx = jnp.arange(n)

    def step(carry, inp):
        x, old_denoised = carry
        i, sigma, next_sigma, prev_sigma = inp
        denoised = denoise_fn(x, _sigma_vec(sigma, b))
        t, t_next = -jnp.log(sigma), -jnp.log(next_sigma)
        h = t_next - t
        mult1 = jnp.exp(-t_next) / jnp.exp(-t)
        mult2 = jnp.expm1(-h)
        x_standard = mult1 * x - mult2 * denoised

        h_last = t - (-jnp.log(prev_sigma))
        r = h_last / h
        denoised_d = (1 + 1 / (2 * r)) * denoised - (1 / (2 * r)) * old_denoised
        x_advanced = mult1 * x - mult2 * denoised_d

        first_or_final = (i == 0) | (next_sigma < 1e-14)
        x_new = jnp.where(first_or_final, x_standard, x_advanced)
        return (x_new, denoised), None

    prev_sigmas = jnp.concatenate([sigmas[:1], sigmas[:-2]])
    (x, _), _ = jax.lax.scan(
        step, (x, jnp.zeros_like(x)), (idx, sigmas[:-1], sigmas[1:], prev_sigmas)
    )
    return x


def _lms_coeffs(sigmas: np.ndarray, order: int) -> np.ndarray:
    """Adams-Bashforth coefficients on the sigma grid
    (sampling_utils.py:12-24). Host-side exact polynomial integration
    (no scipy quad needed: the integrand is a degree<order polynomial)."""
    t = np.asarray(sigmas, np.float64)
    n = len(t) - 1
    coeffs = np.zeros((n, order), np.float64)
    for i in range(n):
        cur_order = min(i + 1, order)
        for j in range(cur_order):
            # product_{k != j} (tau - t[i-k]) / (t[i-j] - t[i-k]) integrated
            # over [t[i], t[i+1]] — expand the numerator polynomial exactly.
            num = np.poly1d([1.0])
            denom = 1.0
            for k in range(cur_order):
                if k == j:
                    continue
                num *= np.poly1d([1.0, -t[i - k]])
                denom *= t[i - j] - t[i - k]
            integ = num.integ()
            coeffs[i, j] = (integ(t[i + 1]) - integ(t[i])) / denom
    return coeffs


def linear_multistep_sample(
    denoise_fn,
    x,
    sigmas,
    cfg: SamplerConfig = SamplerConfig(),
    *,
    key=None,
    scale_init: bool = True,
):
    """LinearMultistepSampler (sampling.py:338-374), order-4 default."""
    x = _prep(x, sigmas, scale_init)
    b = x.shape[0]
    n = sigmas.shape[0] - 1
    order = cfg.order
    coeffs = jnp.asarray(_lms_coeffs(np.asarray(sigmas), order), jnp.float32)

    def step(carry, inp):
        x, ds = carry  # ds: (order, *x.shape), ds[0] = most recent
        sigma, cs = inp
        denoised = denoise_fn(x, _sigma_vec(sigma, b))
        d = to_d(x, _sigma_vec(sigma, b), denoised)
        ds = jnp.concatenate([d[None], ds[:-1]], axis=0)
        upd = jnp.tensordot(cs, ds, axes=(0, 0))
        return (x + upd, ds), None

    ds0 = jnp.zeros((order,) + x.shape, x.dtype)
    (x, _), _ = jax.lax.scan(step, (x, ds0), (sigmas[:-1], coeffs))
    return x


def multidiffusion_sample(
    denoise_fns: Sequence[Callable],
    shape,
    sigmas,
    cfg: SamplerConfig = SamplerConfig(),
    *,
    key,
    window: int = 64,
    stride: int = 48,
    dtype=jnp.float32,
):
    """EDMMultidiffusionSampler (sampling.py:155-233): panorama-style windowed
    denoising. ``denoise_fns[j]`` closes over view j's cond/pose. The wide
    latent has width stride*(len(denoise_fns)+1); overlapping windows are
    denoised independently per step and averaged (MultiDiffusion).

    shape: (B, H, _, C) — width is recomputed like the reference.
    NHWC layout; windows tile the width axis.
    """
    n_views = len(denoise_fns)
    b, h, _, c = shape
    width = stride * (n_views + 1)
    views = []
    num_blocks = (width - window) // stride + 1
    for i in range(num_blocks):
        ws = i * stride
        views.append((ws, ws + window))

    x = jax.random.normal(key, (b, h, width, c), dtype)
    x = x * jnp.sqrt(1.0 + sigmas[0] ** 2)
    gammas = _gammas(sigmas, cfg)

    def step(x, inp):
        sigma, next_sigma, gamma = inp
        sigma_hat = sigma * (gamma + 1.0)
        value = jnp.zeros_like(x)
        count = jnp.zeros_like(x)
        for j, (ws, we) in enumerate(views):
            xv = x[:, :, ws:we, :]
            denoised = denoise_fns[min(j, n_views - 1)](xv, _sigma_vec(sigma_hat, b))
            d = to_d(xv, _sigma_vec(sigma_hat, b), denoised)
            xv_new = xv + (next_sigma - sigma_hat) * d
            value = value.at[:, :, ws:we, :].add(xv_new)
            count = count.at[:, :, ws:we, :].add(1.0)
        x = jnp.where(count > 0, value / jnp.maximum(count, 1.0), value)
        return x, None

    x, _ = jax.lax.scan(step, x, (sigmas[:-1], sigmas[1:], gammas))
    return x


# Single-pose sampler registry (reference: config-instantiated sampler
# classes, sgm/modules/diffusionmodules/sampling.py; selected via
# EngineConfig.sampler_name / cli.sample --sampler). All share the
# (denoise_fn, x, sigmas, cfg, *, key, scale_init) signature.
SAMPLERS = {
    "euler_edm": euler_edm_sample,
    "heun_edm": heun_edm_sample,
    "euler_ancestral": euler_ancestral_sample,
    "dpmpp2s_ancestral": dpmpp2s_ancestral_sample,
    "dpmpp2m": dpmpp2m_sample,
    "lms": linear_multistep_sample,
}
