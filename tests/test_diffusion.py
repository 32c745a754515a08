"""Tests for the diffusion layer (schedules, denoiser, guiders, samplers, loss)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_diffusion360_tpu.diffusion import (
    Denoiser,
    DenoiserConfig,
    DiffusionLossConfig,
    SamplerConfig,
    combine_losses,
    dpmpp2m_sample,
    edm_sigmas,
    euler_ancestral_sample,
    euler_edm_sample,
    heun_edm_sample,
    legacy_ddpm_sigmas,
    linear_multistep_sample,
    sample_sigmas_cubic,
    sample_sigmas_discrete,
    scheduled_cfg_img_text_ref,
    vanilla_cfg,
    vanilla_cfg_img_ref,
)
from custom_diffusion360_tpu.diffusion.loss import compute_loss_terms


class TestDiscretization:
    def test_legacy_ddpm_endpoints(self):
        # SDXL's sigma grid: sigma_max ~ 14.6146, sigma_min ~ 0.0292
        s = legacy_ddpm_sigmas(1000)
        assert s.shape == (1001,)
        assert float(s[-1]) == 0.0
        np.testing.assert_allclose(float(s[0]), 14.6146, rtol=1e-4)
        np.testing.assert_allclose(float(s[-2]), 0.029168, rtol=1e-3)
        assert np.all(np.diff(np.asarray(s)) <= 0)

    def test_torch_parity(self):
        # golden vs the reference formula implemented in float64 torch
        import torch

        betas = (
            torch.linspace(0.00085**0.5, 0.0120**0.5, 1000, dtype=torch.float64) ** 2
        )
        ac = torch.cumprod(1.0 - betas, 0)
        ref = torch.flip(((1 - ac) / ac) ** 0.5, (0,)).float().numpy()
        ours = np.asarray(legacy_ddpm_sigmas(1000, append_zero=False))
        np.testing.assert_allclose(ours, ref, rtol=1e-5)

    def test_subsampled_grid(self):
        s50 = legacy_ddpm_sigmas(50)
        assert s50.shape == (51,)
        assert float(s50[0]) > 14.0

    def test_flip_training_grid(self):
        s = legacy_ddpm_sigmas(1000, append_zero=False, flip=True)
        assert np.all(np.diff(np.asarray(s)) >= 0)

    def test_edm(self):
        s = edm_sigmas(10)
        np.testing.assert_allclose(float(s[0]), 80.0, rtol=1e-5)
        np.testing.assert_allclose(float(s[-2]), 0.002, rtol=1e-4)
        assert float(s[-1]) == 0.0


class TestSigmaSampling:
    def test_discrete_in_grid(self):
        grid = legacy_ddpm_sigmas(50, append_zero=False, flip=True)
        s = sample_sigmas_discrete(jax.random.PRNGKey(0), grid, 512)
        assert np.isin(np.asarray(s), np.asarray(grid)).all()

    def test_cubic_bias_high_sigma(self):
        grid = legacy_ddpm_sigmas(1000, append_zero=False, flip=True)
        s = sample_sigmas_cubic(jax.random.PRNGKey(0), grid, 4096)
        # (1-u^3) concentrates near 1 -> high indices -> high sigma
        assert float(jnp.median(s)) > float(jnp.median(grid))


class TestDenoiser:
    def test_quantization_roundtrip(self):
        d = Denoiser(DenoiserConfig())
        idx = d.sigma_to_idx(d.sigmas)
        np.testing.assert_array_equal(np.asarray(idx), np.arange(1000))

    def test_eps_identity(self):
        # eps scaling: D(x, sigma) = x - sigma * net(x / sqrt(1+s^2), t)
        d = Denoiser(DenoiserConfig())
        x = jnp.ones((2, 4, 4, 1))
        sigma = jnp.full((2,), float(d.sigmas[500]))

        captured = {}

        def net(xs, t, cond, **kw):
            captured["xs"] = xs
            captured["t"] = t
            return jnp.zeros_like(xs), {}

        out, _ = d(net, x, sigma, {})
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-6)
        s = float(d.sigmas[500])
        np.testing.assert_allclose(
            np.asarray(captured["xs"]), 1.0 / np.sqrt(s**2 + 1), rtol=1e-5
        )
        # c_noise quantized to grid index
        np.testing.assert_allclose(np.asarray(captured["t"]), 500.0)

    def test_ref_double_noising_and_scaling(self):
        d = Denoiser(DenoiserConfig())
        x = jnp.zeros((2, 4, 4, 1))
        ref = jnp.ones((2, 3, 4, 4, 1))
        sigma = jnp.full((2,), 1.0)
        sigmas_ref = jnp.full((2,), float(d.sigmas[100]))
        captured = {}

        def net(xs, t, cond, input_ref=None, sigmas_ref=None, **kw):
            captured["ref"] = input_ref
            captured["sref"] = sigmas_ref
            return jnp.zeros_like(xs), {}

        d(net, x, sigma, {}, input_ref=ref, sigmas_ref=sigmas_ref,
          noise_ref_key=jax.random.PRNGKey(0))
        s = float(d.sigmas[100])
        c_in = 1.0 / np.sqrt(s**2 + 1)
        got = np.asarray(captured["ref"])
        # noised with std sigma then scaled: mean stays ~c_in, std ~ s*c_in
        np.testing.assert_allclose(got.mean(), c_in, atol=0.05)
        np.testing.assert_allclose(np.asarray(captured["sref"]), 100.0)


class TestGuiders:
    def _cond(self, b, n):
        key = jax.random.PRNGKey(0)
        return {
            "crossattn": jax.random.normal(key, ((1 + n) * b, 77, 8)),
            "vector": jax.random.normal(key, ((1 + n) * b, 16)),
        }

    def test_vanilla_cfg_img_ref_layout(self):
        b, n = 2, 3
        g = vanilla_cfg_img_ref(scale=5.0)
        c, uc = self._cond(b, n), self._cond(b, n)
        x = jnp.zeros((b, 4, 4, 1))
        s = jnp.ones((b,))
        xb, sb, cb = g.prepare(x, s, c, uc)
        assert xb.shape[0] == 2 * b and sb.shape[0] == 2 * b
        ca = cb["crossattn"]
        assert ca.shape[0] == 2 * (1 + n) * b
        # [uc_tgt, c_tgt, uc_ref, c_ref]
        np.testing.assert_array_equal(np.asarray(ca[:b]), np.asarray(uc["crossattn"][:b]))
        np.testing.assert_array_equal(np.asarray(ca[b:2*b]), np.asarray(c["crossattn"][:b]))
        np.testing.assert_array_equal(np.asarray(ca[2*b:2*b+n*b]), np.asarray(uc["crossattn"][b:]))
        np.testing.assert_array_equal(np.asarray(ca[2*b+n*b:]), np.asarray(c["crossattn"][b:]))

    def test_vanilla_cfg_combine(self):
        g = vanilla_cfg(scale=3.0)
        x_u = jnp.zeros((2, 4))
        x_c = jnp.ones((2, 4))
        out = g.combine(jnp.concatenate([x_u, x_c]), None)
        np.testing.assert_allclose(np.asarray(out), 3.0)

    def test_scheduled_cfg_combine(self):
        g = scheduled_cfg_img_text_ref(scale=2.0, scale_im=0.5)
        x_u = jnp.full((1, 4), 0.0)
        x_ic = jnp.full((1, 4), 1.0)
        x_c = jnp.full((1, 4), 3.0)
        out = g.combine(jnp.concatenate([x_u, x_ic, x_c]), None)
        # 0 + 2*(3-1) + 0.5*(1-0) = 4.5
        np.testing.assert_allclose(np.asarray(out), 4.5)

    def test_scheduled_cfg_triple_layout(self):
        b, n = 1, 2
        g = scheduled_cfg_img_text_ref(scale=2.0, scale_im=0.5)
        c, uc = self._cond(b, n), self._cond(b, n)
        x = jnp.zeros((b, 2, 2, 1))
        xb, sb, cb = g.prepare(x, jnp.ones((b,)), c, uc)
        assert xb.shape[0] == 3 * b
        ca = cb["crossattn"]
        # [uc1, uc1, c1 | uc2, c2, c2]
        np.testing.assert_array_equal(np.asarray(ca[0]), np.asarray(uc["crossattn"][0]))
        np.testing.assert_array_equal(np.asarray(ca[1]), np.asarray(uc["crossattn"][0]))
        np.testing.assert_array_equal(np.asarray(ca[2]), np.asarray(c["crossattn"][0]))
        np.testing.assert_array_equal(np.asarray(ca[3:5]), np.asarray(uc["crossattn"][1:]))


class TestSamplers:
    """With a perfect denoiser D(x, s) = x0, the ODE trajectory is linear in
    sigma and Euler is exact: final x == x0."""

    def setup_method(self):
        self.x0 = jnp.asarray(
            np.random.RandomState(0).randn(2, 8, 8, 3), jnp.float32
        )
        self.denoise = lambda x, s: jnp.broadcast_to(self.x0, x.shape)
        self.sigmas = legacy_ddpm_sigmas(20)
        key = jax.random.PRNGKey(1)
        self.xT = jax.random.normal(key, self.x0.shape)

    def test_euler_exact(self):
        out = euler_edm_sample(self.denoise, self.xT, self.sigmas)
        np.testing.assert_allclose(np.asarray(out), np.asarray(self.x0), atol=1e-4)

    def test_heun_exact(self):
        out = heun_edm_sample(self.denoise, self.xT, self.sigmas)
        np.testing.assert_allclose(np.asarray(out), np.asarray(self.x0), atol=1e-4)

    def test_dpmpp2m_converges(self):
        out = dpmpp2m_sample(self.denoise, self.xT, self.sigmas)
        np.testing.assert_allclose(np.asarray(out), np.asarray(self.x0), atol=1e-2)

    def test_ancestral_converges(self):
        out = euler_ancestral_sample(
            self.denoise, self.xT, self.sigmas, key=jax.random.PRNGKey(2)
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(self.x0), atol=1e-3)

    def test_lms_converges(self):
        out = linear_multistep_sample(self.denoise, self.xT, self.sigmas)
        np.testing.assert_allclose(np.asarray(out), np.asarray(self.x0), atol=1e-3)

    def test_euler_matches_torch_reference_loop(self):
        """Step-by-step parity with the reference EDMSampler math
        (sampling.py:96-137) on a nontrivial linear denoiser."""
        import torch

        w = 0.7

        def denoise_jax(x, s):
            return w * x

        sigmas = np.asarray(legacy_ddpm_sigmas(10))
        xT = np.random.RandomState(3).randn(1, 4, 4, 2).astype(np.float32)

        # reference loop in torch
        x = torch.from_numpy(xT.copy()) * float(np.sqrt(1 + sigmas[0] ** 2))
        for i in range(len(sigmas) - 1):
            denoised = w * x
            d = (x - denoised) / sigmas[i]
            x = x + float(sigmas[i + 1] - sigmas[i]) * d
        ref = x.numpy()

        out = euler_edm_sample(denoise_jax, jnp.asarray(xT), jnp.asarray(sigmas))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=1e-5)

    def test_scale_init_resume(self):
        """Running [0..k) then [k..N) with scale_init=False matches a full run."""
        full = euler_edm_sample(self.denoise, self.xT, self.sigmas)
        k = 3
        part1 = euler_edm_sample(self.denoise, self.xT, self.sigmas[: k + 1])
        part2 = euler_edm_sample(
            self.denoise, part1, self.sigmas[k:], scale_init=False
        )
        np.testing.assert_allclose(np.asarray(part2), np.asarray(full), atol=1e-5)

    def test_jit_compiles(self):
        f = jax.jit(
            lambda x: euler_edm_sample(self.denoise, x, self.sigmas)
        )
        out = f(self.xT)
        np.testing.assert_allclose(np.asarray(out), np.asarray(self.x0), atol=1e-4)


class TestLoss:
    def test_masked_l2(self):
        b = 2
        out = jnp.ones((b, 4, 4, 1))
        tgt = jnp.zeros((b, 4, 4, 1))
        w = jnp.ones((b, 1, 1, 1))
        mask = jnp.zeros((b, 4, 4, 1)).at[:, :2].set(1.0)
        terms = compute_loss_terms(out, [], [], [], tgt, None, w, mask, None)
        np.testing.assert_allclose(np.asarray(terms["l2"]), 1.0, rtol=1e-5)

    def test_aux_terms_shapes(self):
        b, size = 2, 8
        hw = size * size
        fg = [jnp.full((b, hw), 0.5)]
        alphas = [jnp.full((b, hw, 24, 1), 0.2)]
        rgb = [jnp.full((b, hw, 3), 0.5)]
        out = jnp.zeros((b, 4, 4, 1))
        tgt = jnp.zeros((b, 4, 4, 1))
        tgt_rgb = jnp.zeros((b, 32, 32, 3))
        w = jnp.ones((b, 1, 1, 1))
        mask = jnp.ones((b, 4, 4, 1))  # latent-resolution, like the reference
        opacity = jnp.ones((b, 32, 32, 1))
        terms = compute_loss_terms(
            out, fg, alphas, rgb, tgt, tgt_rgb, w, mask, opacity
        )
        assert terms["fg"].shape == (b, 1)
        assert terms["bg"].shape == (b, 1)
        assert terms["rgb"].shape == (b, 1)
        # opacity==1 everywhere -> fg loss = (0.5-1)^2, bg gated off
        np.testing.assert_allclose(np.asarray(terms["fg"]), 0.25, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(terms["bg"]), 0.0, atol=1e-7)

    def test_combine(self):
        b = 2
        terms = {
            "l2": jnp.full((b,), 2.0),
            "fg": jnp.full((b, 3), 0.1),
            "bg": jnp.full((b, 3), 0.2),
            "rgb": jnp.full((b, 3), 0.3),
        }
        drop = jnp.ones((b,))
        cfg = DiffusionLossConfig()
        total, d = combine_losses(terms, drop, 1, cfg=cfg)
        expect = 2.0 + 10 * 0.1 + 10 * 0.2 + 5 * 0.3
        np.testing.assert_allclose(float(total), expect, rtol=1e-5)
        # step 0: fg/bg gated off
        total0, _ = combine_losses(terms, drop, 0, cfg=cfg)
        np.testing.assert_allclose(float(total0), 2.0 + 5 * 0.3, rtol=1e-5)
