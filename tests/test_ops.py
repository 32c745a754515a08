import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from custom_diffusion360_tpu.ops import (
    dot_product_attention,
    grid_sample_2d,
    render_weights,
    sample_pdf,
    volume_render,
)
from custom_diffusion360_tpu.ops.attention import attention_padded_kv


class TestGridSample:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_torch_align_corners(self, seed):
        rng = np.random.default_rng(seed)
        b, h, w, c = 3, 16, 16, 8
        feats = rng.normal(size=(b, h, w, c)).astype(np.float32)
        # include out-of-range positions (the reference clips to +-1.2)
        grid = rng.uniform(-1.2, 1.2, size=(b, 50, 2)).astype(np.float32)

        ours = np.asarray(grid_sample_2d(jnp.asarray(feats), jnp.asarray(grid)))

        tfeats = torch.from_numpy(feats).permute(0, 3, 1, 2)  # NCHW
        tgrid = torch.from_numpy(grid).reshape(b, 50, 1, 2)  # N,Ho,Wo,2
        ref = F.grid_sample(
            tfeats, tgrid, align_corners=True, padding_mode="zeros", mode="bilinear"
        )  # N,C,Ho,Wo
        ref = ref.squeeze(-1).permute(0, 2, 1).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_batched_leading_dims(self):
        rng = np.random.default_rng(2)
        feats = rng.normal(size=(2, 4, 8, 8, 5)).astype(np.float32)
        grid = rng.uniform(-1, 1, size=(2, 4, 33, 2)).astype(np.float32)
        out = grid_sample_2d(jnp.asarray(feats), jnp.asarray(grid))
        assert out.shape == (2, 4, 33, 5)
        # equals the flattened computation
        flat = grid_sample_2d(
            jnp.asarray(feats.reshape(8, 8, 8, 5)), jnp.asarray(grid.reshape(8, 33, 2))
        )
        np.testing.assert_allclose(
            np.asarray(out).reshape(8, 33, 5), np.asarray(flat), atol=1e-6
        )


class TestSamplePdf:
    def test_uniform_weights_identity(self):
        """With uniform weights the inverse CDF is linear in u."""
        s = 24
        bins = jnp.linspace(0.0, 2.0, s + 1)[None].repeat(4, 0)
        weights = jnp.ones((4, s))
        u = jnp.linspace(0.0, 1.0 - 1.0 / s, s)[None].repeat(4, 0)
        out = np.asarray(sample_pdf(bins, weights, u))
        np.testing.assert_allclose(out, np.asarray(u) * 2.0, atol=1e-4)

    def test_concentrated_mass(self):
        """All mass in one bin -> all samples land inside that bin."""
        s = 16
        bins = jnp.linspace(0.0, 2.0, s + 1)[None]
        weights = jnp.zeros((1, s)).at[0, 5].set(100.0)
        u = jnp.linspace(0.01, 0.99, 32)[None]
        out = np.asarray(sample_pdf(bins, weights, u))
        lo, hi = 5 * 2.0 / s, 6 * 2.0 / s
        assert np.all(out >= lo - 1e-3) and np.all(out <= hi + 1e-3)

    def test_matches_numpy_inverse_cdf(self):
        rng = np.random.default_rng(0)
        s = 24
        bins = np.linspace(0.0, 2.0, s + 1)[None].repeat(8, 0).astype(np.float32)
        weights = rng.uniform(0, 1, size=(8, s)).astype(np.float32)
        u = rng.uniform(0, 1, size=(8, 24)).astype(np.float32)
        out = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(weights), jnp.asarray(u)))

        # independent numpy inverse-CDF
        w = weights + 1e-5
        pdf = w / w.sum(-1, keepdims=True)
        cdf = np.concatenate([np.zeros((8, 1)), np.cumsum(pdf, -1)], -1)
        expected = np.empty_like(u)
        for i in range(8):
            inds = np.searchsorted(cdf[i], u[i], side="left")
            below = np.clip(inds - 1, 0, s - 1)
            above = np.clip(inds, 0, s)
            denom = cdf[i, above] - cdf[i, below]
            denom = np.where(denom < 1e-5, 1.0, denom)
            t = np.clip((u[i] - cdf[i, below]) / denom, 0, 1)
            expected[i] = bins[i, below] + t * (bins[i, above] - bins[i, below])
        np.testing.assert_allclose(out, expected, atol=1e-5)


class TestVolumeRender:
    def test_weights_sum_to_opacity(self):
        rng = np.random.default_rng(1)
        dens = jnp.asarray(rng.uniform(0, 5, size=(2, 10, 24, 1)).astype(np.float32))
        dists = jnp.full((2, 10, 24, 1), 2.0 / 24)
        weights, alphas, trans = render_weights(dens, dists)
        # total weight = 1 - exp(-sum delta*density)  (total opacity)
        total = np.asarray(weights.sum(-2))
        expected = 1 - np.exp(-np.asarray((dens * dists).sum(-2)))
        np.testing.assert_allclose(total, expected, atol=1e-5)

    def test_transmittance_is_exclusive(self):
        dens = jnp.ones((1, 1, 4, 1)) * 10.0  # opaque early
        dists = jnp.ones((1, 1, 4, 1)) * 0.5
        weights, alphas, trans = render_weights(dens, dists)
        assert float(trans[0, 0, 0, 0]) == 1.0  # first sample sees full light
        assert float(weights[0, 0, 0, 0]) > 0.99

    def test_render_matches_manual(self):
        rng = np.random.default_rng(3)
        feats = jnp.asarray(rng.normal(size=(2, 7, 12, 5)).astype(np.float32))
        dens = jnp.asarray(rng.uniform(0, 3, size=(2, 7, 12, 1)).astype(np.float32))
        dists = jnp.full((2, 7, 12, 1), 0.1)
        out = volume_render(feats, dens, dists)
        w = np.asarray(out["weights"])
        np.testing.assert_allclose(
            np.asarray(out["feats"]), (w * np.asarray(feats)).sum(-2), atol=1e-5
        )
        assert out["fg_mask"].shape == (2, 7, 1)


class TestAttention:
    @pytest.mark.parametrize("n,m", [(64, 64), (256, 77)])
    def test_matches_torch_sdpa(self, n, m):
        rng = np.random.default_rng(0)
        b, h, d = 2, 4, 64
        q = rng.normal(size=(b, n, h, d)).astype(np.float32)
        k = rng.normal(size=(b, m, h, d)).astype(np.float32)
        v = rng.normal(size=(b, m, h, d)).astype(np.float32)
        ours = np.asarray(
            dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
        )
        tq, tk, tv = (
            torch.from_numpy(x).permute(0, 2, 1, 3) for x in (q, k, v)
        )  # b h n d
        ref = (
            torch.nn.functional.scaled_dot_product_attention(tq, tk, tv)
            .permute(0, 2, 1, 3)
            .numpy()
        )
        np.testing.assert_allclose(ours, ref, atol=2e-4)

    def test_padded_kv_equals_unpadded(self):
        rng = np.random.default_rng(1)
        b, n, h, d, m = 2, 32, 4, 64, 77
        q = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, m, h, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, m, h, d)).astype(np.float32))
        kp = jnp.pad(k, ((0, 0), (0, 128 - m), (0, 0), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, 128 - m), (0, 0), (0, 0)))
        out_pad = attention_padded_kv(q, kp, vp, kv_len=m)
        out = dot_product_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out_pad), np.asarray(out), atol=1e-5)


class TestOnehotLayoutVariants:
    """The env-gated in-graph A/B forms of the one-hot sampling einsum
    (CD360_ONEHOT_LAYOUT=hp transposed build, CD360_ONEHOT_ACC=bf16) must
    match the shipped ph/f32 form and the gather reference."""

    def test_hp_layout_matches(self, monkeypatch):
        import custom_diffusion360_tpu.ops.onehot_sample as ohs
        from custom_diffusion360_tpu.ops.grid_sample import grid_sample_2d

        key = jax.random.PRNGKey(3)
        fm = jax.random.normal(key, (3, 8, 8, 16))
        grid = jax.random.uniform(
            jax.random.fold_in(key, 1), (3, 20, 2), minval=-1.2, maxval=1.2
        )
        # pin each side's layout explicitly: the module default is env-
        # dependent ("hp" ships), so computing `want` under the default and
        # then re-setting "hp" compared hp against hp (advisor r3 finding)
        monkeypatch.setattr(ohs, "_ONEHOT_LAYOUT", "ph")
        want = ohs.bilinear_sample_matmul(fm, grid)
        monkeypatch.setattr(ohs, "_ONEHOT_LAYOUT", "hp")
        got = ohs.bilinear_sample_matmul(fm, grid)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(want), np.asarray(grid_sample_2d(fm, grid)), atol=1e-5
        )

    def test_f32_out_mode(self, monkeypatch):
        """CD360_ONEHOT_OUT=f32 returns the uncast f32 accumulator; values
        must equal the default (cast) path exactly after the consumer cast."""
        import custom_diffusion360_tpu.ops.onehot_sample as ohs

        key = jax.random.PRNGKey(5)
        fm = jax.random.normal(key, (2, 8, 8, 8)).astype(jnp.bfloat16)
        grid = jax.random.uniform(
            jax.random.fold_in(key, 1), (2, 16, 2), minval=-1.0, maxval=1.0
        )
        want = ohs.bilinear_sample_matmul(fm, grid)
        monkeypatch.setattr(ohs, "_ONEHOT_OUT", "f32")
        got = ohs.bilinear_sample_matmul(fm, grid)
        assert got.dtype == jnp.float32
        np.testing.assert_array_equal(
            np.asarray(got.astype(fm.dtype)), np.asarray(want)
        )

    def test_bf16_accumulate_close(self, monkeypatch):
        import custom_diffusion360_tpu.ops.onehot_sample as ohs

        key = jax.random.PRNGKey(4)
        fm = jax.random.normal(key, (2, 8, 8, 8)).astype(jnp.bfloat16)
        grid = jax.random.uniform(
            jax.random.fold_in(key, 1), (2, 16, 2), minval=-1.0, maxval=1.0
        )
        want = ohs.bilinear_sample_matmul(fm, grid).astype(jnp.float32)
        monkeypatch.setattr(ohs, "_ONEHOT_ACC", "bf16")
        got = ohs.bilinear_sample_matmul(fm, grid).astype(jnp.float32)
        # 4 nonzero terms per row: bf16 accumulation differs only by rounding
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-2)


class TestBilinearSamplePallas:
    """Fused one-hot Pallas sampler (interpret mode on CPU)."""

    @pytest.fixture(autouse=True)
    def interpret_mode(self, monkeypatch):
        import custom_diffusion360_tpu.ops.onehot_sample as ohs

        monkeypatch.setattr(ohs, "_INTERPRET", True)

    def test_matches_matmul_formulation(self):
        from custom_diffusion360_tpu.ops.onehot_sample import (
            bilinear_sample_matmul,
            bilinear_sample_pallas,
        )

        key = jax.random.PRNGKey(0)
        fm = jax.random.normal(key, (3, 8, 8, 16))
        # include out-of-range points (clip region reads zeros)
        grid = jax.random.uniform(
            jax.random.fold_in(key, 1), (3, 20, 2), minval=-1.2, maxval=1.2
        )
        got = bilinear_sample_pallas(fm, grid, True, 128)
        want = bilinear_sample_matmul(fm, grid)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_vjp_matches_matmul_grad(self):
        from custom_diffusion360_tpu.ops.onehot_sample import (
            bilinear_sample_matmul,
            bilinear_sample_pallas,
        )

        key = jax.random.PRNGKey(2)
        fm = jax.random.normal(key, (2, 8, 8, 8))
        grid = jax.random.uniform(
            jax.random.fold_in(key, 1), (2, 12, 2), minval=-1.0, maxval=1.0
        )

        g1 = jax.grad(lambda f: jnp.sum(bilinear_sample_pallas(f, grid, True, 128) ** 2))(fm)
        g2 = jax.grad(lambda f: jnp.sum(bilinear_sample_matmul(f, grid) ** 2))(fm)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


class TestUpsampleConv2d:
    """Subpixel-folded upsample conv == conv2d(upsample_nearest_2x(x))
    (the UNet/VAE up-path composition, openaimodel.py Upsample /
    model.py:31-44); one low-res conv + depth-to-space, exact."""

    @pytest.mark.parametrize("h,c,co", [(6, 8, 12), (5, 4, 4), (9, 16, 8)])
    def test_matches_composition(self, h, c, co):
        from custom_diffusion360_tpu.models.nn import (
            conv2d,
            conv2d_init,
            upsample_conv2d,
            upsample_nearest_2x,
        )

        p = conv2d_init(jax.random.PRNGKey(0), c, co, 3)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, h, h, c))
        want = conv2d(p, upsample_nearest_2x(x))
        got = upsample_conv2d(p, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_grad_flows(self):
        from custom_diffusion360_tpu.models.nn import (
            conv2d,
            conv2d_init,
            upsample_conv2d,
            upsample_nearest_2x,
        )

        p = conv2d_init(jax.random.PRNGKey(0), 4, 4, 3)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 5, 4))
        g1 = jax.grad(lambda t: jnp.sum(upsample_conv2d(p, t) ** 2))(x)
        g2 = jax.grad(
            lambda t: jnp.sum(conv2d(p, upsample_nearest_2x(t)) ** 2)
        )(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-4)


class TestConv3x3Gemm:
    """Implicit-GEMM Pallas 3x3 conv (ops/conv3x3.py) — the VAE decoder
    conv kernel. Interpret mode on CPU; the real-chip numbers and the
    in-graph closed-negative are in MFU.md's VAE ledger."""

    def _io(self, b=2, h=64, w=64, c=128, n=128):
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(b, h, w, c).astype(np.float32))
        wt = jnp.asarray(rs.randn(3, 3, c, n).astype(np.float32) * 0.05)
        return x, wt

    def test_matches_xla_conv(self, monkeypatch):
        from custom_diffusion360_tpu.ops import conv3x3

        monkeypatch.setattr(conv3x3, "_INTERPRET", True)
        x, w = self._io()
        assert conv3x3.conv3x3_supported(x, w)
        got = conv3x3.conv3x3_gemm(x, w)
        want = conv3x3._conv3x3_ref(x, w)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4
        )

    def test_grads_match_xla_conv(self, monkeypatch):
        from custom_diffusion360_tpu.ops import conv3x3

        monkeypatch.setattr(conv3x3, "_INTERPRET", True)
        x, w = self._io(b=1)
        gx, gw = jax.grad(
            lambda x, w: jnp.sum(conv3x3.conv3x3_gemm(x, w) ** 2),
            argnums=(0, 1),
        )(x, w)
        rx, rw = jax.grad(
            lambda x, w: jnp.sum(conv3x3._conv3x3_ref(x, w) ** 2),
            argnums=(0, 1),
        )(x, w)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=1e-3)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), atol=1e-2)

    def test_vae_dispatch_equivalence(self, monkeypatch):
        """CD360_VAE_CONV=pallas must not change the decode result."""
        from custom_diffusion360_tpu.models.vae import (
            VAEConfig, decode_first_stage, init_vae_params,
        )
        from custom_diffusion360_tpu.ops import conv3x3

        cfg = VAEConfig(ch=128, ch_mult=(1, 1), num_res_blocks=1)
        p = init_vae_params(jax.random.PRNGKey(0), cfg)
        z = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 4)) * 0.3
        monkeypatch.setenv("CD360_VAE_CONV", "xla")
        want = decode_first_stage(p, z, cfg)
        monkeypatch.setattr(conv3x3, "_INTERPRET", True)
        monkeypatch.setenv("CD360_VAE_CONV", "pallas")
        got = decode_first_stage(p, z, cfg)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4
        )
