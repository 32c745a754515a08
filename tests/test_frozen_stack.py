"""Tests: VAE, CLIP text towers, conditioner, tokenizer."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_diffusion360_tpu.data.tokenizer import ClipTokenizer, make_test_tokenizer
from custom_diffusion360_tpu.models.clip import (
    ClipTextConfig,
    clip_text_apply,
    init_clip_text_params,
    init_modifier_rows,
)
from custom_diffusion360_tpu.models.conditioner import (
    ConditionerConfig,
    apply_conditioner,
    embed_size_tuple,
    get_unconditional_conditioning,
    init_conditioner_params,
)
from custom_diffusion360_tpu.models.vae import (
    VAEConfig,
    decode_first_stage,
    diagonal_gaussian_sample,
    encode_first_stage,
    init_vae_params,
    vae_decode,
    vae_encode,
)

TINY_VAE = VAEConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1)
TINY_CLIP = ClipTextConfig(
    vocab_size=64, width=32, layers=3, heads=4, context_length=16
)
TINY_BIGG = ClipTextConfig(
    vocab_size=64, width=48, layers=3, heads=4, context_length=16,
    act="gelu", text_projection=True,
)


class TestVAE:
    def test_encode_decode_shapes(self):
        p = init_vae_params(jax.random.PRNGKey(0), TINY_VAE)
        x = jnp.zeros((1, 32, 32, 3))
        m = vae_encode(p, x, TINY_VAE)
        assert m.shape == (1, 16, 16, 8)  # /2 downsample, 2*z_channels
        z = diagonal_gaussian_sample(jax.random.PRNGKey(1), m)
        assert z.shape == (1, 16, 16, 4)
        y = vae_decode(p, z, TINY_VAE)
        assert y.shape == (1, 32, 32, 3)

    def test_first_stage_scale(self):
        p = init_vae_params(jax.random.PRNGKey(0), TINY_VAE)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3)) * 0.1
        z = encode_first_stage(p, x, cfg=TINY_VAE, sample=False)
        m = vae_encode(p, x, TINY_VAE)
        mean = jnp.split(m, 2, axis=-1)[0]
        np.testing.assert_allclose(
            np.asarray(z), np.asarray(mean) * TINY_VAE.scale_factor, rtol=1e-5
        )

    def test_downsample_matches_torch(self):
        """Asymmetric-pad stride-2 conv parity (model.py:84-92)."""
        import torch

        from custom_diffusion360_tpu.models.vae import _downsample

        rs = np.random.RandomState(0)
        w = rs.randn(3, 3, 4, 4).astype(np.float32)  # HWIO
        b = rs.randn(4).astype(np.float32)
        x = rs.randn(2, 9, 9, 4).astype(np.float32)  # NHWC

        got = _downsample({"w": jnp.asarray(w), "b": jnp.asarray(b)}, jnp.asarray(x))

        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        wt = torch.from_numpy(w).permute(3, 2, 0, 1)  # OIHW
        xt = torch.nn.functional.pad(xt, (0, 1, 0, 1))
        ref = torch.nn.functional.conv2d(xt, wt, torch.from_numpy(b), stride=2)
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)

    def test_attn_block_matches_torch_sdpa(self):
        import torch

        from custom_diffusion360_tpu.models.vae import _attn_apply, _init_attn

        c = 8
        p = _init_attn(jax.random.PRNGKey(0), c)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, c))
        got = np.asarray(_attn_apply(p, x))

        # torch single-head attention with the same weights
        xt = torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2).double()
        gn = torch.nn.GroupNorm(min(32, c) if c >= 32 else 8, c, eps=1e-6).double()
        # our group_norm uses num_groups=32 default; for c=8 it degenerates —
        # instead compute norm identically via the jax fn
        from custom_diffusion360_tpu.models.nn import group_norm

        hn = np.asarray(group_norm(p["norm"], x, num_groups=8))
        # redo jax attn with num_groups=8 for comparison
        import custom_diffusion360_tpu.models.vae as vae_mod

        b, h, w_, _ = x.shape
        q = np.asarray(
            jnp.einsum("bhwc,co->bhwo", jnp.asarray(hn), p["q"]["w"][0, 0]) + p["q"]["b"]
        ).reshape(1, -1, c)
        k = np.asarray(
            jnp.einsum("bhwc,co->bhwo", jnp.asarray(hn), p["k"]["w"][0, 0]) + p["k"]["b"]
        ).reshape(1, -1, c)
        v = np.asarray(
            jnp.einsum("bhwc,co->bhwo", jnp.asarray(hn), p["v"]["w"][0, 0]) + p["v"]["b"]
        ).reshape(1, -1, c)
        ref_attn = torch.nn.functional.scaled_dot_product_attention(
            torch.from_numpy(q)[:, None], torch.from_numpy(k)[:, None],
            torch.from_numpy(v)[:, None],
        )[0, 0].numpy()

        from custom_diffusion360_tpu.ops.attention import dot_product_attention

        got_attn = np.asarray(
            dot_product_attention(
                jnp.asarray(q)[:, :, None], jnp.asarray(k)[:, :, None],
                jnp.asarray(v)[:, :, None],
            )
        )[0, :, 0]
        np.testing.assert_allclose(got_attn, ref_attn, atol=1e-4)

    def test_jit_roundtrip_finite(self):
        p = init_vae_params(jax.random.PRNGKey(0), TINY_VAE)
        f = jax.jit(lambda x: decode_first_stage(
            p, encode_first_stage(p, x, cfg=TINY_VAE, sample=False), TINY_VAE
        ))
        y = f(jnp.ones((1, 32, 32, 3)) * 0.5)
        assert jnp.isfinite(y).all()

    def test_batched_decode_matches_per_row(self, monkeypatch):
        """decode_first_stage's large-extent lax.map row decode (the
        batch-4 serving HBM fix) must equal independent per-row decodes —
        exercised on BOTH sides of the extent gate (small extents keep the
        plain batched decode so DP meshes / log_images grids stay
        parallel)."""
        from custom_diffusion360_tpu.models import vae as vae_mod

        p = init_vae_params(jax.random.PRNGKey(0), TINY_VAE)
        z = jax.random.normal(jax.random.PRNGKey(1), (3, 4, 4, TINY_VAE.z_channels))
        rows = jnp.concatenate(
            [decode_first_stage(p, z[i : i + 1], TINY_VAE) for i in range(3)]
        )
        batched = decode_first_stage(p, z, TINY_VAE)  # plain path (4 < gate)
        np.testing.assert_allclose(
            np.asarray(batched), np.asarray(rows), atol=1e-6
        )
        monkeypatch.setattr(vae_mod, "_PER_ROW_DECODE_MIN_LATENT", 4)
        mapped = decode_first_stage(p, z, TINY_VAE)  # lax.map path
        np.testing.assert_allclose(
            np.asarray(mapped), np.asarray(rows), atol=1e-6
        )


class TestClipText:
    def test_shapes_and_outputs(self):
        p = init_clip_text_params(jax.random.PRNGKey(0), TINY_BIGG)
        toks = jnp.zeros((2, 16), jnp.int32).at[:, 0].set(1).at[:, 5].set(63)
        out = clip_text_apply(p, toks, TINY_BIGG)
        assert out["last"].shape == (2, 16, 48)
        assert out["penultimate"].shape == (2, 16, 48)
        assert out["pooled"].shape == (2, 48)

    def test_causal_mask(self):
        """Changing a later token must not affect earlier positions."""
        p = init_clip_text_params(jax.random.PRNGKey(0), TINY_CLIP)
        t1 = jnp.zeros((1, 16), jnp.int32).at[0, 10].set(5)
        t2 = t1.at[0, 12].set(9)
        o1 = clip_text_apply(p, t1, TINY_CLIP)["final"]
        o2 = clip_text_apply(p, t2, TINY_CLIP)["final"]
        np.testing.assert_allclose(
            np.asarray(o1[:, :12]), np.asarray(o2[:, :12]), atol=1e-5
        )
        assert not np.allclose(np.asarray(o1[:, 12]), np.asarray(o2[:, 12]))

    def test_modifier_rows_indexing_and_grad(self):
        cfg = ClipTextConfig(
            vocab_size=64, width=32, layers=2, heads=4, context_length=8,
            num_modifier_tokens=1,
        )
        p = init_clip_text_params(jax.random.PRNGKey(0), cfg)
        p = init_modifier_rows(p, init_token_ids=(5,))
        np.testing.assert_allclose(
            np.asarray(p["modifier_rows"][0]), np.asarray(p["token_embedding"][5])
        )
        # token id == vocab_size indexes the modifier row
        toks_mod = jnp.full((1, 8), 2, jnp.int32).at[0, 3].set(64)
        toks_5 = jnp.full((1, 8), 2, jnp.int32).at[0, 3].set(5)
        o_mod = clip_text_apply(p, toks_mod, cfg)["final"]
        o_5 = clip_text_apply(p, toks_5, cfg)["final"]
        np.testing.assert_allclose(np.asarray(o_mod), np.asarray(o_5), atol=1e-5)

        # gradient reaches modifier_rows only through modifier positions
        def loss(rows):
            out = clip_text_apply(dict(p, modifier_rows=rows), toks_mod, cfg)
            return (out["final"] ** 2).sum()

        g = jax.grad(loss)(p["modifier_rows"])
        assert float(jnp.abs(g).sum()) > 0

        def loss_nomod(rows):
            out = clip_text_apply(dict(p, modifier_rows=rows), toks_5, cfg)
            return (out["final"] ** 2).sum()

        g0 = jax.grad(loss_nomod)(p["modifier_rows"])
        np.testing.assert_allclose(np.asarray(g0), 0.0, atol=1e-8)

    def test_block_matches_torch(self):
        """Pre-LN block parity vs a torch re-implementation (HF CLIP layer
        semantics: residual + MHA(LN1(x)), residual + MLP(LN2(x)))."""
        import torch

        cfg = ClipTextConfig(
            vocab_size=16, width=16, layers=1, heads=2, context_length=6
        )
        p = init_clip_text_params(jax.random.PRNGKey(3), cfg)
        bp = jax.tree.map(lambda x: x[0], p["blocks"])
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 6, 16))

        from custom_diffusion360_tpu.models.clip import _act, _block_apply

        mask = jnp.triu(jnp.full((6, 6), -jnp.inf, jnp.float32), k=1)[None, None]
        got = np.asarray(_block_apply(bp, x, mask, _act("quick_gelu"), cfg))

        xt = torch.from_numpy(np.asarray(x))

        def lin(name, t):
            w = torch.from_numpy(np.asarray(bp[name]["w"]))
            b = torch.from_numpy(np.asarray(bp[name]["b"]))
            return t @ w + b

        def ln(name, t):
            return torch.nn.functional.layer_norm(
                t, (16,),
                torch.from_numpy(np.asarray(bp[name]["scale"])),
                torch.from_numpy(np.asarray(bp[name]["bias"])),
                eps=cfg.ln_eps,
            )

        y = ln("ln1", xt)
        q = lin("q", y).view(2, 6, 2, 8).transpose(1, 2)
        k = lin("k", y).view(2, 6, 2, 8).transpose(1, 2)
        v = lin("v", y).view(2, 6, 2, 8).transpose(1, 2)
        attn = torch.nn.functional.scaled_dot_product_attention(q, k, v, is_causal=True)
        attn = attn.transpose(1, 2).reshape(2, 6, 16)
        xt = xt + lin("o", attn)
        y = ln("ln2", xt)
        h = lin("fc1", y)
        h = h * torch.sigmoid(1.702 * h)
        ref = (xt + lin("fc2", h)).numpy()
        np.testing.assert_allclose(got, ref, atol=2e-4)


class TestConditioner:
    CFG = ConditionerConfig(clip_l=TINY_CLIP, open_clip=TINY_BIGG, size_outdim=8)

    def _batch(self, b, n):
        def toks(m):
            return jnp.zeros((m, 16), jnp.int32).at[:, 1].set(7)

        return {
            "tokens_clip": toks(b),
            "tokens_open": toks(b),
            "original_size": jnp.full((b, 2), 512.0),
            "crop_coords": jnp.zeros((b, 2)),
            "target_size": jnp.full((b, 2), 512.0),
            "tokens_clip_ref": toks(b * n),
            "tokens_open_ref": toks(b * n),
            "original_size_ref": jnp.full((b * n, 2), 512.0),
            "crop_coords_ref": jnp.zeros((b * n, 2)),
            "target_size_ref": jnp.full((b * n, 2), 512.0),
        }

    def test_shapes_and_layout(self):
        b, n = 2, 3
        p = init_conditioner_params(jax.random.PRNGKey(0), self.CFG)
        out = apply_conditioner(p, self._batch(b, n), self.CFG)
        d_cross = TINY_CLIP.width + TINY_BIGG.width
        d_vec = TINY_BIGG.width + 3 * 2 * 8
        assert out["crossattn"].shape == ((1 + n) * b, 16, d_cross)
        assert out["vector"].shape == ((1 + n) * b, d_vec)
        # same tokens everywhere -> target rows == ref rows
        np.testing.assert_allclose(
            np.asarray(out["crossattn"][:b]),
            np.asarray(out["crossattn"][b : 2 * b]),
            atol=1e-5,
        )

    def test_no_ref(self):
        b = 2
        p = init_conditioner_params(jax.random.PRNGKey(0), self.CFG)
        out = apply_conditioner(p, self._batch(b, 1), self.CFG, ref=False)
        assert out["crossattn"].shape[0] == b

    def test_uc_zeroing(self):
        b = 1
        p = init_conditioner_params(jax.random.PRNGKey(0), self.CFG)
        c, uc = get_unconditional_conditioning(
            p, self._batch(b, 1), cfg=self.CFG, ref=False
        )
        assert not np.allclose(np.asarray(c["crossattn"]), 0)
        np.testing.assert_allclose(np.asarray(uc["crossattn"]), 0.0)
        # size-tuple part of the vector survives zeroing
        assert not np.allclose(np.asarray(uc["vector"]), 0)
        np.testing.assert_allclose(np.asarray(uc["vector"][:, :TINY_BIGG.width]), 0.0)

    def test_size_embedding(self):
        e = embed_size_tuple(jnp.asarray([[512.0, 640.0]]), 8)
        assert e.shape == (1, 16)
        # matches per-coordinate timestep embedding layout
        from custom_diffusion360_tpu.models.nn import timestep_embedding

        ref = np.concatenate(
            [
                np.asarray(timestep_embedding(jnp.asarray([512.0]), 8)),
                np.asarray(timestep_embedding(jnp.asarray([640.0]), 8)),
            ],
            axis=-1,
        )
        np.testing.assert_allclose(np.asarray(e), ref, atol=1e-6)


class TestTokenizer:
    def test_roundtrip_synthetic(self):
        tok = make_test_tokenizer(["hello", "world"], context_length=12)
        ids = tok("Hello world")
        assert ids.shape == (1, 12)
        assert ids[0, 0] == tok.sot
        text = tok.decode(ids[0])
        assert "hello" in text and "world" in text

    def test_special_token_appended(self):
        tok = make_test_tokenizer(
            ["photo"], additional_special_tokens=("<new1>",), context_length=12
        )
        assert tok.encoder["<new1>"] == tok.base_vocab_size
        ids = tok("photo of <new1>")
        assert tok.base_vocab_size in ids

    def test_padding_styles(self):
        tok_oc = make_test_tokenizer(["hi"], context_length=8, pad_style="open_clip")
        tok_hf = make_test_tokenizer(["hi"], context_length=8, pad_style="hf")
        assert tok_oc("hi")[0, -1] == 0
        assert tok_hf("hi")[0, -1] == tok_hf.eot

    def test_truncation_forces_eot(self):
        tok = make_test_tokenizer(["a"], context_length=4)
        ids = tok("a a a a a a a a")
        assert ids.shape == (1, 4)
        assert ids[0, -1] == tok.eot
