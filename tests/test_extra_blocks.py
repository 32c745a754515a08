"""Parity tests for the remaining sgm blocks (extra_blocks.py) vs inline
torch re-derivations. Reference: sgm/modules/attention.py:124-189,640-681;
sgm/modules/diffusionmodules/model.py:26-44,312-485;
openaimodel.py:167-180; distributions/distributions.py:75-102."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_diffusion360_tpu.models.extra_blocks import (
    DDPMModelConfig,
    ddpm_model_apply,
    ddpm_timestep_embedding,
    dirac_sample,
    init_ddpm_model_params,
    init_linear_attention,
    init_single_layer_block,
    init_spatial_self_attention,
    init_transposed_upsample,
    linear_attention_apply,
    normal_kl,
    single_layer_block_apply,
    spatial_self_attention_apply,
    transposed_upsample_apply,
)

torch = pytest.importorskip("torch")


def _np(a):
    return np.asarray(a, dtype=np.float32)


def test_ddpm_timestep_embedding_matches_torch():
    t = np.asarray([0.0, 5.0, 999.0], np.float32)
    ours = _np(ddpm_timestep_embedding(jnp.asarray(t), 64))
    half = 32
    emb = math.log(10000) / (half - 1)
    emb = torch.exp(torch.arange(half, dtype=torch.float32) * -emb)
    emb = torch.tensor(t)[:, None] * emb[None, :]
    ref = torch.cat([torch.sin(emb), torch.cos(emb)], dim=1).numpy()
    # f32 exp/trig rounding differs slightly between backends at t=999
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-4)


def test_linear_attention_matches_torch():
    p = init_linear_attention(jax.random.PRNGKey(0), dim=16, heads=4,
                              dim_head=8)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 4, 4, 16)).astype(np.float32)
    ours = _np(linear_attention_apply(p, jnp.asarray(x), heads=4))

    xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
    wqkv = torch.tensor(_np(p["to_qkv"]["w"]))  # (16, 96)
    qkv = torch.einsum("bchw,cd->bdhw", xt, wqkv)
    b, _, h, w = qkv.shape
    qkv = qkv.reshape(b, 3, 4, 8, h * w)
    q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]  # (b, heads, c, n)
    k = k.softmax(dim=-1)
    context = torch.einsum("bhdn,bhen->bhde", k, v)
    out = torch.einsum("bhde,bhdn->bhen", context, q)
    out = out.reshape(b, 32, h, w)
    ref = torch.einsum("bchw,cd->bdhw", out,
                       torch.tensor(_np(p["to_out"]["w"])))
    ref = ref + torch.tensor(_np(p["to_out"]["b"]))[None, :, None, None]
    np.testing.assert_allclose(
        ours, np.transpose(ref.numpy(), (0, 2, 3, 1)), rtol=1e-4, atol=1e-5
    )


def test_spatial_self_attention_matches_torch():
    p = init_spatial_self_attention(jax.random.PRNGKey(1), 32)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 4, 4, 32)).astype(np.float32)
    ours = _np(spatial_self_attention_apply(p, jnp.asarray(x)))

    xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
    hn = torch.nn.functional.group_norm(
        xt, 32, torch.tensor(_np(p["norm"]["scale"])),
        torch.tensor(_np(p["norm"]["bias"])), 1e-6,
    )

    def lin1x1(name, t):
        w = torch.tensor(_np(p[name]["w"]))
        y = torch.einsum("bchw,cd->bdhw", t, w)
        return y + torch.tensor(_np(p[name]["b"]))[None, :, None, None]

    q, k, v = lin1x1("q", hn), lin1x1("k", hn), lin1x1("v", hn)
    b, c, h, w = q.shape
    qf = q.reshape(b, c, -1).permute(0, 2, 1)
    kf = k.reshape(b, c, -1)
    w_ = torch.softmax(torch.bmm(qf, kf) * c**-0.5, dim=2)
    vf = v.reshape(b, c, -1)
    h_ = torch.bmm(vf, w_.permute(0, 2, 1)).reshape(b, c, h, w)
    ref = xt + lin1x1("proj_out", h_)
    np.testing.assert_allclose(
        ours, np.transpose(ref.numpy(), (0, 2, 3, 1)), rtol=1e-3, atol=1e-4
    )


def test_single_layer_block_residuals():
    """attn1(norm1(x), ctx) + x then ff(norm2(x)) + x
    (attention.py:678-681)."""
    p = init_single_layer_block(jax.random.PRNGKey(2), dim=32, n_heads=4,
                                d_head=8, context_dim=16)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 9, 32)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(2, 5, 16)), jnp.float32)
    out = single_layer_block_apply(p, x, ctx, n_heads=4)
    assert out.shape == x.shape and np.isfinite(_np(out)).all()
    # self-attention mode (context=None)
    p2 = init_single_layer_block(jax.random.PRNGKey(3), dim=32, n_heads=4,
                                 d_head=8)
    out2 = single_layer_block_apply(p2, x, None, n_heads=4)
    assert out2.shape == x.shape


def test_transposed_upsample_matches_torch():
    p = init_transposed_upsample(jax.random.PRNGKey(4), channels=8,
                                 out_channels=6)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 5, 5, 8)).astype(np.float32)
    ours = _np(transposed_upsample_apply(p, jnp.asarray(x)))
    assert ours.shape == (2, 13, 13, 6)  # 2*in + ks - 2

    # torch ConvTranspose2d weight is (in, out, kh, kw); ours (kh, kw, O, I)
    w = torch.tensor(np.transpose(_np(p["w"]), (3, 2, 0, 1)))
    ref = torch.nn.functional.conv_transpose2d(
        torch.tensor(np.transpose(x, (0, 3, 1, 2))), w,
        torch.tensor(_np(p["b"])), stride=2,
    )
    np.testing.assert_allclose(
        ours, np.transpose(ref.numpy(), (0, 2, 3, 1)), rtol=1e-4, atol=1e-5
    )


def test_ddpm_model_matches_torch():
    cfg = DDPMModelConfig(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                          attn_resolutions=(8,), in_channels=3, resolution=16)
    params = init_ddpm_model_params(jax.random.PRNGKey(5), cfg)
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    t = np.asarray([3.0, 77.0], np.float32)
    ours = _np(ddpm_model_apply(params, jnp.asarray(x), jnp.asarray(t),
                                cfg=cfg))
    assert ours.shape == (2, 16, 16, 3)

    # --- inline torch re-derivation of Model.forward (model.py:434-481) ---
    def conv(p, t_, stride=1, padding=1):
        w = torch.tensor(np.transpose(_np(p["w"]), (3, 2, 0, 1)))
        return torch.nn.functional.conv2d(
            t_, w, torch.tensor(_np(p["b"])), stride=stride, padding=padding)

    def gn(p, t_):
        return torch.nn.functional.group_norm(
            t_, 32, torch.tensor(_np(p["scale"])),
            torch.tensor(_np(p["bias"])), 1e-6)

    def swish(t_):
        return t_ * torch.sigmoid(t_)

    def lin(p, t_):
        return t_ @ torch.tensor(_np(p["w"])) + torch.tensor(_np(p["b"]))

    def res(p, t_, temb):
        h = conv(p["conv1"], swish(gn(p["norm1"], t_)))
        h = h + lin(p["temb_proj"], swish(temb))[:, :, None, None]
        h = conv(p["conv2"], swish(gn(p["norm2"], h)))
        if "nin_shortcut" in p:
            t_ = conv(p["nin_shortcut"], t_, padding=0)
        return t_ + h

    def attn(p, t_):
        hn = gn(p["norm"], t_)

        def l1(name, u):
            w = torch.tensor(_np(p[name]["w"]))
            y = torch.einsum("bchw,cd->bdhw", u, w)
            return y + torch.tensor(_np(p[name]["b"]))[None, :, None, None]

        q, k, v = l1("q", hn), l1("k", hn), l1("v", hn)
        b, c, hh, ww = q.shape
        qf = q.reshape(b, c, -1).permute(0, 2, 1)
        w_ = torch.softmax(torch.bmm(qf, k.reshape(b, c, -1)) * c**-0.5, 2)
        h_ = torch.bmm(v.reshape(b, c, -1),
                       w_.permute(0, 2, 1)).reshape(b, c, hh, ww)
        return t_ + l1("proj_out", h_)

    half = 16
    emb = math.log(10000) / (half - 1)
    emb = torch.exp(torch.arange(half, dtype=torch.float32) * -emb)
    emb = torch.tensor(t)[:, None] * emb[None, :]
    temb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=1)
    temb = lin(params["temb"]["dense1"],
               swish(lin(params["temb"]["dense0"], temb)))

    xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
    hs = [conv(params["conv_in"], xt)]
    for i, lvl in enumerate(params["down"]):
        for j, bp in enumerate(lvl["block"]):
            h = res(bp, hs[-1], temb)
            if lvl["attn"]:
                h = attn(lvl["attn"][j], h)
            hs.append(h)
        if "downsample" in lvl:
            padded = torch.nn.functional.pad(hs[-1], (0, 1, 0, 1))
            hs.append(conv(lvl["downsample"], padded, stride=2, padding=0))
    h = res(params["mid"]["block_1"], hs[-1], temb)
    h = attn(params["mid"]["attn_1"], h)
    h = res(params["mid"]["block_2"], h, temb)
    for i in reversed(range(2)):
        lvl = params["up"][i]
        for j, bp in enumerate(lvl["block"]):
            h = res(bp, torch.cat([h, hs.pop()], dim=1), temb)
            if lvl["attn"]:
                h = attn(lvl["attn"][j], h)
        if "upsample" in lvl:
            h = torch.nn.functional.interpolate(h, scale_factor=2.0,
                                                mode="nearest")
            h = conv(lvl["upsample"], h)
    ref = conv(params["conv_out"], swish(gn(params["norm_out"], h)))
    np.testing.assert_allclose(
        ours, np.transpose(ref.numpy(), (0, 2, 3, 1)), rtol=2e-2, atol=2e-4
    )


def test_dirac_and_normal_kl():
    x = jnp.arange(4.0)
    np.testing.assert_array_equal(_np(dirac_sample(x)), _np(x))
    # KL(N(0,1) || N(0,1)) = 0
    z = jnp.zeros(3)
    np.testing.assert_allclose(_np(normal_kl(z, z, z, z)), 0.0, atol=1e-7)
    # vs torch re-derivation (distributions.py:96-102)
    rng = np.random.default_rng(5)
    m1, lv1, m2, lv2 = (rng.normal(size=4).astype(np.float32)
                        for _ in range(4))
    ours = _np(normal_kl(*(jnp.asarray(a) for a in (m1, lv1, m2, lv2))))
    t1, tl1, t2, tl2 = map(torch.tensor, (m1, lv1, m2, lv2))
    ref = 0.5 * (-1.0 + tl2 - tl1 + torch.exp(tl1 - tl2)
                 + ((t1 - t2) ** 2) * torch.exp(-tl2))
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5, atol=1e-6)
