"""EncoderUNetModel parity vs an inline torch re-derivation (random weights).

Reference: sgm/modules/diffusionmodules/openaimodel.py — EncoderUNetModel
(:1102-1304), AttentionBlock (:379-427), QKVAttention(Legacy) (:450-513),
AttentionPool2d (:29-58), NoTimeUNetModel (:1096-1099).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_diffusion360_tpu.models.encoder_unet import (
    EncoderUNetConfig,
    attention_block_apply,
    attention_block_init,
    attention_pool2d_apply,
    attention_pool2d_init,
    encoder_unet_apply,
    init_encoder_unet_params,
    qkv_attention,
)

torch = pytest.importorskip("torch")

CFG = EncoderUNetConfig(
    image_size=8,
    in_channels=3,
    model_channels=32,
    out_channels=5,
    num_res_blocks=1,
    attention_resolutions=(2,),
    channel_mult=(1, 2),
    num_heads=2,
    num_head_channels=16,
)


def _np(a):
    return np.asarray(a, dtype=np.float32)


def _t_lin(p, x):
    return x @ torch.tensor(_np(p["w"])) + torch.tensor(_np(p["b"]))


def _t_conv(p, x, stride=1, padding=1):
    w = torch.tensor(np.transpose(_np(p["w"]), (3, 2, 0, 1)))
    return torch.nn.functional.conv2d(
        x, w, torch.tensor(_np(p["b"])), stride=stride, padding=padding
    )


def _t_gn(p, x, eps=1e-5):
    return torch.nn.functional.group_norm(
        x, 32, torch.tensor(_np(p["scale"])), torch.tensor(_np(p["bias"])),
        eps,
    )


def _t_silu(x):
    return torch.nn.functional.silu(x)


def _t_res(p, x, emb):
    """ResBlock (openaimodel.py:233-376, no scale-shift, no up/down)."""
    h = _t_conv(p["conv_in"], _t_silu(_t_gn(p["norm_in"], x)))
    h = h + _t_lin(p["emb"], _t_silu(emb))[:, :, None, None]
    h = _t_conv(p["conv_out"], _t_silu(_t_gn(p["norm_out"], h)))
    skip = _t_conv(p["skip"], x, padding=0) if "skip" in p else x
    return skip + h


def _t_qkv_attn(qkv, n_heads, legacy=True):
    """QKVAttentionLegacy/QKVAttention (openaimodel.py:459-509);
    qkv: (B, width, T)."""
    bs, width, length = qkv.shape
    ch = width // (3 * n_heads)
    if legacy:
        q, k, v = qkv.reshape(bs * n_heads, ch * 3, length).split(ch, dim=1)
    else:
        q, k, v = qkv.chunk(3, dim=1)
        q = q.reshape(bs * n_heads, ch, length)
        k = k.reshape(bs * n_heads, ch, length)
        v = v.reshape(bs * n_heads, ch, length)
    scale = 1 / math.sqrt(math.sqrt(ch))
    w = torch.einsum("bct,bcs->bts", q * scale, k * scale)
    w = torch.softmax(w.float(), dim=-1).type(w.dtype)
    a = torch.einsum("bts,bcs->bct", w, v)
    return a.reshape(bs, -1, length)


def _t_attn_block(p, x, n_heads, legacy=True):
    b, c, h, w = x.shape
    xt = x.reshape(b, c, -1)
    # our qkv linear (C, 3C) == torch conv1d weight (3C, C, 1)
    qkv = torch.einsum(
        "bct,cd->bdt", _t_gn(p["norm"], xt.reshape(b, c, h, w)).reshape(b, c, -1),
        torch.tensor(_np(p["qkv"]["w"])),
    ) + torch.tensor(_np(p["qkv"]["b"]))[None, :, None]
    a = _t_qkv_attn(qkv, n_heads, legacy)
    out = torch.einsum("bct,cd->bdt", a, torch.tensor(_np(p["proj_out"]["w"])))
    out = out + torch.tensor(_np(p["proj_out"]["b"]))[None, :, None]
    return (xt + out).reshape(b, c, h, w)


def test_qkv_attention_both_orders():
    rng = np.random.default_rng(0)
    qkv = rng.normal(size=(2, 7, 3 * 4 * 8)).astype(np.float32)
    for legacy in (True, False):
        ours = _np(qkv_attention(jnp.asarray(qkv), 4, legacy=legacy))
        ref = _t_qkv_attn(
            torch.tensor(np.transpose(qkv, (0, 2, 1))), 4, legacy
        ).numpy()
        np.testing.assert_allclose(
            ours, np.transpose(ref, (0, 2, 1)), rtol=1e-4, atol=1e-5
        )


def test_attention_block_matches_torch():
    p = attention_block_init(jax.random.PRNGKey(0), 64)
    # zero-init proj_out would hide ordering bugs; randomize it
    p["proj_out"]["w"] = jax.random.normal(jax.random.PRNGKey(1), (64, 64)) * 0.1
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 4, 4, 64)).astype(np.float32)
    for new_order in (False, True):
        ours = _np(attention_block_apply(
            p, jnp.asarray(x), num_heads=4, use_new_attention_order=new_order
        ))
        ref = _t_attn_block(
            p, torch.tensor(np.transpose(x, (0, 3, 1, 2))), 4,
            legacy=not new_order,
        ).numpy()
        np.testing.assert_allclose(
            ours, np.transpose(ref, (0, 2, 3, 1)), rtol=1e-3, atol=1e-4
        )


def test_attention_pool2d_matches_torch():
    p = attention_pool2d_init(jax.random.PRNGKey(2), spacial_dim=4,
                              embed_dim=32, output_dim=6)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 4, 4, 32)).astype(np.float32)
    ours = _np(attention_pool2d_apply(p, jnp.asarray(x), 8))

    # torch AttentionPool2d.forward (:50-58)
    xt = torch.tensor(np.transpose(x, (0, 3, 1, 2))).reshape(2, 32, -1)
    xt = torch.cat([xt.mean(dim=-1, keepdim=True), xt], dim=-1)
    xt = xt + torch.tensor(_np(p["pos"]).T)[None]
    qkv = torch.einsum("bct,cd->bdt", xt, torch.tensor(_np(p["qkv"]["w"])))
    qkv = qkv + torch.tensor(_np(p["qkv"]["b"]))[None, :, None]
    a = _t_qkv_attn(qkv, 32 // 8, legacy=False)
    out = torch.einsum("bct,cd->bdt", a, torch.tensor(_np(p["proj"]["w"])))
    out = out + torch.tensor(_np(p["proj"]["b"]))[None, :, None]
    np.testing.assert_allclose(ours, out[:, :, 0].numpy(), rtol=1e-3,
                               atol=1e-4)


@pytest.mark.parametrize("pool", ["adaptive", "attention", "spatial",
                                  "spatial_v2"])
def test_encoder_unet_matches_torch(pool):
    cfg = EncoderUNetConfig(**{**CFG.__dict__, "pool": pool})
    params = init_encoder_unet_params(jax.random.PRNGKey(4), cfg)
    if pool == "adaptive":  # zero head hides bugs; randomize
        params["out"]["conv"]["w"] = (
            jax.random.normal(jax.random.PRNGKey(5), (1, 1, 64, 5)) * 0.1
        )
    rng = np.random.default_rng(6)
    x = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    t = np.asarray([3.0, 11.0], np.float32)
    ours = _np(encoder_unet_apply(params, jnp.asarray(x), jnp.asarray(t), cfg))

    # --- inline torch re-derivation (forward, :1281-1304) ---
    half = cfg.model_channels // 2
    freqs = torch.exp(
        -math.log(10000) * torch.arange(half, dtype=torch.float32) / half
    )
    args = torch.tensor(t)[:, None] * freqs[None]
    temb = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
    emb = _t_lin(params["time_embed"]["l2"],
                 _t_silu(_t_lin(params["time_embed"]["l1"], temb)))

    h = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
    results = []
    from custom_diffusion360_tpu.models.encoder_unet import _build_spec

    blocks, _, _, _ = _build_spec(cfg)
    for block, bp in zip(blocks, params["input_blocks"]):
        for spec, p in zip(block, bp):
            if spec[0] == "conv_in":
                h = _t_conv(p, h)
            elif spec[0] == "res":
                h = _t_res(p, h, emb)
            elif spec[0] == "attn":
                h = _t_attn_block(p, h, cfg.num_heads)
            else:
                h = _t_conv(p, h, stride=2, padding=1)
        if pool.startswith("spatial"):
            results.append(h.mean(dim=(2, 3)))
    mid = params["middle_block"]
    h = _t_res(mid[0], h, emb)
    h = _t_attn_block(mid[1], h, cfg.num_heads)
    h = _t_res(mid[2], h, emb)

    out = params["out"]
    if pool == "adaptive":
        h = _t_silu(_t_gn(out["norm"], h))
        h = h.mean(dim=(2, 3), keepdim=True)
        ref = _t_conv(out["conv"], h, padding=0).flatten(1)
    elif pool == "attention":
        h = _t_silu(_t_gn(out["norm"], h))
        xt = h.reshape(2, 64, -1)
        xt = torch.cat([xt.mean(dim=-1, keepdim=True), xt], dim=-1)
        xt = xt + torch.tensor(_np(out["pool"]["pos"]).T)[None]
        qkv = torch.einsum("bct,cd->bdt", xt,
                           torch.tensor(_np(out["pool"]["qkv"]["w"])))
        qkv = qkv + torch.tensor(_np(out["pool"]["qkv"]["b"]))[None, :, None]
        a = _t_qkv_attn(qkv, 64 // cfg.num_head_channels, legacy=False)
        proj = torch.einsum("bct,cd->bdt", a,
                            torch.tensor(_np(out["pool"]["proj"]["w"])))
        proj = proj + torch.tensor(_np(out["pool"]["proj"]["b"]))[None, :, None]
        ref = proj[:, :, 0]
    else:
        results.append(h.mean(dim=(2, 3)))
        h = torch.cat(results, dim=-1)
        if pool == "spatial":
            ref = _t_lin(out["l2"], torch.relu(_t_lin(out["l1"], h)))
        else:
            h = _t_lin(out["l1"], h)
            h = _t_silu(torch.nn.functional.group_norm(
                h, 32, torch.tensor(_np(out["norm"]["scale"])),
                torch.tensor(_np(out["norm"]["bias"])), 1e-5))
            ref = _t_lin(out["l2"], h)

    np.testing.assert_allclose(ours, ref.numpy(), rtol=2e-2, atol=2e-4)


def test_no_time_unet_zeroes_timesteps():
    """NoTimeUNetModel forward == UNet forward at t=0 (:1096-1099)."""
    from custom_diffusion360_tpu.models.unet import (
        UNetConfig,
        init_unet_params,
        no_time_unet_apply,
        unet_apply,
    )

    cfg = UNetConfig(
        model_channels=32,
        channel_mult=(1, 2),
        transformer_depth=(1, 1),
        context_dim=32,
        adm_in_channels=16,
        num_head_channels=16,
        image_cross_blocks=(),
    )
    params = init_unet_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 4)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(1, 77, 32)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(1, 16)), jnp.float32)
    t = jnp.asarray([37.0], jnp.float32)

    got, _ = no_time_unet_apply(params, cfg, x, t, ctx, y)
    want, _ = unet_apply(params, cfg, x, jnp.zeros_like(t), ctx, y)
    np.testing.assert_array_equal(_np(got), _np(want))
