"""Auxiliary embedder parity and behavior tests.

Reference: sgm/modules/encoders/modules.py (IdentityEncoder, ClassEmbedder,
FrozenOpenCLIPEmbedder2, FrozenOpenCLIPImageEmbedder, FrozenCLIPT5Encoder,
SpatialRescaler, LowScaleEncoder, GaussianEncoder).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_diffusion360_tpu.models.clip import (
    ClipTextConfig,
    ClipVisionConfig,
    clip_text_apply,
    clip_vision_apply,
    init_clip_text_params,
    init_clip_vision_params,
    load_clip_vision_torch,
)
from custom_diffusion360_tpu.models.embedders import (
    class_embedder_apply,
    class_embedder_init,
    class_embedder_multi_cond_apply,
    class_embedder_uc,
    clip_t5_encode,
    gaussian_encoder,
    identity_encoder,
    low_scale_encode,
    LowScaleConfig,
    make_linear_beta_schedule,
    open_clip_embedder2,
    open_clip_image_embedder,
    spatial_rescaler,
    spatial_rescaler_init,
)
from custom_diffusion360_tpu.models.t5 import T5Config, init_t5_params
from custom_diffusion360_tpu.models.vae import VAEConfig, init_vae_params

torch = pytest.importorskip("torch")

TINY_TEXT = ClipTextConfig(vocab_size=64, width=32, layers=3, heads=4,
                           context_length=16, text_projection=True)
TINY_VISION = ClipVisionConfig(image_size=16, patch_size=8, width=32,
                               layers=2, heads=4, embed_dim=12,
                               act="quick_gelu")
TINY_VAE = VAEConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1)


def test_identity_and_class_embedder():
    x = jnp.arange(6.0)
    np.testing.assert_array_equal(np.asarray(identity_encoder(x)),
                                  np.asarray(x))
    p = class_embedder_init(jax.random.PRNGKey(0), embed_dim=8, n_classes=10)
    c = jnp.asarray([1, 3])
    out = class_embedder_apply(p, c)
    assert out.shape == (2, 8)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(p["embedding"])[np.asarray(c)]
    )
    assert class_embedder_apply(p, c, add_sequence_dim=True).shape == (2, 1, 8)
    np.testing.assert_array_equal(np.asarray(class_embedder_uc(10, 3)),
                                  [9, 9, 9])
    batch = {"cls": [c], "other": "keep"}
    out_b = class_embedder_multi_cond_apply(p, batch, "cls")
    assert isinstance(out_b["cls"], list) and out_b["cls"][0].shape == (2, 8)
    assert out_b["other"] == "keep"


def test_open_clip_embedder2_layers():
    """Layer/legacy semantics (modules.py:567-601) vs the tower outputs."""
    from custom_diffusion360_tpu.models.nn import layer_norm

    params = init_clip_text_params(jax.random.PRNGKey(1), TINY_TEXT)
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, 60, (2, 16)), jnp.int32
    )
    outs = clip_text_apply(params, tokens, TINY_TEXT)

    legacy_pen = open_clip_embedder2(params, tokens, TINY_TEXT,
                                     layer="penultimate", legacy=True)
    np.testing.assert_allclose(
        np.asarray(legacy_pen),
        np.asarray(layer_norm(params["ln_final"], outs["penultimate"],
                              eps=TINY_TEXT.ln_eps)),
        rtol=1e-6,
    )
    z, pooled = open_clip_embedder2(params, tokens, TINY_TEXT, layer="last",
                                    legacy=False, return_pooled=True)
    np.testing.assert_allclose(np.asarray(z), np.asarray(outs["final"]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(outs["pooled"]),
                               rtol=1e-6)
    pen = open_clip_embedder2(params, tokens, TINY_TEXT, layer="penultimate",
                              legacy=False)
    np.testing.assert_allclose(np.asarray(pen),
                               np.asarray(outs["penultimate"]), rtol=1e-6)


def test_clip_vision_matches_hf():
    """Vision tower vs HuggingFace CLIPVisionModelWithProjection (random
    weights, hf naming importer)."""
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=16, patch_size=8,
        projection_dim=12, hidden_act="quick_gelu",
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    model = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()
    params = load_clip_vision_torch(model.state_dict(), TINY_VISION,
                                    naming="hf")
    rng = np.random.default_rng(1)
    img = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    ours = np.asarray(clip_vision_apply(params, jnp.asarray(img), TINY_VISION))
    with torch.no_grad():
        ref = model(
            pixel_values=torch.tensor(np.transpose(img, (0, 3, 1, 2)))
        ).image_embeds.numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-4)


def test_clip_vision_open_clip_naming_roundtrip():
    """The open_clip-naming importer reproduces a params tree exactly
    (synthesized fused in_proj keys)."""
    params = init_clip_vision_params(jax.random.PRNGKey(2), TINY_VISION)
    blocks = params["blocks"]
    sd = {
        "visual.conv1.weight": np.transpose(
            np.asarray(params["patch_embed"]), (3, 2, 0, 1)
        ),
        "visual.class_embedding": np.asarray(params["class_embedding"]),
        "visual.positional_embedding": np.asarray(
            params["positional_embedding"]
        ),
        "visual.ln_pre.weight": np.asarray(params["ln_pre"]["scale"]),
        "visual.ln_pre.bias": np.asarray(params["ln_pre"]["bias"]),
        "visual.ln_post.weight": np.asarray(params["ln_post"]["scale"]),
        "visual.ln_post.bias": np.asarray(params["ln_post"]["bias"]),
        "visual.proj": np.asarray(params["proj"]),
    }
    for i in range(TINY_VISION.layers):
        pre = f"visual.transformer.resblocks.{i}"
        wq = np.asarray(blocks["q"]["w"][i]).T
        wk = np.asarray(blocks["k"]["w"][i]).T
        wv = np.asarray(blocks["v"]["w"][i]).T
        sd[f"{pre}.attn.in_proj_weight"] = np.concatenate([wq, wk, wv], 0)
        sd[f"{pre}.attn.in_proj_bias"] = np.concatenate([
            np.asarray(blocks["q"]["b"][i]), np.asarray(blocks["k"]["b"][i]),
            np.asarray(blocks["v"]["b"][i]),
        ])
        sd[f"{pre}.attn.out_proj.weight"] = np.asarray(blocks["o"]["w"][i]).T
        sd[f"{pre}.attn.out_proj.bias"] = np.asarray(blocks["o"]["b"][i])
        for ln, theirs in (("ln1", "ln_1"), ("ln2", "ln_2")):
            sd[f"{pre}.{theirs}.weight"] = np.asarray(blocks[ln]["scale"][i])
            sd[f"{pre}.{theirs}.bias"] = np.asarray(blocks[ln]["bias"][i])
        sd[f"{pre}.mlp.c_fc.weight"] = np.asarray(blocks["fc1"]["w"][i]).T
        sd[f"{pre}.mlp.c_fc.bias"] = np.asarray(blocks["fc1"]["b"][i])
        sd[f"{pre}.mlp.c_proj.weight"] = np.asarray(blocks["fc2"]["w"][i]).T
        sd[f"{pre}.mlp.c_proj.bias"] = np.asarray(blocks["fc2"]["b"][i])

    loaded = load_clip_vision_torch(sd, TINY_VISION, naming="open_clip")
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-6),
        params, loaded,
    )


def test_open_clip_image_embedder_modes():
    params = init_clip_vision_params(jax.random.PRNGKey(3), TINY_VISION)
    img = jnp.asarray(
        np.random.default_rng(2).uniform(-1, 1, (3, 20, 20, 3)), jnp.float32
    )
    z = open_clip_image_embedder(params, img, TINY_VISION)
    assert z.shape == (3, 12)
    z_seq = open_clip_image_embedder(params, img, TINY_VISION,
                                     unsqueeze_dim=True)
    assert z_seq.shape == (3, 1, 12)
    rep, pooled = open_clip_image_embedder(params, img, TINY_VISION,
                                           repeat_to_max_len=True,
                                           max_length=7)
    assert rep.shape == (3, 7, 12)
    np.testing.assert_array_equal(np.asarray(rep[:, 0]), np.asarray(pooled))
    tokens, z_tok = open_clip_image_embedder(params, img, TINY_VISION,
                                             output_tokens=True)
    assert tokens.shape == (3, 4, 32) and z_tok.shape == (3, 12)
    # ucg dropout zeroes whole rows deterministically under a key
    zd = open_clip_image_embedder(params, img, TINY_VISION,
                                  key=jax.random.PRNGKey(0), ucg_rate=0.5)
    row_zero = np.all(np.asarray(zd) == 0, axis=-1)
    row_same = np.all(np.isclose(np.asarray(zd), np.asarray(z)), axis=-1)
    assert np.all(row_zero | row_same)


def test_clip_t5_encode_shapes():
    clip_p = init_clip_text_params(jax.random.PRNGKey(4), TINY_TEXT)
    t5_cfg = T5Config(vocab_size=60, d_model=16, d_kv=4, d_ff=32,
                      num_layers=2, num_heads=4)
    t5_p = init_t5_params(jax.random.PRNGKey(5), t5_cfg)
    rng = np.random.default_rng(3)
    ct = jnp.asarray(rng.integers(0, 60, (2, 16)), jnp.int32)
    tt = jnp.asarray(rng.integers(0, 60, (2, 9)), jnp.int32)
    clip_z, t5_z = clip_t5_encode(clip_p, t5_p, ct, tt, TINY_TEXT, t5_cfg)
    assert clip_z.shape == (2, 16, 32) and t5_z.shape == (2, 9, 16)


def test_spatial_rescaler_matches_torch():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 8, 8, 5)).astype(np.float32)
    xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))

    # nearest downsample: exact
    ours = np.asarray(spatial_rescaler(jnp.asarray(x), method="nearest"))
    ref = torch.nn.functional.interpolate(xt, scale_factor=0.5,
                                          mode="nearest").numpy()
    np.testing.assert_allclose(ours, np.transpose(ref, (0, 2, 3, 1)),
                               rtol=1e-6)

    # area downsample: exact (2x2 mean)
    ours = np.asarray(spatial_rescaler(jnp.asarray(x), method="area"))
    ref = torch.nn.functional.interpolate(xt, scale_factor=0.5,
                                          mode="area").numpy()
    np.testing.assert_allclose(ours, np.transpose(ref, (0, 2, 3, 1)),
                               rtol=1e-5)

    # bilinear upsample (no antialias path): torch align_corners=False
    ours = np.asarray(spatial_rescaler(jnp.asarray(x), method="bilinear",
                                       multiplier=2.0))
    ref = torch.nn.functional.interpolate(xt, scale_factor=2.0,
                                          mode="bilinear").numpy()
    np.testing.assert_allclose(ours, np.transpose(ref, (0, 2, 3, 1)),
                               rtol=1e-4, atol=1e-5)

    # two stages + channel mapper
    p = spatial_rescaler_init(jax.random.PRNGKey(6), in_channels=5,
                              out_channels=3)
    out = spatial_rescaler(jnp.asarray(x), n_stages=2, method="nearest",
                           params=p)
    assert out.shape == (2, 2, 2, 3)


def test_linear_beta_schedule_matches_reference():
    """make_beta_schedule("linear") re-derivation
    (diffusionmodules/util.py)."""
    betas = np.asarray(make_linear_beta_schedule(100, 1e-4, 2e-2))
    ref = np.linspace(1e-4**0.5, 2e-2**0.5, 100, dtype=np.float64) ** 2
    np.testing.assert_allclose(betas, ref.astype(np.float32), rtol=1e-6)


def test_low_scale_encoder_and_gaussian_encoder():
    vae_p = init_vae_params(jax.random.PRNGKey(7), TINY_VAE)
    x = jnp.asarray(
        np.random.default_rng(5).uniform(-1, 1, (2, 16, 16, 3)), jnp.float32
    )
    cfg = LowScaleConfig(output_size=4, max_noise_level=50)
    z, level = low_scale_encode(vae_p, x, jax.random.PRNGKey(8), cfg,
                                TINY_VAE)
    assert z.shape == (2, 4, 4, 4)
    lv = np.asarray(level)
    assert lv.shape == (2,) and (lv >= 0).all() and (lv < 50).all()

    log, zt = gaussian_encoder(vae_p, x, jax.random.PRNGKey(9),
                               vae_cfg=TINY_VAE)
    assert zt.shape == (2, 64, 4)
    assert "kl_loss" in log and log["loss"] is log["kl_loss"]
    assert log["weight"] == 1.0
    _, z4 = gaussian_encoder(vae_p, x, jax.random.PRNGKey(9),
                             flatten_output=False, vae_cfg=TINY_VAE)
    assert z4.shape == (2, 8, 8, 4)
