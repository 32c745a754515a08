import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_diffusion360_tpu.models.unet import (
    UNetConfig,
    build_unet_spec,
    init_unet_params,
    unet_apply,
)
from tests.test_cameras import random_cameras


def test_sdxl_spec_topology():
    """The SDXL config must produce 11 spatial transformers with the reference
    channel layout (SURVEY.md §2.2; openaimodel.py prints ids 0-10)."""
    cfg = UNetConfig()
    inb, mid, outb, n_attn = build_unet_spec(cfg)
    assert n_attn == 11
    attn_specs = [
        s for blk in inb + [mid] + outb for s in (blk if isinstance(blk, list) else [blk])
        if s[0] == "attn"
    ]
    # encoder ids 0-3 at 640/1280, middle id 4 at 1280, decoder ids 5-10
    chans = [s[1] for s in attn_specs]
    depths = [s[2] for s in attn_specs]
    assert chans == [640, 640, 1280, 1280, 1280, 1280, 1280, 1280, 640, 640, 640]
    assert depths == [2, 2, 10, 10, 10, 10, 10, 10, 2, 2, 2]
    # image-cross blocks: 6 of them -> 12 FeatureNeRF modules total
    cross = [s for s in attn_specs if s[3] in cfg.image_cross_blocks]
    n_nerf = sum(
        len([d for d in range(s[2]) if d % cfg.poscontrol_interval == 0]) for s in cross
    )
    assert n_nerf == 12


TINY = UNetConfig(
    in_channels=4,
    model_channels=64,
    out_channels=4,
    num_res_blocks=1,
    attention_resolutions=(2,),
    channel_mult=(1, 2),
    transformer_depth=(1, 1),
    context_dim=32,
    adm_in_channels=16,
    num_head_channels=32,
    image_cross_blocks=(0,),
    num_samples=4,
    num_freqs=4,
    rgb_predict=True,
    use_prev_weights_imp_sample=True,
    stratified=True,
)


@pytest.fixture(scope="module")
def tiny_params():
    return init_unet_params(jax.random.PRNGKey(0), TINY)


def _tiny_inputs(b=1, n=2, res=16):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, res, res, 4)).astype(np.float32))
    xr = jnp.asarray(rng.normal(size=(b, n, res, res, 4)).astype(np.float32))
    t = jnp.full((b,), 500.0)
    ctx = jnp.asarray(rng.normal(size=((1 + n) * b, 77, 32)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=((1 + n) * b, 16)).astype(np.float32))
    cams = random_cameras((1 + n) * b, seed=1).reshape(b, 1 + n)
    return x, xr, t, ctx, y, cams


def test_unet_plain_forward(tiny_params):
    x, _, t, ctx, y, _ = _tiny_inputs()
    out, aux = unet_apply(tiny_params, TINY, x, t, ctx[:1], y[:1])
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    assert aux["fg_mask_list"] == [] and aux["rendered"] == {}


def test_unet_dual_stream_forward(tiny_params):
    x, xr, t, ctx, y, cams = _tiny_inputs()
    out, aux = unet_apply(
        tiny_params, TINY, x, t, ctx, y,
        input_ref=xr, sigmas_ref=jnp.full((1,), 10.0), cams=cams,
        key=jax.random.PRNGKey(1), training=True,
    )
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    # tiny config: image_cross at attn_id 0 only, depth 1 -> 1 NeRF eval
    assert len(aux["fg_mask_list"]) == 1
    assert len(aux["rgb_list"]) == 1
    assert aux["fg_mask_list"][0].shape == (1, 64, 1)  # 8x8 tokens at ds=2
    assert aux["rgb_list"][0].shape == (1, 64, 3)
    assert 0 in aux["rendered"] and 0 in aux["rendered"][0]


def test_unet_nerf_cache_path(tiny_params):
    """With a rendered-feature cache, the ref stream is skipped and the output
    matches a recomputation using the same rendered features."""
    x, xr, t, ctx, y, cams = _tiny_inputs()
    key = jax.random.PRNGKey(1)
    out1, aux = unet_apply(
        tiny_params, TINY, x, t, ctx, y,
        input_ref=xr, sigmas_ref=jnp.full((1,), 10.0), cams=cams,
        key=key, training=False,
    )
    caches = aux["rendered"]
    out2, aux2 = unet_apply(
        tiny_params, TINY, x, t, ctx, y, nerf_caches=caches,
    )
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-4)


def test_unet_chunked_render_layout_matches(tiny_params, monkeypatch):
    """The deferred-transpose (scan-native chunked) render layout must be a
    pure re-layout: full dual-stream UNet outputs identical either way."""
    import dataclasses

    from custom_diffusion360_tpu.models import nerf as nerf_mod

    cfg = dataclasses.replace(TINY, nerf_chunk_size=16)  # hw=64 -> nc=4
    x, xr, t, ctx, y, cams = _tiny_inputs()
    key = jax.random.PRNGKey(1)
    kw = dict(
        input_ref=xr, sigmas_ref=jnp.full((1,), 10.0), cams=cams,
        key=key, training=True,
    )
    monkeypatch.setattr(nerf_mod, "_CHUNKED_OUT", False)
    out1, aux1 = unet_apply(tiny_params, cfg, x, t, ctx, y, **kw)
    monkeypatch.setattr(nerf_mod, "_CHUNKED_OUT", True)
    out2, aux2 = unet_apply(tiny_params, cfg, x, t, ctx, y, **kw)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(aux1["fg_mask_list"][0]), np.asarray(aux2["fg_mask_list"][0]),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(aux1["rgb_list"][0]), np.asarray(aux2["rgb_list"][0]),
        atol=1e-5,
    )


def test_unet_gradients_flow_only_through_target_stream(tiny_params):
    """Gradients w.r.t. pose params must be nonzero; gradients w.r.t. the
    reference latents must be zero (the reference detaches the ref stream)."""
    x, xr, t, ctx, y, cams = _tiny_inputs()

    # zero-init layers (proj_out, out_conv, decoders) make the net an identity
    # at init; perturb every zero leaf so gradients are observable
    leaves, treedef = jax.tree_util.tree_flatten(tiny_params)
    rng = np.random.default_rng(9)
    leaves = [
        l if float(jnp.abs(l).max()) > 0
        else jnp.asarray(rng.normal(size=l.shape).astype(np.float32)) * 0.02
        for l in leaves
    ]
    tiny_params = jax.tree_util.tree_unflatten(treedef, leaves)

    def loss_wrt_ref(xr_in):
        out, _ = unet_apply(
            tiny_params, TINY, x, t, ctx, y,
            input_ref=xr_in, sigmas_ref=jnp.full((1,), 10.0), cams=cams,
            key=jax.random.PRNGKey(2), training=True,
        )
        return jnp.sum(out**2)

    g = jax.grad(loss_wrt_ref)(xr)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-8)

    # pose params receive gradient
    def loss_wrt_pose(pose_w):
        p2 = jax.tree_util.tree_map(lambda a: a, tiny_params)
        blk = p2["input_blocks"][3][1]["blocks"][0]
        blk = dict(blk)
        blk["pose_emb_layers"] = {"w": pose_w}
        p2["input_blocks"][3][1]["blocks"][0] = blk
        out, _ = unet_apply(
            p2, TINY, x, t, ctx, y,
            input_ref=xr, sigmas_ref=jnp.full((1,), 10.0), cams=cams,
            key=jax.random.PRNGKey(2), training=True,
        )
        return jnp.sum(out**2)

    pose_w = tiny_params["input_blocks"][3][1]["blocks"][0]["pose_emb_layers"]["w"]
    gp = jax.grad(loss_wrt_pose)(pose_w)
    assert float(jnp.abs(gp).max()) > 0


def test_fused_attention_params_match_unfused(tiny_params):
    """fuse_attention_params (the inference qkv/kv fusion) must be a pure
    re-layout: full dual-stream UNet outputs are identical."""
    from custom_diffusion360_tpu.models.transformer import fuse_attention_params

    x, xr, t, ctx, y, cams = _tiny_inputs()
    key = jax.random.PRNGKey(1)
    fused = fuse_attention_params(tiny_params)

    # every transformer block got its projections fused
    def count(tree, k):
        n = 0
        if isinstance(tree, dict):
            n += int(k in tree)
            for v in tree.values():
                n += count(v, k)
        elif isinstance(tree, list):
            for v in tree:
                n += count(v, k)
        return n

    assert count(fused, "to_qkv") > 0
    assert count(fused, "to_qkv") == count(tiny_params, "attn1")
    assert count(fused, "to_kv") == count(tiny_params, "attn2")

    out1, _ = unet_apply(
        tiny_params, TINY, x, t, ctx, y,
        input_ref=xr, sigmas_ref=jnp.full((1,), 10.0), cams=cams,
        key=key, training=False,
    )
    out2, _ = unet_apply(
        fused, TINY, x, t, ctx, y,
        input_ref=xr, sigmas_ref=jnp.full((1,), 10.0), cams=cams,
        key=key, training=False,
    )
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_unet_ctx_kv_cache_matches(tiny_params):
    """Precomputed text cross-attention K/V (precompute_context_kv) must
    reproduce the per-step projections exactly on the cached path."""
    from custom_diffusion360_tpu.models.unet import precompute_context_kv

    x, xr, t, ctx, y, cams = _tiny_inputs()
    key = jax.random.PRNGKey(1)
    out1, aux = unet_apply(
        tiny_params, TINY, x, t, ctx, y,
        input_ref=xr, sigmas_ref=jnp.full((1,), 10.0), cams=cams,
        key=key, training=False,
    )
    caches = aux["rendered"]
    # cached path: no ref stream, target context = ctx[:b]
    ctx_kv = precompute_context_kv(tiny_params, TINY, ctx[:1])
    out2, _ = unet_apply(
        tiny_params, TINY, x, t, ctx[:1], y, nerf_caches=caches,
        ctx_kv=ctx_kv,
    )
    out3, _ = unet_apply(
        tiny_params, TINY, x, t, ctx[:1], y, nerf_caches=caches,
    )
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out3), atol=1e-6)


def test_lora_merge_exact():
    """fuse_attention_params folds nonzero LoRA adapters into the base
    projections exactly (W + down @ up), so pose blocks take the fused
    fast path at inference."""
    from custom_diffusion360_tpu.models.transformer import (
        cross_attention_apply,
        fuse_attention_params,
        init_cross_attention,
    )

    key = jax.random.PRNGKey(0)
    p1 = init_cross_attention(key, 32, 32, 2, 16, add_lora=True, lora_rank=4)
    p2 = init_cross_attention(
        jax.random.fold_in(key, 1), 32, 48, 2, 16, add_lora=True, lora_rank=4
    )
    # nonzero up-projections (init is zero)
    for p in (p1, p2):
        for k in ("q_up", "k_up", "v_up", "o_up"):
            p["lora"][k]["w"] = (
                jax.random.normal(jax.random.fold_in(key, hash(k) % 97),
                                  p["lora"][k]["w"].shape) * 0.1
            )
    blk = {"attn1": p1, "attn2": p2}
    fused = fuse_attention_params(blk)
    assert "lora" not in fused["attn1"] and "to_qkv" in fused["attn1"]
    assert "lora" not in fused["attn2"] and "to_kv" in fused["attn2"]

    x = jax.random.normal(jax.random.fold_in(key, 2), (2, 6, 32))
    ctx = jax.random.normal(jax.random.fold_in(key, 3), (2, 5, 48))
    np.testing.assert_allclose(
        np.asarray(cross_attention_apply(p1, x, None, n_heads=2)),
        np.asarray(cross_attention_apply(fused["attn1"], x, None, n_heads=2)),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(cross_attention_apply(p2, x, ctx, n_heads=2)),
        np.asarray(cross_attention_apply(fused["attn2"], x, ctx, n_heads=2)),
        atol=1e-5,
    )
