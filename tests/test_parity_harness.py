"""The parity harness (tools/parity.py) run end-to-end on tiny random
sgm-shaped state dicts: our converted-pytree forward must match the
independent torch re-derivation that consumes the raw keys. With real
weights the same checks run via the tools/parity.py CLI."""
import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)
torch = pytest.importorskip("torch")

from custom_diffusion360_tpu.models.clip import ClipTextConfig, init_clip_text_params
from custom_diffusion360_tpu.models.nerf import NerfConfig, init_nerf_params
from custom_diffusion360_tpu.models.unet import init_unet_params
from custom_diffusion360_tpu.models.vae import init_vae_params
from custom_diffusion360_tpu.io.delta import extract_delta, iter_pose_blocks
from tests.test_io import (
    TINY_UNET,
    TINY_VAE,
    _conv_sd,
    _lin_sd,
    _norm_sd,
    make_unet_sd,
)
from tools import parity


def _make_vae_sd(params):
    sd = {}
    P = "first_stage_model."

    def res(prefix, p):
        _norm_sd(sd, prefix + ".norm1", p["norm1"])
        _conv_sd(sd, prefix + ".conv1", p["conv1"])
        _norm_sd(sd, prefix + ".norm2", p["norm2"])
        _conv_sd(sd, prefix + ".conv2", p["conv2"])
        if "nin_shortcut" in p:
            _conv_sd(sd, prefix + ".nin_shortcut", p["nin_shortcut"])

    def attn(prefix, p):
        _norm_sd(sd, prefix + ".norm", p["norm"])
        for n in ("q", "k", "v", "proj_out"):
            _conv_sd(sd, f"{prefix}.{n}", p[n])

    enc = params["encoder"]
    _conv_sd(sd, P + "encoder.conv_in", enc["conv_in"])
    for i in range(len(TINY_VAE.ch_mult)):
        for j, bp in enumerate(enc[f"down_{i}"]["block"]):
            res(f"{P}encoder.down.{i}.block.{j}", bp)
        if "downsample" in enc[f"down_{i}"]:
            _conv_sd(sd, f"{P}encoder.down.{i}.downsample.conv",
                     enc[f"down_{i}"]["downsample"])
    res(P + "encoder.mid.block_1", enc["mid"]["block_1"])
    attn(P + "encoder.mid.attn_1", enc["mid"]["attn_1"])
    res(P + "encoder.mid.block_2", enc["mid"]["block_2"])
    _norm_sd(sd, P + "encoder.norm_out", enc["norm_out"])
    _conv_sd(sd, P + "encoder.conv_out", enc["conv_out"])
    dec = params["decoder"]
    _conv_sd(sd, P + "decoder.conv_in", dec["conv_in"])
    res(P + "decoder.mid.block_1", dec["mid"]["block_1"])
    attn(P + "decoder.mid.attn_1", dec["mid"]["attn_1"])
    res(P + "decoder.mid.block_2", dec["mid"]["block_2"])
    for i in range(len(TINY_VAE.ch_mult)):
        for j, bp in enumerate(dec[f"up_{i}"]["block"]):
            res(f"{P}decoder.up.{i}.block.{j}", bp)
        if "upsample" in dec[f"up_{i}"]:
            _conv_sd(sd, f"{P}decoder.up.{i}.upsample.conv",
                     dec[f"up_{i}"]["upsample"])
    _norm_sd(sd, P + "decoder.norm_out", dec["norm_out"])
    _conv_sd(sd, P + "decoder.conv_out", dec["conv_out"])
    _conv_sd(sd, P + "quant_conv", params["quant_conv"])
    _conv_sd(sd, P + "post_quant_conv", params["post_quant_conv"])
    return sd


def test_vae_parity():
    params = init_vae_params(jax.random.PRNGKey(0), TINY_VAE)
    sd = _make_vae_sd(params)
    with jax.default_matmul_precision("float32"):
        rep = parity.check_vae(sd, TINY_VAE, res=32)
    for k, v in rep.items():
        assert v["max_abs_diff"] < 1e-4, (k, v)


def test_clip_l_parity():
    cfg = ClipTextConfig(vocab_size=32, width=16, layers=2, heads=2,
                         context_length=8)
    params = init_clip_text_params(jax.random.PRNGKey(0), cfg)
    sd = {}
    P = "conditioner.embedders.0.transformer.text_model."
    sd[P + "embeddings.token_embedding.weight"] = np.concatenate(
        [np.asarray(params["token_embedding"]),
         np.asarray(params["modifier_rows"])]
    )
    sd[P + "embeddings.position_embedding.weight"] = np.asarray(
        params["positional_embedding"]
    )
    _norm_sd(sd, P + "final_layer_norm", params["ln_final"])
    for i in range(cfg.layers):
        bp = jax.tree.map(lambda x: x[i], params["blocks"])
        lp = f"{P}encoder.layers.{i}."
        _norm_sd(sd, lp + "layer_norm1", bp["ln1"])
        _norm_sd(sd, lp + "layer_norm2", bp["ln2"])
        for ours, theirs in (
            ("q", "self_attn.q_proj"), ("k", "self_attn.k_proj"),
            ("v", "self_attn.v_proj"), ("o", "self_attn.out_proj"),
            ("fc1", "mlp.fc1"), ("fc2", "mlp.fc2"),
        ):
            _lin_sd(sd, lp + theirs, bp[ours])
    with jax.default_matmul_precision("float32"):
        rep = parity.check_clip_l(sd, cfg)
    assert rep["clip_l_final"]["max_abs_diff"] < 1e-4, rep


def test_open_clip_parity():
    cfg = ClipTextConfig(vocab_size=32, width=16, layers=3, heads=2,
                         context_length=8, act="gelu", text_projection=True)
    params = init_clip_text_params(jax.random.PRNGKey(1), cfg)
    sd = {}
    P = "conditioner.embedders.1.model."
    sd[P + "token_embedding.weight"] = np.concatenate(
        [np.asarray(params["token_embedding"]),
         np.asarray(params["modifier_rows"])]
    )
    sd[P + "positional_embedding"] = np.asarray(params["positional_embedding"])
    _norm_sd(sd, P + "ln_final", params["ln_final"])
    sd[P + "text_projection"] = np.asarray(params["text_projection"]["w"])
    for i in range(cfg.layers):
        bp = jax.tree.map(lambda x: x[i], params["blocks"])
        lp = f"{P}transformer.resblocks.{i}."
        _norm_sd(sd, lp + "ln_1", bp["ln1"])
        _norm_sd(sd, lp + "ln_2", bp["ln2"])
        sd[lp + "attn.in_proj_weight"] = np.concatenate(
            [np.asarray(bp[k]["w"]).T for k in ("q", "k", "v")]
        )
        sd[lp + "attn.in_proj_bias"] = np.concatenate(
            [np.asarray(bp[k]["b"]) for k in ("q", "k", "v")]
        )
        _lin_sd(sd, lp + "attn.out_proj", bp["o"])
        _lin_sd(sd, lp + "mlp.c_fc", bp["fc1"])
        _lin_sd(sd, lp + "mlp.c_proj", bp["fc2"])
    with jax.default_matmul_precision("float32"):
        rep = parity.check_open_clip(sd, cfg)
    assert rep["open_clip_penultimate"]["max_abs_diff"] < 1e-4, rep
    assert rep["open_clip_pooled"]["max_abs_diff"] < 1e-4, rep


def test_unet_parity():
    params = init_unet_params(jax.random.PRNGKey(0), TINY_UNET)
    sd = make_unet_sd(params, TINY_UNET)
    with jax.default_matmul_precision("float32"):
        rep = parity.check_unet(sd, TINY_UNET, res=8)
    assert rep["unet_plain_eps"]["max_abs_diff"] < 1e-4, rep


def test_nerf_parity():
    ncfg = NerfConfig(dim=32, num_samples=4, num_freqs=2, chunk_size=0)
    nerf_params = init_nerf_params(jax.random.PRNGKey(2), ncfg)
    prefix, _, _, _ = next(iter(iter_pose_blocks(TINY_UNET)))
    nerf_p = prefix + ".pose_featurenerf.model"
    sd = {}
    _lin_sd(sd, nerf_p + ".plane_coefs.0", nerf_params["plane_coefs"]["l1"])
    _lin_sd(sd, nerf_p + ".plane_coefs.2", nerf_params["plane_coefs"]["l2"])
    _lin_sd(sd, nerf_p + ".decoder", nerf_params["decoder"])
    _lin_sd(sd, nerf_p + ".nviews", nerf_params["nviews"])
    with jax.default_matmul_precision("float32"):
        rep = parity.check_nerf(sd, TINY_UNET, res=8, n=2, nerf_cfg=ncfg)
    assert rep["nerf_encoding"]["max_abs_diff"] < 1e-4, rep


def test_pose_block_parity():
    """Full dual-stream pose SpatialTransformer vs the torch re-derivation:
    ref-stream blocks, NeRF encode, per-point text attn, volume render,
    pose_emb_layers fusion (attention.py:571-886). Uses interval=4 so the
    transformer has a single chain-free d=0 NeRF block, like every ds2
    SDXL transformer."""
    import dataclasses

    cfg = dataclasses.replace(TINY_UNET, poscontrol_interval=4)
    params = init_unet_params(jax.random.PRNGKey(3), cfg)
    # perturb the zero-init NeRF decoders so sigma/rgb are observable
    key = jax.random.PRNGKey(9)
    from custom_diffusion360_tpu.io.delta import extract_delta, iter_pose_blocks as ipb
    from custom_diffusion360_tpu.io.delta import _get_block

    for _, path, _, d in ipb(cfg):
        blk = _get_block(params, path, d)
        w = blk["pose_featurenerf"]["decoder"]["w"]
        key, k = jax.random.split(key)
        blk["pose_featurenerf"]["decoder"]["w"] = (
            jax.random.normal(k, w.shape) * 0.05
        )
    sd = make_unet_sd(params, cfg)
    delta_sd = extract_delta({"unet": params}, cfg=cfg)
    with jax.default_matmul_precision("float32"):
        rep = parity.check_pose_block(sd, delta_sd, cfg)
    assert rep["pose_block_x"]["max_abs_diff"] < 2e-4, rep
    assert rep["pose_block_xr"]["max_abs_diff"] < 2e-4, rep
