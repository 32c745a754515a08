"""Torch / safetensors checkpoint import -> JAX param pytrees.

Replaces the reference's load_state_dict plumbing (sgm/models/diffusion.py:
172-190 init_from_ckpt, main.py:825-836 non-strict base load). The torch
module trees map onto our functional pytrees:

* linear weights transpose (out,in) -> (in,out);
* conv kernels transpose OIHW -> HWIO (NHWC activations);
* GroupNorm/LayerNorm weight/bias -> scale/bias.

Key layouts handled: sgm SDXL UNet (model.diffusion_model.*), sgm VAE
(first_stage_model.*), HF CLIPTextModel (conditioner.embedders.0.
transformer.*), open_clip text tower (conditioner.embedders.1.model.*).
"""
from __future__ import annotations

from typing import Dict

import numpy as np
import jax.numpy as jnp

from ..models.unet import UNetConfig, build_unet_spec
from ..models.vae import VAEConfig
from ..models.clip import ClipTextConfig


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .safetensors or torch .ckpt/.pt file into numpy arrays."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


# ---------------------------------------------------------------------------
# leaf converters
# ---------------------------------------------------------------------------


def _lin(sd, prefix, bias=True):
    p = {"w": jnp.asarray(sd[prefix + ".weight"].T)}
    if bias and prefix + ".bias" in sd:
        p["b"] = jnp.asarray(sd[prefix + ".bias"])
    return p


def _conv(sd, prefix):
    w = sd[prefix + ".weight"]  # OIHW
    p = {"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))}
    if prefix + ".bias" in sd:
        p["b"] = jnp.asarray(sd[prefix + ".bias"])
    return p


def _norm(sd, prefix):
    return {
        "scale": jnp.asarray(sd[prefix + ".weight"]),
        "bias": jnp.asarray(sd[prefix + ".bias"]),
    }


# ---------------------------------------------------------------------------
# transformer / UNet
# ---------------------------------------------------------------------------


def _attn(sd, p):
    out = {
        "to_q": _lin(sd, p + ".to_q"),
        "to_k": _lin(sd, p + ".to_k"),
        "to_v": _lin(sd, p + ".to_v"),
        "to_out": _lin(sd, p + ".to_out.0"),
    }
    return out


def _transformer_block(sd, p, has_nerf):
    out = {
        "attn1": _attn(sd, p + ".attn1"),
        "attn2": _attn(sd, p + ".attn2"),
        "ff": {
            "proj": _lin(sd, p + ".ff.net.0.proj"),
            "out": _lin(sd, p + ".ff.net.2"),
        },
        "norm1": _norm(sd, p + ".norm1"),
        "norm2": _norm(sd, p + ".norm2"),
        "norm3": _norm(sd, p + ".norm3"),
    }
    if has_nerf and p + ".pose_emb_layers.weight" in sd:
        out["pose_emb_layers"] = _lin(sd, p + ".pose_emb_layers", bias=False)
        nerf_p = p + ".pose_featurenerf.model"
        out["pose_featurenerf"] = {
            "plane_coefs": {
                "l1": _lin(sd, nerf_p + ".plane_coefs.0"),
                "l2": _lin(sd, nerf_p + ".plane_coefs.2"),
            },
            "decoder": _lin(sd, nerf_p + ".decoder", bias=False),
        }
        if nerf_p + ".nviews.weight" in sd:
            out["pose_featurenerf"]["nviews"] = _lin(sd, nerf_p + ".nviews")
    return out


def _spatial_transformer(sd, p, cfg: UNetConfig, ch, depth, attn_id):
    tcfg = cfg.transformer_config(ch, depth, attn_id)
    return {
        "norm": _norm(sd, p + ".norm"),
        "proj_in": _lin(sd, p + ".proj_in"),
        "proj_out": _lin(sd, p + ".proj_out"),
        "blocks": [
            _transformer_block(
                sd, f"{p}.transformer_blocks.{d}", tcfg.block_has_nerf(d)
            )
            for d in range(depth)
        ],
    }


def _resblock(sd, p):
    out = {
        "norm_in": _norm(sd, p + ".in_layers.0"),
        "conv_in": _conv(sd, p + ".in_layers.2"),
        "emb": _lin(sd, p + ".emb_layers.1"),
        "norm_out": _norm(sd, p + ".out_layers.0"),
        "conv_out": _conv(sd, p + ".out_layers.3"),
    }
    if p + ".skip_connection.weight" in sd:
        out["skip"] = _conv(sd, p + ".skip_connection")
    return out


def convert_unet_state_dict(
    sd: Dict[str, np.ndarray],
    cfg: UNetConfig = UNetConfig(),
    prefix: str = "model.diffusion_model.",
):
    """sgm SDXL UNet torch keys -> init_unet_params-compatible pytree."""
    P = prefix
    inb_spec, mid_spec, outb_spec, _ = build_unet_spec(cfg)

    def layer(spec, p):
        kind = spec[0]
        if kind == "conv_in":
            return _conv(sd, p)
        if kind == "res":
            return _resblock(sd, p)
        if kind == "attn":
            _, ch, depth, attn_id = spec
            return _spatial_transformer(sd, p, cfg, ch, depth, attn_id)
        if kind == "down":
            return _conv(sd, p + ".op")
        if kind == "up":
            return _conv(sd, p + ".conv")
        raise ValueError(kind)

    params = {
        "time_embed": {
            "l1": _lin(sd, P + "time_embed.0"),
            "l2": _lin(sd, P + "time_embed.2"),
        },
        "label_emb": {
            "l1": _lin(sd, P + "label_emb.0.0"),
            "l2": _lin(sd, P + "label_emb.0.2"),
        },
        "out_norm": _norm(sd, P + "out.0"),
        "out_conv": _conv(sd, P + "out.2"),
    }
    params["input_blocks"] = [
        [layer(s, f"{P}input_blocks.{i}.{j}") for j, s in enumerate(block)]
        for i, block in enumerate(inb_spec)
    ]
    params["middle_block"] = [
        layer(s, f"{P}middle_block.{j}") for j, s in enumerate(mid_spec)
    ]
    params["output_blocks"] = [
        [layer(s, f"{P}output_blocks.{i}.{j}") for j, s in enumerate(block)]
        for i, block in enumerate(outb_spec)
    ]
    return params


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------


def _vae_res(sd, p):
    out = {
        "norm1": _norm(sd, p + ".norm1"),
        "conv1": _conv(sd, p + ".conv1"),
        "norm2": _norm(sd, p + ".norm2"),
        "conv2": _conv(sd, p + ".conv2"),
    }
    if p + ".nin_shortcut.weight" in sd:
        out["nin_shortcut"] = _conv(sd, p + ".nin_shortcut")
    return out


def _vae_attn(sd, p):
    return {
        "norm": _norm(sd, p + ".norm"),
        "q": _conv(sd, p + ".q"),
        "k": _conv(sd, p + ".k"),
        "v": _conv(sd, p + ".v"),
        "proj_out": _conv(sd, p + ".proj_out"),
    }


def convert_vae_state_dict(
    sd: Dict[str, np.ndarray],
    cfg: VAEConfig = VAEConfig(),
    prefix: str = "first_stage_model.",
):
    P = prefix
    n_lv = len(cfg.ch_mult)
    enc = {"conv_in": _conv(sd, P + "encoder.conv_in")}
    for i in range(n_lv):
        lvl = {
            "block": [
                _vae_res(sd, f"{P}encoder.down.{i}.block.{j}")
                for j in range(cfg.num_res_blocks)
            ]
        }
        if i != n_lv - 1:
            lvl["downsample"] = _conv(sd, f"{P}encoder.down.{i}.downsample.conv")
        enc[f"down_{i}"] = lvl
    enc["mid"] = {
        "block_1": _vae_res(sd, P + "encoder.mid.block_1"),
        "attn_1": _vae_attn(sd, P + "encoder.mid.attn_1"),
        "block_2": _vae_res(sd, P + "encoder.mid.block_2"),
    }
    enc["norm_out"] = _norm(sd, P + "encoder.norm_out")
    enc["conv_out"] = _conv(sd, P + "encoder.conv_out")

    dec = {
        "conv_in": _conv(sd, P + "decoder.conv_in"),
        "mid": {
            "block_1": _vae_res(sd, P + "decoder.mid.block_1"),
            "attn_1": _vae_attn(sd, P + "decoder.mid.attn_1"),
            "block_2": _vae_res(sd, P + "decoder.mid.block_2"),
        },
    }
    for i in range(n_lv):
        lvl = {
            "block": [
                _vae_res(sd, f"{P}decoder.up.{i}.block.{j}")
                for j in range(cfg.num_res_blocks + 1)
            ]
        }
        if i != 0:
            lvl["upsample"] = _conv(sd, f"{P}decoder.up.{i}.upsample.conv")
        dec[f"up_{i}"] = lvl
    dec["norm_out"] = _norm(sd, P + "decoder.norm_out")
    dec["conv_out"] = _conv(sd, P + "decoder.conv_out")

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv(sd, P + "quant_conv"),
        "post_quant_conv": _conv(sd, P + "post_quant_conv"),
    }


# ---------------------------------------------------------------------------
# text towers
# ---------------------------------------------------------------------------


def convert_clip_l_state_dict(
    sd: Dict[str, np.ndarray],
    cfg: ClipTextConfig,
    prefix: str = "conditioner.embedders.0.transformer.",
):
    """HF CLIPTextModel keys. Extra embedding rows beyond cfg.vocab_size
    (the appended V* rows, sgm/util.py:228-229) land in modifier_rows."""
    P = prefix + "text_model."
    table = np.asarray(sd[P + "embeddings.token_embedding.weight"])
    base, extra = table[: cfg.vocab_size], table[cfg.vocab_size :]
    blocks = []
    for i in range(cfg.layers):
        lp = f"{P}encoder.layers.{i}."
        blocks.append(
            {
                "ln1": _norm(sd, lp + "layer_norm1"),
                "q": _lin(sd, lp + "self_attn.q_proj"),
                "k": _lin(sd, lp + "self_attn.k_proj"),
                "v": _lin(sd, lp + "self_attn.v_proj"),
                "o": _lin(sd, lp + "self_attn.out_proj"),
                "ln2": _norm(sd, lp + "layer_norm2"),
                "fc1": _lin(sd, lp + "mlp.fc1"),
                "fc2": _lin(sd, lp + "mlp.fc2"),
            }
        )
    import jax

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return {
        "token_embedding": jnp.asarray(base),
        "positional_embedding": jnp.asarray(
            sd[P + "embeddings.position_embedding.weight"]
        ),
        "blocks": stacked,
        "ln_final": _norm(sd, P + "final_layer_norm"),
        "modifier_rows": jnp.asarray(
            extra
            if extra.size
            else np.zeros((cfg.num_modifier_tokens, cfg.width), np.float32)
        ),
    }


def convert_open_clip_state_dict(
    sd: Dict[str, np.ndarray],
    cfg: ClipTextConfig,
    prefix: str = "conditioner.embedders.1.model.",
):
    """open_clip text-tower keys (packed qkv in_proj)."""
    P = prefix
    table = np.asarray(sd[P + "token_embedding.weight"])
    base, extra = table[: cfg.vocab_size], table[cfg.vocab_size :]
    d = cfg.width
    blocks = []
    for i in range(cfg.layers):
        lp = f"{P}transformer.resblocks.{i}."
        in_w = np.asarray(sd[lp + "attn.in_proj_weight"])  # (3d, d)
        in_b = np.asarray(sd[lp + "attn.in_proj_bias"])
        qw, kw, vw = in_w[:d], in_w[d : 2 * d], in_w[2 * d :]
        qb, kb, vb = in_b[:d], in_b[d : 2 * d], in_b[2 * d :]
        blocks.append(
            {
                "ln1": _norm(sd, lp + "ln_1"),
                "q": {"w": jnp.asarray(qw.T), "b": jnp.asarray(qb)},
                "k": {"w": jnp.asarray(kw.T), "b": jnp.asarray(kb)},
                "v": {"w": jnp.asarray(vw.T), "b": jnp.asarray(vb)},
                "o": _lin(sd, lp + "attn.out_proj"),
                "ln2": _norm(sd, lp + "ln_2"),
                "fc1": _lin(sd, lp + "mlp.c_fc"),
                "fc2": _lin(sd, lp + "mlp.c_proj"),
            }
        )
    import jax

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return {
        "token_embedding": jnp.asarray(base),
        "positional_embedding": jnp.asarray(sd[P + "positional_embedding"]),
        "blocks": stacked,
        "ln_final": _norm(sd, P + "ln_final"),
        "text_projection": {"w": jnp.asarray(sd[P + "text_projection"])},
        "modifier_rows": jnp.asarray(
            extra
            if extra.size
            else np.zeros((cfg.num_modifier_tokens, cfg.width), np.float32)
        ),
    }


def load_sdxl_checkpoint(
    path: str,
    unet_cfg: UNetConfig = UNetConfig(),
    vae_cfg: VAEConfig = VAEConfig(),
    clip_l_cfg: ClipTextConfig | None = None,
    open_clip_cfg: ClipTextConfig | None = None,
):
    """Full base-checkpoint import (sd_xl_base_1.0.safetensors layout):
    returns dict with unet / vae / conditioner pytrees."""
    from ..models.clip import CLIP_L_CONFIG, OPEN_CLIP_BIGG_CONFIG

    clip_l_cfg = clip_l_cfg or CLIP_L_CONFIG
    open_clip_cfg = open_clip_cfg or OPEN_CLIP_BIGG_CONFIG
    sd = load_torch_state_dict(path)
    return {
        "unet": convert_unet_state_dict(sd, unet_cfg),
        "vae": convert_vae_state_dict(sd, vae_cfg),
        "conditioner": {
            "clip_l": convert_clip_l_state_dict(sd, clip_l_cfg),
            "open_clip": convert_open_clip_state_dict(sd, open_clip_cfg),
        },
    }
