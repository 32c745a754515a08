#!/usr/bin/env python
"""Numerical parity harness: our JAX stack vs torch ground truth computed
directly from the RAW checkpoint state dict (tools/torch_ref.py).

Run the moment real weights are available:

    python tools/parity.py --base_ckpt sd_xl_base_1.0.safetensors \\
        [--delta_ckpt car0/delta.ckpt] [--report parity_report.json] \\
        [--modules vae,clip_l,open_clip,unet,nerf,sample] [--res 256]

For every module it feeds identical fixed-seed inputs to (a) our converted-
pytree JAX forward and (b) an independent torch re-derivation that consumes
the raw sgm keys, then reports per-module max/mean abs diff. A conversion
mapping error (qkv packing, layout, block order) or a forward-convention
break (norm eps, activation, NDC sign) shows up as a large diff.

"sample" additionally records a 3-step deterministic pose-conditioned sample
fingerprint (latent stats + SHA) for cross-implementation / cross-round
regression tracking.

CI runs the same harness on tiny random sgm-shaped state dicts
(tests/test_parity_harness.py) so the harness itself is always green.
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))) + "/tools")


def _stats(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    d = np.abs(a - b)
    return {
        "max_abs_diff": float(d.max()),
        "mean_abs_diff": float(d.mean()),
        "ref_abs_mean": float(np.abs(b).mean()),
        "shape": list(a.shape),
    }


def check_vae(sd, vae_cfg, res=64, prefix="first_stage_model."):
    import jax
    import jax.numpy as jnp
    import torch

    from custom_diffusion360_tpu.io.torch_convert import convert_vae_state_dict
    from custom_diffusion360_tpu.models.vae import vae_decode, vae_encode
    from tools import torch_ref

    params = convert_vae_state_dict(sd, vae_cfg, prefix)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (1, res, res, 3)).astype(np.float32)
    ours_m = np.asarray(vae_encode(params, jnp.asarray(x), vae_cfg))
    ref_m = torch_ref.vae_encode(
        sd, torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
        vae_cfg.ch_mult, vae_cfg.num_res_blocks, prefix,
    ).permute(0, 2, 3, 1).numpy()
    out = {"vae_encode": _stats(ours_m, ref_m)}

    z = rng.normal(size=(1, res // 8, res // 8, vae_cfg.z_channels)).astype(
        np.float32
    )
    ours_d = np.asarray(vae_decode(params, jnp.asarray(z), vae_cfg))
    ref_d = torch_ref.vae_decode(
        sd, torch.from_numpy(np.transpose(z, (0, 3, 1, 2))),
        vae_cfg.ch_mult, vae_cfg.num_res_blocks, prefix,
    ).permute(0, 2, 3, 1).numpy()
    out["vae_decode"] = _stats(ours_d, ref_d)
    return out


def check_clip_l(sd, cfg, prefix="conditioner.embedders.0.transformer."):
    import jax.numpy as jnp
    import torch

    from custom_diffusion360_tpu.io.torch_convert import convert_clip_l_state_dict
    from custom_diffusion360_tpu.models.clip import clip_text_apply
    from tools import torch_ref

    params = convert_clip_l_state_dict(sd, cfg, prefix)
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, cfg.vocab_size, (2, cfg.context_length))
    tokens[:, 0] = 0
    ours = np.asarray(
        clip_text_apply(params, jnp.asarray(tokens, jnp.int32), cfg)["final"]
    )
    ref = torch_ref.clip_l_tower(
        sd, torch.from_numpy(tokens), cfg.layers, cfg.heads, prefix
    ).numpy()
    return {"clip_l_final": _stats(ours, ref)}


def check_open_clip(sd, cfg, prefix="conditioner.embedders.1.model."):
    import jax.numpy as jnp
    import torch

    from custom_diffusion360_tpu.io.torch_convert import (
        convert_open_clip_state_dict,
    )
    from custom_diffusion360_tpu.models.clip import clip_text_apply
    from tools import torch_ref

    params = convert_open_clip_state_dict(sd, cfg, prefix)
    rng = np.random.default_rng(2)
    tokens = rng.integers(1, cfg.vocab_size - 1, (2, cfg.context_length))
    tokens[:, -1] = cfg.vocab_size - 1  # eot = argmax position
    res = clip_text_apply(params, jnp.asarray(tokens, jnp.int32), cfg)
    pen_t, pooled_t = torch_ref.open_clip_tower(
        sd, torch.from_numpy(tokens), cfg.layers, cfg.heads, prefix
    )
    return {
        "open_clip_penultimate": _stats(res["penultimate"], pen_t.numpy()),
        "open_clip_pooled": _stats(res["pooled"], pooled_t.numpy()),
    }


def check_unet(sd, unet_cfg, res=32, prefix="model.diffusion_model."):
    import jax.numpy as jnp
    import torch

    from custom_diffusion360_tpu.io.torch_convert import convert_unet_state_dict
    from custom_diffusion360_tpu.models.unet import unet_apply
    from tools import torch_ref

    params = convert_unet_state_dict(sd, unet_cfg, prefix)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, res, res, unet_cfg.in_channels)).astype(np.float32)
    t = np.array([500.0], np.float32)
    ctx = rng.normal(size=(1, 77, unet_cfg.context_dim)).astype(np.float32) * 0.2
    y = rng.normal(size=(1, unet_cfg.adm_in_channels)).astype(np.float32) * 0.2
    ours, _ = unet_apply(
        params, unet_cfg, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx),
        jnp.asarray(y),
    )
    ref = torch_ref.unet_plain(
        sd, torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
        torch.from_numpy(t), torch.from_numpy(ctx), torch.from_numpy(y),
        unet_cfg, prefix,
    ).permute(0, 2, 3, 1).numpy()
    return {"unet_plain_eps": _stats(np.asarray(ours), ref)}


def _nerf_geometry(cams, pts, rays, nf):
    """Shared NeRF geometry inputs (NDC sample grid + packed PE features) fed
    to BOTH the JAX and the torch path — pins the MLP packing / grid_sample /
    pooling composition; the camera math itself is pinned by
    tests/test_cameras.py + tests/test_rays.py."""
    import jax.numpy as jnp

    from custom_diffusion360_tpu.geometry.cameras import transform_points_ndc
    from custom_diffusion360_tpu.geometry.rays import (
        plucker_parameterization,
        points_to_view_space,
        positional_encoding,
        rays_to_target_space,
        rays_to_view_space,
    )

    b, hw, s, _ = pts.shape
    n = rays.shape[1] - 1
    ndc = transform_points_ndc(cams, pts.reshape(b, 1, hw * s, 3))
    grid = jnp.clip(jnp.nan_to_num(-ndc[:, 1:, :, :2]), -1.2, 1.2)
    pv = points_to_view_space(cams, pts)
    pe_pv = positional_encoding(pv, nf)
    rv = rays_to_view_space(cams, rays[:, 0])[:, 1:]
    civ = jnp.broadcast_to(rv[:, :, :, None, :], (b, n, hw, s, 6))
    pe_civ = positional_encoding(plucker_parameterization(civ), nf // 2)
    geo_mlp = jnp.concatenate(
        [pe_pv[:, 1:], pv[:, 1:], pe_civ, civ[..., 3:]], axis=-1
    )
    ct = rays_to_target_space(cams, rays[:, 1:])[..., :3]
    ct = jnp.broadcast_to(ct[:, :, :, None, :], (b, n, hw, s, 3))
    pe_ct = positional_encoding(ct, nf)
    pe_pt = jnp.broadcast_to(pe_pv[:, :1], (b, n, hw, s, pe_pv.shape[-1]))
    pt = jnp.broadcast_to(pv[:, :1], (b, n, hw, s, 3))
    geo_attn = jnp.concatenate([pe_pt, pt, ct, pe_ct], axis=-1)
    return grid, geo_mlp, geo_attn


def check_nerf(delta_sd, unet_cfg, res=16, n=3, nerf_cfg=None):
    """One FeatureNeRF encoding vs torch, from raw delta pose keys. The
    geometry inputs (grid + PE features) are produced once by our geometry
    stack and fed to BOTH paths — this pins the MLP packing, grid_sample
    conventions and softmax pooling against the delta checkpoint naming."""
    import jax.numpy as jnp
    import torch

    from custom_diffusion360_tpu.geometry.cameras import Cameras
    from custom_diffusion360_tpu.geometry.rays import (
        get_patch_rays,
        ray_points_from_rays,
    )
    from custom_diffusion360_tpu.io.delta import iter_pose_blocks
    from custom_diffusion360_tpu.models.nerf import (
        NerfConfig,
        nerf_encoding_apply,
    )
    from tools import torch_ref

    prefix, _, attn_id, d = next(iter(iter_pose_blocks(unet_cfg)))
    nerf_p = prefix + ".pose_featurenerf.model"
    w1 = delta_sd[nerf_p + ".plane_coefs.0.weight"]
    c = np.asarray(w1).shape[0]
    cfg = nerf_cfg or NerfConfig(dim=c, chunk_size=0, rgb_predict=(
        np.asarray(delta_sd[nerf_p + ".decoder.weight"]).shape[0] == 4
    ))
    params = {
        "plane_coefs": {
            "l1": {"w": jnp.asarray(np.asarray(delta_sd[nerf_p + ".plane_coefs.0.weight"]).T),
                   "b": jnp.asarray(delta_sd[nerf_p + ".plane_coefs.0.bias"])},
            "l2": {"w": jnp.asarray(np.asarray(delta_sd[nerf_p + ".plane_coefs.2.weight"]).T),
                   "b": jnp.asarray(delta_sd[nerf_p + ".plane_coefs.2.bias"])},
        },
        "decoder": {"w": jnp.asarray(np.asarray(delta_sd[nerf_p + ".decoder.weight"]).T)},
        "nviews": {"w": jnp.asarray(np.asarray(delta_sd[nerf_p + ".nviews.weight"]).T),
                   "b": jnp.asarray(delta_sd[nerf_p + ".nviews.bias"])},
    }

    rng = np.random.default_rng(4)
    b = 1
    th = rng.uniform(0, 2 * np.pi, (b * (1 + n),))
    R = np.stack([
        np.array([[np.cos(t), 0, np.sin(t)], [0, 1, 0],
                  [-np.sin(t), 0, np.cos(t)]], np.float32) for t in th
    ])
    cams = Cameras.create(
        R, np.tile(np.array([0, 0, 2.7], np.float32), (b * (1 + n), 1)),
        2.0, 0.0,
    ).reshape(b, 1 + n)
    xref = jnp.asarray(
        rng.normal(size=(b, n, res * res, c)).astype(np.float32) * 0.1
    )
    rays, _ = get_patch_rays(cams, res)
    s = cfg.num_samples
    lengths = jnp.broadcast_to(
        jnp.linspace(0.05, 2.0, s), (b, res * res, s)
    )
    pts = ray_points_from_rays(rays[:, 0], lengths)

    ours, attn_ours = nerf_encoding_apply(
        params, cams, xref, pts, rays, None, cfg
    )

    # shared geometry for the torch path
    grid, geo_mlp, geo_attn = _nerf_geometry(cams, pts, rays, cfg.num_freqs)

    ref, attn_ref = torch_ref.nerf_encoding(
        delta_sd, nerf_p,
        torch.from_numpy(np.asarray(xref).reshape(b, n, res, res, c)),
        torch.from_numpy(np.asarray(grid)),
        torch.from_numpy(np.asarray(geo_mlp)),
        torch.from_numpy(np.asarray(geo_attn)),
        average=cfg.average,
    )
    return {"nerf_encoding": _stats(np.asarray(ours), ref.numpy())}


def check_pose_block(sd, delta_sd, unet_cfg, res=8, n=2):
    """Full dual-stream pose SpatialTransformer vs torch, from raw base +
    delta keys: reference-stream blocks, NeRF encode, per-point text
    cross-attention, trunc_exp + volume render, pose_emb_layers fusion, FF,
    proj in/out — the complete composition of attention.py:571-886. Picks
    the first pose block whose transformer has a single d=0 NeRF block and
    no importance chain (every ds2 SDXL transformer: depth 2 < interval 4)."""
    import jax
    import jax.numpy as jnp
    import torch

    from custom_diffusion360_tpu.geometry.cameras import Cameras
    from custom_diffusion360_tpu.io.delta import (
        apply_delta_state_dict,
        iter_pose_blocks,
    )
    from custom_diffusion360_tpu.io.torch_convert import convert_unet_state_dict
    from custom_diffusion360_tpu.models.nerf import raymarch
    from custom_diffusion360_tpu.models.transformer import (
        spatial_transformer_apply,
    )
    from custom_diffusion360_tpu.models.unet import attn_block_meta
    from tools import torch_ref

    meta = attn_block_meta(unet_cfg)
    pick = None
    for prefix, path, attn_id, d in iter_pose_blocks(unet_cfg):
        _, ch, depth = meta[attn_id]
        tcfg = unet_cfg.transformer_config(ch, depth, attn_id)
        if d == 0 and depth < tcfg.poscontrol_interval:
            pick = (prefix, path, attn_id, ch, depth, tcfg)
            break
    if pick is None:
        return {"pose_block": {"skipped": "no chain-free pose block"}}
    prefix, path, attn_id, ch, depth, tcfg = pick

    params = {"unet": convert_unet_state_dict(sd, unet_cfg)}
    params, _ = apply_delta_state_dict(params, delta_sd, unet_cfg)
    if path[0] == "middle_block":
        stp = params["unet"]["middle_block"][path[1]]
    else:
        stp = params["unet"][path[0]][path[1]][path[2]]

    rng = np.random.default_rng(6)
    b = 1
    th = rng.uniform(0, 2 * np.pi, (b * (1 + n),))
    R = np.stack([
        np.array([[np.cos(t), 0, np.sin(t)], [0, 1, 0],
                  [-np.sin(t), 0, np.cos(t)]], np.float32) for t in th
    ])
    cams = Cameras.create(
        R, np.tile(np.array([0, 0, 2.7], np.float32), (b * (1 + n), 1)),
        2.0, 0.0,
    ).reshape(b, 1 + n)
    x = jnp.asarray(rng.normal(size=(b, res, res, ch)).astype(np.float32) * 0.2)
    xr = jnp.asarray(
        rng.normal(size=(b * n, res, res, ch)).astype(np.float32) * 0.2
    )
    ctx = jnp.asarray(
        rng.normal(size=(b, 12, tcfg.context_dim)).astype(np.float32) * 0.2
    )
    ctx_ref = jnp.asarray(
        rng.normal(size=(b * n, 12, tcfg.context_dim)).astype(np.float32) * 0.2
    )

    ours_x, ours_xr, _ = spatial_transformer_apply(
        stp, x, ctx, tcfg, xr=xr, context_ref=ctx_ref, cams=cams,
        key=None, training=False,
    )

    ncfg = tcfg.nerf
    march = raymarch(cams, res, ncfg, None, False)
    grid, geo_mlp, geo_attn = _nerf_geometry(
        cams, march["ray_points"], march["rays"], ncfg.num_freqs
    )
    sd2 = dict(sd)
    sd2.update(delta_sd)
    sp_prefix = prefix.rsplit(".transformer_blocks", 1)[0]
    t = lambda a: torch.from_numpy(np.asarray(a))
    ref_x, ref_xr = torch_ref.pose_spatial_transformer(
        sd2, sp_prefix,
        t(x).permute(0, 3, 1, 2), t(xr).permute(0, 3, 1, 2),
        t(ctx), t(ctx_ref), depth, tcfg.n_heads,
        t(grid), t(geo_mlp), t(geo_attn),
        t(march["dists"][..., None]), rgb_predict=ncfg.rgb_predict,
    )
    return {
        "pose_block_x": _stats(
            np.asarray(ours_x), ref_x.permute(0, 2, 3, 1).numpy()
        ),
        "pose_block_xr": _stats(
            np.asarray(ours_xr), ref_xr.permute(0, 2, 3, 1).numpy()
        ),
    }


def check_sample_fingerprint(params, references, unet_cfg, res=64, steps=3):
    """Deterministic 3-step pose-conditioned sample; records latent stats
    for cross-implementation regression tracking."""
    import jax
    import jax.numpy as jnp

    from custom_diffusion360_tpu.diffusion import vanilla_cfg_img_ref
    from custom_diffusion360_tpu.engine import Engine, EngineConfig
    from custom_diffusion360_tpu.geometry.cameras import Cameras

    cfg = EngineConfig(unet=unet_cfg)
    eng = Engine(cfg)
    guider = vanilla_cfg_img_ref(scale=7.5)
    n_ref = min(v.shape[0] - 1 for pd in references.values() for v in pd.values())
    rng = np.random.default_rng(5)
    th = rng.uniform(0, 2 * np.pi, (2 * (1 + n_ref),))
    R = np.stack([
        np.array([[np.cos(t), 0, np.sin(t)], [0, 1, 0],
                  [-np.sin(t), 0, np.cos(t)]], np.float32) for t in th
    ])
    cams = Cameras.create(
        R, np.tile(np.array([0, 0, 2.7], np.float32), (2 * (1 + n_ref), 1)),
        2.0, 0.0,
    ).reshape(2, 1 + n_ref)
    ctx_dim = unet_cfg.context_dim
    cond = {"crossattn": jnp.zeros((1, 77, ctx_dim)),
            "vector": jnp.zeros((1, unet_cfg.adm_in_channels))}
    z = eng.sample(
        params, cond, cond, guider, jax.random.PRNGKey(0),
        shape=(1, res // 8, res // 8, unet_cfg.in_channels),
        cams=cams, references=references, choices=np.arange(n_ref),
        num_steps=steps,
    )
    z = np.asarray(z, np.float32)
    return {
        "sample_fingerprint": {
            "mean": float(z.mean()), "std": float(z.std()),
            "sha256_1e-3": hashlib.sha256(
                np.round(z / 1e-3).astype(np.int64).tobytes()
            ).hexdigest()[:16],
            "steps": steps, "res": res,
        }
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--base_ckpt", required=True)
    ap.add_argument("--delta_ckpt", default=None)
    ap.add_argument("--report", default="parity_report.json")
    ap.add_argument("--modules", default="vae,clip_l,open_clip,unet,nerf,pose_block,sample")
    ap.add_argument("--res", type=int, default=256, help="VAE input res")
    ap.add_argument("--unet_res", type=int, default=32, help="UNet latent res")
    args = ap.parse_args(argv)

    import jax

    from custom_diffusion360_tpu.io.torch_convert import load_torch_state_dict
    from custom_diffusion360_tpu.models.clip import (
        CLIP_L_CONFIG,
        OPEN_CLIP_BIGG_CONFIG,
    )
    from custom_diffusion360_tpu.models.unet import UNetConfig
    from custom_diffusion360_tpu.models.vae import VAEConfig

    sd = load_torch_state_dict(args.base_ckpt)
    mods = set(args.modules.split(","))
    report = {}
    with jax.default_matmul_precision("float32"):
        if "vae" in mods:
            report.update(check_vae(sd, VAEConfig(), args.res))
        if "clip_l" in mods:
            report.update(check_clip_l(sd, CLIP_L_CONFIG))
        if "open_clip" in mods:
            report.update(check_open_clip(sd, OPEN_CLIP_BIGG_CONFIG))
        if "unet" in mods:
            report.update(check_unet(sd, UNetConfig(), args.unet_res))
        if args.delta_ckpt:
            from custom_diffusion360_tpu.io.delta import (
                apply_delta_state_dict,
                load_delta_npz,
                load_delta_torch,
            )
            from custom_diffusion360_tpu.io.torch_convert import (
                load_sdxl_checkpoint,
            )

            delta = (
                load_delta_npz(args.delta_ckpt)
                if args.delta_ckpt.endswith(".npz")
                else load_delta_torch(args.delta_ckpt)
            )
            # loaded deltas are FLAT delta_state_dicts (io/delta.py) — gate
            # on the pose keys themselves, not a structured "pose" entry
            has_pose = any(".pose_featurenerf." in k for k in delta)
            if "nerf" in mods and has_pose:
                report.update(check_nerf(delta, UNetConfig()))
            if "pose_block" in mods and has_pose:
                report.update(check_pose_block(sd, delta, UNetConfig()))
            if "sample" in mods:
                params = load_sdxl_checkpoint(args.base_ckpt)
                params, references = apply_delta_state_dict(
                    params, delta, UNetConfig()
                )
                report.update(
                    check_sample_fingerprint(params, references, UNetConfig())
                )

    with open(args.report, "w") as f:
        json.dump(report, f, indent=2)
    for k, v in report.items():
        line = ", ".join(f"{kk}={vv}" for kk, vv in v.items() if kk != "shape")
        print(f"{k}: {line}")
    print(f"report written to {args.report}")
    return report


if __name__ == "__main__":
    main()
