"""Delta checkpoints: the distribution format for a customized model.

Reference: main.py:611-625 (on_save_checkpoint keeps only pose* weights,
per-block 'references' buffers, and the V* token-embedding rows) and
sgm/util.py:202-251 (merge at load: token rows appended, references
re-registered, pose weights loaded non-strictly).

Two on-disk formats:
* the reference's torch ``delta_state_dict`` naming (import AND export, so
  checkpoints interchange with the original CUDA implementation);
* a torch-free ``.npz`` native format (save_delta_npz/load_delta_npz).

In-memory, a delta is the FLAT reference ``delta_state_dict``: torch keys
for the pose weights (``...pose_emb_layers.weight``, ``...pose_featurenerf.
model.*``) and per-block ``...references`` buffers, plus one ``"embed"``
entry holding ``[clip_l_rows (M,768), open_clip_rows (M,1280)]``.
"""
from __future__ import annotations

from typing import Dict, Iterator, Tuple

import numpy as np
import jax.numpy as jnp

from ..models.unet import UNetConfig, build_unet_spec


def iter_pose_blocks(cfg: UNetConfig) -> Iterator[Tuple[str, Tuple, int, int]]:
    """Yields (torch_prefix, tree_path, attn_id, depth) for every FeatureNeRF
    block. tree_path indexes params["unet"]: (section, i, j) with section in
    {input_blocks, middle_block, output_blocks}; middle_block has no i."""
    inb, mid, outb, _ = build_unet_spec(cfg)

    def emit(section, i, j, spec):
        if spec[0] != "attn":
            return
        _, ch, depth, attn_id = spec
        tcfg = cfg.transformer_config(ch, depth, attn_id)
        for d in range(depth):
            if tcfg.block_has_nerf(d):
                if section == "middle_block":
                    prefix = f"model.diffusion_model.middle_block.{j}.transformer_blocks.{d}"
                    path = ("middle_block", j)
                else:
                    prefix = f"model.diffusion_model.{section}.{i}.{j}.transformer_blocks.{d}"
                    path = (section, i, j)
                yield prefix, path, attn_id, d

    for i, block in enumerate(inb):
        for j, spec in enumerate(block):
            yield from emit("input_blocks", i, j, spec)
    for j, spec in enumerate(mid):
        yield from emit("middle_block", None, j, spec)
    for i, block in enumerate(outb):
        for j, spec in enumerate(block):
            yield from emit("output_blocks", i, j, spec)


def _get_block(unet_params, path, d):
    if path[0] == "middle_block":
        st = unet_params["middle_block"][path[1]]
    else:
        st = unet_params[path[0]][path[1]][path[2]]
    return st["blocks"][d]


_POSE_LEAVES = [
    # (torch suffix, tree keys, transpose)
    (".pose_emb_layers.weight", ("pose_emb_layers", "w"), True),
    (".pose_featurenerf.model.plane_coefs.0.weight", ("pose_featurenerf", "plane_coefs", "l1", "w"), True),
    (".pose_featurenerf.model.plane_coefs.0.bias", ("pose_featurenerf", "plane_coefs", "l1", "b"), False),
    (".pose_featurenerf.model.plane_coefs.2.weight", ("pose_featurenerf", "plane_coefs", "l2", "w"), True),
    (".pose_featurenerf.model.plane_coefs.2.bias", ("pose_featurenerf", "plane_coefs", "l2", "b"), False),
    (".pose_featurenerf.model.decoder.weight", ("pose_featurenerf", "decoder", "w"), True),
    (".pose_featurenerf.model.nviews.weight", ("pose_featurenerf", "nviews", "w"), True),
    (".pose_featurenerf.model.nviews.bias", ("pose_featurenerf", "nviews", "b"), False),
]


def _tree_get(d, keys):
    for k in keys:
        if k not in d:
            return None
        d = d[k]
    return d


def _tree_set(d, keys, value):
    for k in keys[:-1]:
        d = d.setdefault(k, {})
    d[keys[-1]] = value


def apply_delta_state_dict(
    params: dict,
    sd_delta: Dict[str, np.ndarray],
    cfg: UNetConfig = UNetConfig(),
):
    """Merge a reference-format delta_state_dict into {unet, conditioner}
    params (mutates unet blocks; returns (params, references)).

    references: {attn_id: {d: jnp (Nref+1, hw, C)}} token-grid feature
    buffers (NHWC token order = reference row-major hw)."""
    references: dict = {}
    for prefix, path, attn_id, d in iter_pose_blocks(cfg):
        blk = _get_block(params["unet"], path, d)
        for suffix, keys, transpose in _POSE_LEAVES:
            tk = prefix + suffix
            if tk in sd_delta:
                v = np.asarray(sd_delta[tk])
                _tree_set(blk, keys, jnp.asarray(v.T if transpose else v))
        rk = prefix + ".references"
        if rk in sd_delta:
            references.setdefault(attn_id, {})[d] = jnp.asarray(
                np.asarray(sd_delta[rk])
            )
    if "embed" in sd_delta and "conditioner" in params:
        rows_l, rows_g = sd_delta["embed"]
        params["conditioner"]["clip_l"]["modifier_rows"] = jnp.asarray(
            np.asarray(rows_l)
        )
        params["conditioner"]["open_clip"]["modifier_rows"] = jnp.asarray(
            np.asarray(rows_g)
        )
    return params, references


def extract_delta(
    params: dict,
    references: dict | None = None,
    cfg: UNetConfig = UNetConfig(),
) -> Dict[str, np.ndarray]:
    """Build a reference-format delta_state_dict from our params (numpy)."""
    out: Dict[str, np.ndarray] = {}
    for prefix, path, attn_id, d in iter_pose_blocks(cfg):
        blk = _get_block(params["unet"], path, d)
        for suffix, keys, transpose in _POSE_LEAVES:
            v = _tree_get(blk, keys)
            if v is None:
                continue
            v = np.asarray(v)
            out[prefix + suffix] = v.T if transpose else v
        if references and d in references.get(attn_id, {}):
            out[prefix + ".references"] = np.asarray(references[attn_id][d])
    if "conditioner" in params:
        out["embed"] = [
            np.asarray(params["conditioner"]["clip_l"]["modifier_rows"]),
            np.asarray(params["conditioner"]["open_clip"]["modifier_rows"]),
        ]
    return out


def save_delta_npz(path: str, sd_delta: Dict[str, np.ndarray]) -> None:
    flat = {}
    for k, v in sd_delta.items():
        if k == "embed":
            flat["embed.0"], flat["embed.1"] = v[0], v[1]
        else:
            flat[k] = v
    np.savez(path, **flat)


def load_delta_npz(path: str) -> Dict[str, np.ndarray]:
    data = dict(np.load(path))
    if "embed.0" in data:
        data["embed"] = [data.pop("embed.0"), data.pop("embed.1")]
    return data


def load_delta_torch(path: str) -> Dict[str, np.ndarray]:
    """Reference .ckpt with a 'delta_state_dict' entry (main.py:620-624)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj["delta_state_dict"]
    out = {}
    for k, v in sd.items():
        if k == "embed":
            out["embed"] = [x.detach().cpu().numpy() for x in v]
        else:
            out[k] = v.detach().cpu().numpy()
    return out
