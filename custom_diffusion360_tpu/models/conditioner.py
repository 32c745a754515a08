"""SDXL conditioner: two text towers + size-tuple embedders, target/ref aware.

TPU-native redesign of GeneralConditioner (sgm/modules/encoders/
modules.py:73-230) with the train_co3d_concept.yaml:59-96 embedder stack:

  crossattn = [CLIP-L final (768) | bigG penultimate (1280)]    -> (*, 77, 2048)
  vector    = [bigG pooled (1280) | orig_size PE (512) |
               crop_coords PE (512) | target_size PE (512)]     -> (*, 2816)

Batch layout contract (modules.py:203-208): the B target rows come first,
then the n_ref*B reference rows (sample-major), concatenated along batch.
Tokenization happens host-side (data/tokenizer.py); this module consumes
int32 token ids: ``tokens_clip``/``tokens_open`` (B, 77) and the ``_ref``
variants (B*n, 77).

``force_zero_txt`` zeroes the text embedders' contributions (crossattn and
pooled vector) like force_uc_zero_embeddings=["txt"]; ``ref=False``
reproduces force_ref_zero_embeddings=True (target rows only, used at
inference where reference features are precomputed buffers).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .clip import (
    CLIP_L_CONFIG,
    OPEN_CLIP_BIGG_CONFIG,
    ClipTextConfig,
    clip_text_apply,
    init_clip_text_params,
)
from .nn import timestep_embedding


@dataclasses.dataclass(frozen=True)
class ConditionerConfig:
    clip_l: ClipTextConfig = CLIP_L_CONFIG
    open_clip: ClipTextConfig = OPEN_CLIP_BIGG_CONFIG
    size_outdim: int = 256  # ConcatTimestepEmbedderND outdim (yaml:84)


def init_conditioner_params(key, cfg: ConditionerConfig = ConditionerConfig()):
    k1, k2 = jax.random.split(key)
    return {
        "clip_l": init_clip_text_params(k1, cfg.clip_l),
        "open_clip": init_clip_text_params(k2, cfg.open_clip),
    }


def embed_size_tuple(x, outdim: int = 256):
    """ConcatTimestepEmbedderND (modules.py:1117-1134): embed each coordinate
    with the sinusoidal timestep embedding and concat. x: (B, D) -> (B, D*outdim)."""
    b, d = x.shape
    emb = timestep_embedding(x.reshape(-1), outdim)
    return emb.reshape(b, d * outdim)


def _embed_rows(params, tokens_clip, tokens_open, sizes, cfg, force_zero_txt):
    out_l = clip_text_apply(params["clip_l"], tokens_clip, cfg.clip_l)["final"]
    out_g = clip_text_apply(params["open_clip"], tokens_open, cfg.open_clip)
    crossattn = jnp.concatenate([out_l, out_g["penultimate"]], axis=-1)
    pooled = out_g["pooled"]
    if force_zero_txt:
        crossattn = jnp.zeros_like(crossattn)
        pooled = jnp.zeros_like(pooled)
    vec_parts = [pooled] + [embed_size_tuple(s, cfg.size_outdim) for s in sizes]
    vector = jnp.concatenate(vec_parts, axis=-1)
    return crossattn, vector


def apply_conditioner(
    params,
    batch: dict,
    cfg: ConditionerConfig = ConditionerConfig(),
    *,
    force_zero_txt: bool = False,
    ref: bool = True,
):
    """batch keys: tokens_clip, tokens_open (B,77); original_size, crop_coords,
    target_size (B,2); plus *_ref variants ((B*n,...)) when ``ref``.

    Returns {"crossattn": ((1+n)B, 77, 2048), "vector": ((1+n)B, 2816)}
    (target rows first).
    """
    sizes = [
        batch["original_size"],
        batch["crop_coords"],
        batch["target_size"],
    ]
    ca, vec = _embed_rows(
        params, batch["tokens_clip"], batch["tokens_open"], sizes, cfg, force_zero_txt
    )
    if not ref:
        return {"crossattn": ca, "vector": vec}

    sizes_ref = [
        batch["original_size_ref"],
        batch["crop_coords_ref"],
        batch["target_size_ref"],
    ]
    ca_r, vec_r = _embed_rows(
        params,
        batch["tokens_clip_ref"],
        batch["tokens_open_ref"],
        sizes_ref,
        cfg,
        force_zero_txt,
    )
    return {
        "crossattn": jnp.concatenate([ca, ca_r], axis=0),
        "vector": jnp.concatenate([vec, vec_r], axis=0),
    }


def get_unconditional_conditioning(
    params,
    batch_c: dict,
    batch_uc: Optional[dict] = None,
    cfg: ConditionerConfig = ConditionerConfig(),
    *,
    force_uc_zero_txt: bool = True,
    ref: bool = False,
):
    """(c, uc) pair (modules.py:213-230). ``ref=False`` matches inference
    (force_ref_zero_embeddings=True, sample.py:155-161)."""
    c = apply_conditioner(params, batch_c, cfg, ref=ref)
    uc = apply_conditioner(
        params,
        batch_uc if batch_uc is not None else batch_c,
        cfg,
        force_zero_txt=force_uc_zero_txt,
        ref=ref,
    )
    return c, uc
