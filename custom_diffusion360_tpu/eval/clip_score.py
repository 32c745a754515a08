"""CLIP similarity metrics over this package's CLIP towers.

CLIP-T (image/text) and CLIP-I (image/image) cosine similarities, the two
customization-quality metrics of the paper's evaluation protocol
(arXiv 2404.12333 — the reference repo ships no eval code, README.md:114).
Uses models/clip.py's text tower (pooled eot projection) and vision tower;
both are independently parity-tested against torch.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..models.clip import (
    ClipTextConfig,
    ClipVisionConfig,
    clip_text_apply,
    clip_vision_apply,
)
from ..models.embedders import clip_image_preprocess


def _normalize(x, eps=1e-8):
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + eps)


def clip_image_embed(vision_params, images, cfg: ClipVisionConfig):
    """images: (B, H, W, 3) in [-1, 1] -> L2-normalized (B, D)."""
    z = clip_vision_apply(
        vision_params, clip_image_preprocess(images, cfg.image_size), cfg
    )
    return _normalize(z)


def clip_text_embed(text_params, tokens, cfg: ClipTextConfig):
    """tokens: (B, 77) -> L2-normalized (B, D); requires a tower with
    text_projection (pooled eot path, models/clip.py)."""
    pooled = clip_text_apply(text_params, tokens, cfg)["pooled"]
    if pooled is None:
        raise ValueError("text tower has no text_projection for pooling")
    return _normalize(pooled)


def clip_score(vision_params, text_params, images, tokens,
               vision_cfg: ClipVisionConfig, text_cfg: ClipTextConfig):
    """CLIP-T: per-sample cosine similarity (B,) between generated images
    and their prompts."""
    zi = clip_image_embed(vision_params, images, vision_cfg)
    zt = clip_text_embed(text_params, tokens, text_cfg)
    return jnp.sum(zi * zt, axis=-1)


def clip_image_similarity(vision_params, images_a, images_b,
                          cfg: ClipVisionConfig):
    """CLIP-I: per-sample cosine similarity (B,) between two image sets
    (generated vs. real views of the concept)."""
    za = clip_image_embed(vision_params, images_a, cfg)
    zb = clip_image_embed(vision_params, images_b, cfg)
    return jnp.sum(za * zb, axis=-1)
