"""CLIP text towers (SDXL's two text encoders) with V* modifier-token rows.

TPU-native redesign of the reference's FrozenCLIPEmbedder (CLIP ViT-L text,
sgm/modules/encoders/modules.py:378-516) and FrozenOpenCLIPEmbedder (ViT-bigG
text, :622-771). One generic pre-LN causal transformer covers both towers;
the differences are config (width/layers/activation) and which output is
consumed:

* CLIP-L ("hidden layer 11" in config, but the fork's custom_forward
  (modules.py:457-481) actually runs ALL 12 layers + final_layer_norm and
  returns that — reproduced here as ``final``);
* bigG: ``penultimate`` hidden state (no final LN) as crossattn features and
  ``pooled`` = ln_final(last)[eot] @ text_projection (modules.py:721-752).

Modifier-token mechanics (modules.py:417-431, 678-691): the V* token rows
live in a separate ``modifier_rows`` param concatenated after the frozen
embedding table; gradient isolation of all non-V* rows (main.py:627-643's
grad masking) holds by construction — only ``modifier_rows`` is placed in
the trainable pytree.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .nn import layer_norm, layer_norm_init, linear, linear_init


@dataclasses.dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_ratio: int = 4
    context_length: int = 77
    act: str = "quick_gelu"  # CLIP-L; bigG uses "gelu"
    ln_eps: float = 1e-5
    num_modifier_tokens: int = 1
    text_projection: bool = False  # bigG pooled path


CLIP_L_CONFIG = ClipTextConfig()
OPEN_CLIP_BIGG_CONFIG = ClipTextConfig(
    width=1280, layers=32, heads=20, act="gelu", text_projection=True
)


def _act(name):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    raise ValueError(name)


def _init_block(key, cfg: ClipTextConfig):
    d, m = cfg.width, cfg.width * cfg.mlp_ratio
    ks = jax.random.split(key, 6)
    return {
        "ln1": layer_norm_init(d),
        "q": linear_init(ks[0], d, d),
        "k": linear_init(ks[1], d, d),
        "v": linear_init(ks[2], d, d),
        "o": linear_init(ks[3], d, d),
        "ln2": layer_norm_init(d),
        "fc1": linear_init(ks[4], d, m),
        "fc2": linear_init(ks[5], m, d),
    }


def init_clip_text_params(key, cfg: ClipTextConfig):
    ks = jax.random.split(key, cfg.layers + 5)
    blocks = [_init_block(ks[i], cfg) for i in range(cfg.layers)]
    # stack layer params for lax.scan
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    p = {
        "token_embedding": jax.random.normal(
            ks[-1], (cfg.vocab_size, cfg.width), jnp.float32
        )
        * 0.02,
        "positional_embedding": jax.random.normal(
            ks[-2], (cfg.context_length, cfg.width), jnp.float32
        )
        * 0.01,
        "blocks": stacked,
        "ln_final": layer_norm_init(cfg.width),
        "modifier_rows": jnp.zeros((cfg.num_modifier_tokens, cfg.width), jnp.float32),
    }
    if cfg.text_projection:
        p["text_projection"] = {
            "w": jax.random.normal(ks[-3], (cfg.width, cfg.width), jnp.float32)
            * cfg.width**-0.5
        }
    return p


def init_modifier_rows(params, init_token_ids=(42170,)):
    """Seed the V* rows from existing token rows (modules.py:428-431:
    <new1> initialized from token id 42170)."""
    rows = jnp.stack(
        [params["token_embedding"][i] for i in init_token_ids]
    )
    return dict(params, modifier_rows=rows)


def _block_apply(p, x, mask, act, cfg: ClipTextConfig):
    b, t, d = x.shape
    h = cfg.heads
    hd = d // h
    y = layer_norm(p["ln1"], x, eps=cfg.ln_eps)
    q = linear(p["q"], y).reshape(b, t, h, hd)
    k = linear(p["k"], y).reshape(b, t, h, hd)
    v = linear(p["v"], y).reshape(b, t, h, hd)
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
    logits = logits * (hd**-0.5) + mask
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    attn = jnp.einsum("bhnm,bmhd->bnhd", probs, v).reshape(b, t, d)
    x = x + linear(p["o"], attn)
    y = layer_norm(p["ln2"], x, eps=cfg.ln_eps)
    x = x + linear(p["fc2"], act(linear(p["fc1"], y)))
    return x


def clip_text_apply(params, tokens, cfg: ClipTextConfig):
    """tokens: (B, 77) int32; ids >= vocab_size index ``modifier_rows``.

    Returns dict: last (B,77,D), penultimate (B,77,D), final (B,77,D)
    (=ln_final(last)), pooled (B,D) or None.
    """
    table = jnp.concatenate(
        [params["token_embedding"], params["modifier_rows"]], axis=0
    )
    # flattened 1-D gather: multi-dim index gathers compile pathologically
    # slowly on the TPU backend (minutes vs sub-second)
    b, t = tokens.shape
    # mode="clip": out-of-range ids clamp (jnp.take's default fills NaN)
    x = jnp.take(table, tokens.reshape(-1), axis=0, mode="clip").reshape(b, t, -1)
    x = x + params["positional_embedding"][None, :t]

    mask = jnp.triu(jnp.full((t, t), -jnp.inf, jnp.float32), k=1)[None, None]
    act = _act(cfg.act)

    def body(x, bp):
        out = _block_apply(bp, x, mask, act, cfg)
        return out, out

    last, states = jax.lax.scan(body, x, params["blocks"])
    penultimate = states[-2] if cfg.layers >= 2 else x
    final = layer_norm(params["ln_final"], last, eps=cfg.ln_eps)

    pooled = None
    if "text_projection" in params:
        # eot = highest token id per row (modules.py:748-752); flat 1-D gather
        eot = jnp.argmax(tokens, axis=-1)
        flat = final.reshape(b * t, -1)
        rows = jnp.take(flat, eot + jnp.arange(b) * t, axis=0, mode="clip")
        pooled = rows @ params["text_projection"]["w"]
    return {"last": last, "penultimate": penultimate, "final": final, "pooled": pooled}
