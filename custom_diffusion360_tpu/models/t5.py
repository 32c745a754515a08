"""Functional T5 text encoder (T5/T5-v1.1/ByT5) + torch weight importer.

Reference: FrozenT5Embedder / FrozenByT5Embedder
(sgm/modules/encoders/modules.py:295-374) wrap HuggingFace
``T5EncoderModel``; these embedders are part of the sgm framework surface
(unused by the CustomDiffusion360 method's config but selectable). This is a
from-scratch functional encoder over a param pytree:

* RMS layer norm with f32 statistics (HF T5LayerNorm);
* relative-position-bucket attention bias computed once (block 0's
  embedding) and shared by all layers, exactly like HF;
* T5 attention is UNSCALED (no 1/sqrt(d_kv); folded into init by T5);
* gated-GELU feed-forward for v1.1/ByT5, ReLU for original T5;
* embedding lookups as flat 1-D ``jnp.take`` (multi-dim gathers are a
  known slow-compile landmine on this backend — see NOTES.md).

The reference calls the encoder without an attention mask
(modules.py:325-328: ``self.transformer(input_ids=tokens)``), so padded
positions attend normally; an optional mask argument is still provided.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "T5Config",
    "init_t5_params",
    "t5_encode",
    "load_t5_torch",
    "byt5_tokenize",
]


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 512
    d_kv: int = 64
    d_ff: int = 1024
    num_layers: int = 8
    num_heads: int = 6
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    gated_ff: bool = True  # v1.1/ByT5 "gated-gelu"; False = original T5 ReLU
    layer_norm_eps: float = 1e-6


BYT5_BASE = T5Config(
    # google/byt5-base (ByT5Tokenizer is byte-level; vocab 384 = 256 bytes
    # + 3 specials + 125 extra sentinels)
    vocab_size=384, d_model=1536, d_kv=64, d_ff=3968, num_layers=12,
    num_heads=12,
)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _normal(key, shape, std):
    return jax.random.normal(key, shape, jnp.float32) * std


def init_t5_params(key, cfg: T5Config = T5Config()):
    """HF T5 _init_weights factors: embeddings std 1.0; q std
    (d_model*d_kv)^-0.5, k/v std d_model^-0.5, o std (h*d_kv)^-0.5; ff wi
    std d_model^-0.5, wo std d_ff^-0.5."""
    n_keys = 3 + cfg.num_layers * 8
    keys = iter(jax.random.split(key, n_keys))
    inner = cfg.num_heads * cfg.d_kv
    p = {
        "shared": _normal(next(keys), (cfg.vocab_size, cfg.d_model), 1.0),
        "rel_bias": _normal(
            next(keys),
            (cfg.relative_attention_num_buckets, cfg.num_heads),
            (inner * cfg.num_layers) ** -0.5,
        ),
        "final_norm": jnp.ones((cfg.d_model,), jnp.float32),
        "blocks": [],
    }
    for _ in range(cfg.num_layers):
        blk = {
            "attn_norm": jnp.ones((cfg.d_model,), jnp.float32),
            "q": _normal(next(keys), (cfg.d_model, inner),
                         (cfg.d_model * cfg.d_kv) ** -0.5),
            "k": _normal(next(keys), (cfg.d_model, inner), cfg.d_model**-0.5),
            "v": _normal(next(keys), (cfg.d_model, inner), cfg.d_model**-0.5),
            "o": _normal(next(keys), (inner, cfg.d_model), inner**-0.5),
            "ff_norm": jnp.ones((cfg.d_model,), jnp.float32),
            "wo": _normal(next(keys), (cfg.d_ff, cfg.d_model), cfg.d_ff**-0.5),
        }
        if cfg.gated_ff:
            blk["wi_0"] = _normal(next(keys), (cfg.d_model, cfg.d_ff),
                                  cfg.d_model**-0.5)
            blk["wi_1"] = _normal(next(keys), (cfg.d_model, cfg.d_ff),
                                  cfg.d_model**-0.5)
        else:
            blk["wi"] = _normal(next(keys), (cfg.d_model, cfg.d_ff),
                                cfg.d_model**-0.5)
            next(keys)  # keep key budget layout identical
        p["blocks"].append(blk)
    return p


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _rms_norm(w, x, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w.astype(x.dtype)


def _relative_position_bucket(rel_pos, num_buckets, max_distance):
    """HF T5Attention._relative_position_bucket, bidirectional=True."""
    nb = num_buckets // 2
    ret = (rel_pos > 0).astype(jnp.int32) * nb
    n = jnp.abs(rel_pos)
    max_exact = nb // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-20)
        / math.log(max_distance / max_exact)
        * (nb - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, nb - 1)
    return ret + jnp.where(is_small, n, val_large)


def _position_bias(params, seq_len, cfg: T5Config, dtype):
    ctx = jnp.arange(seq_len)[:, None]
    mem = jnp.arange(seq_len)[None, :]
    bucket = _relative_position_bucket(
        mem - ctx,
        cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance,
    )
    # (L, L) int -> flat take -> (L, L, H) -> (1, H, L, L)
    bias = jnp.take(params["rel_bias"], bucket.reshape(-1), axis=0)
    bias = bias.reshape(seq_len, seq_len, -1).transpose(2, 0, 1)[None]
    return bias.astype(dtype)


def t5_encode(params, tokens, cfg: T5Config = T5Config(), mask=None,
              dtype=jnp.float32):
    """tokens: (B, L) int32 -> last hidden state (B, L, d_model).

    Matches HF T5EncoderModel.forward at eval (dropout off). ``mask``
    ((B, L), 1 = keep) is optional; the reference embedders never pass one.
    """
    b, L = tokens.shape
    h = jnp.take(params["shared"], tokens.reshape(-1), axis=0)
    h = h.reshape(b, L, -1).astype(dtype)
    bias = _position_bias(params, L, cfg, jnp.float32)
    if mask is not None:
        neg = jnp.finfo(jnp.float32).min
        bias = bias + jnp.where(mask, 0.0, neg)[:, None, None, :]

    nh, dk = cfg.num_heads, cfg.d_kv
    for blk in params["blocks"]:
        # self-attention (unscaled q @ k^T + shared position bias)
        x = _rms_norm(blk["attn_norm"], h, cfg.layer_norm_eps)
        q = (x @ blk["q"].astype(dtype)).reshape(b, L, nh, dk)
        k = (x @ blk["k"].astype(dtype)).reshape(b, L, nh, dk)
        v = (x @ blk["v"].astype(dtype)).reshape(b, L, nh, dk)
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) + bias
        w = jax.nn.softmax(scores, axis=-1).astype(dtype)
        a = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, L, nh * dk)
        h = h + a @ blk["o"].astype(dtype)

        # feed-forward
        x = _rms_norm(blk["ff_norm"], h, cfg.layer_norm_eps)
        if cfg.gated_ff:
            g = jax.nn.gelu(x @ blk["wi_0"].astype(dtype), approximate=True)
            x = g * (x @ blk["wi_1"].astype(dtype))
        else:
            x = jax.nn.relu(x @ blk["wi"].astype(dtype))
        h = h + x @ blk["wo"].astype(dtype)

    return _rms_norm(params["final_norm"], h, cfg.layer_norm_eps)


# ---------------------------------------------------------------------------
# torch import (HF T5EncoderModel state dict)
# ---------------------------------------------------------------------------


def load_t5_torch(state_dict, cfg: T5Config = T5Config()):
    """HF ``T5EncoderModel.state_dict()`` (tensors or numpy) -> param pytree.

    Linear weights transpose to this package's (in, out) convention.
    """
    import numpy as np

    def arr(name, transpose=False):
        t = state_dict[name]
        a = np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                       dtype=np.float32)
        return jnp.asarray(a.T if transpose else a)

    p = {
        "shared": arr("shared.weight"),
        "rel_bias": arr(
            "encoder.block.0.layer.0.SelfAttention"
            ".relative_attention_bias.weight"
        ),
        "final_norm": arr("encoder.final_layer_norm.weight"),
        "blocks": [],
    }
    for i in range(cfg.num_layers):
        pre = f"encoder.block.{i}.layer"
        blk = {
            "attn_norm": arr(f"{pre}.0.layer_norm.weight"),
            "q": arr(f"{pre}.0.SelfAttention.q.weight", True),
            "k": arr(f"{pre}.0.SelfAttention.k.weight", True),
            "v": arr(f"{pre}.0.SelfAttention.v.weight", True),
            "o": arr(f"{pre}.0.SelfAttention.o.weight", True),
            "ff_norm": arr(f"{pre}.1.layer_norm.weight"),
        }
        if cfg.gated_ff:
            blk["wi_0"] = arr(f"{pre}.1.DenseReluDense.wi_0.weight", True)
            blk["wi_1"] = arr(f"{pre}.1.DenseReluDense.wi_1.weight", True)
        else:
            blk["wi"] = arr(f"{pre}.1.DenseReluDense.wi.weight", True)
        blk["wo"] = arr(f"{pre}.1.DenseReluDense.wo.weight", True)
        p["blocks"].append(blk)
    return p


# ---------------------------------------------------------------------------
# ByT5 tokenizer (byte-level; modules.py:335-374 uses ByT5Tokenizer)
# ---------------------------------------------------------------------------


def byt5_tokenize(texts, max_length=77):
    """UTF-8 byte tokenizer: id = byte + 3 (0=pad, 1=eos, 2=unk), truncate
    to max_length-1, append eos, pad with 0 — HF ByT5Tokenizer with
    padding="max_length", truncation=True. Returns (ids, mask) int32
    numpy arrays shaped (B, max_length).

    (The sentencepiece T5 tokenizer for FrozenT5Embedder needs its external
    .model file; pass pre-tokenized ids to t5_encode for that variant.)
    """
    import numpy as np

    if isinstance(texts, str):
        texts = [texts]
    ids = np.zeros((len(texts), max_length), np.int32)
    mask = np.zeros((len(texts), max_length), np.int32)
    for r, text in enumerate(texts):
        bs = list(text.encode("utf-8"))[: max_length - 1]
        row = [b + 3 for b in bs] + [1]
        ids[r, : len(row)] = row
        mask[r, : len(row)] = 1
    return ids, mask
