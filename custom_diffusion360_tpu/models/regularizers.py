"""Autoencoder latent regularizers: KL (diagonal Gaussian), identity, and the
vector-quantization family.

Reference: sgm/modules/autoencoding/regularizers/{__init__,base,quantize}.py.
The reference method never trains an autoencoder (the SDXL VAE arrives frozen),
but the regularizers are part of the framework surface, so they are provided
here as pure functions over param/state pytrees.

TPU-native deviations from the torch module surface (documented, intentional):

* activations are channels-last ``(..., C)`` like the rest of this package
  (reference quantizers take NCHW and permute — quantize.py:238-245,397-399);
* randomness (gumbel noise, "random" unknown-index remap) takes explicit PRNG
  keys instead of global torch RNG state;
* the EMA quantizer's codebook statistics are functional state threaded
  through ``ema_vq_apply`` (reference mutates buffers in-place,
  quantize.py:323-352).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .nn import conv2d_init, conv2d, linear_init, linear

# ---------------------------------------------------------------------------
# non-quantizing regularizers (regularizers/__init__.py:13-31, base.py:21-26)
# ---------------------------------------------------------------------------


def diagonal_gaussian_regularizer(z, key=None, sample=True):
    """z: (..., 2C) moments -> (z_out (..., C), {"kl_loss"}).

    Reference: DiagonalGaussianRegularizer (regularizers/__init__.py:13-31) +
    DiagonalGaussianDistribution (distributions/distributions.py:24-62). The
    KL is summed per sample against N(0, I) and averaged over the batch.
    """
    mean, logvar = jnp.split(z, 2, axis=-1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    if sample:
        if key is None:
            raise ValueError("sampling the posterior requires a PRNG key")
        z_out = mean + std * jax.random.normal(key, mean.shape, mean.dtype)
    else:
        z_out = mean
    var = jnp.exp(logvar)
    kl = 0.5 * jnp.sum(
        (mean.astype(jnp.float32) ** 2 + var - 1.0 - logvar).reshape(
            z.shape[0], -1
        ),
        axis=-1,
    )
    return z_out, {"kl_loss": jnp.mean(kl)}


def identity_regularizer(z):
    """Reference: IdentityRegularizer (regularizers/base.py:21-26)."""
    return z, {}


def measure_perplexity(indices, num_centroids):
    """Cluster-usage perplexity of codebook assignments.

    Reference: measure_perplexity (regularizers/base.py:29-40). Returns
    (perplexity, number of clusters in use).
    """
    counts = jnp.bincount(indices.reshape(-1), length=num_centroids)
    avg_probs = counts.astype(jnp.float32) / indices.size
    perplexity = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))
    cluster_use = jnp.sum(avg_probs > 0)
    return perplexity, cluster_use


# ---------------------------------------------------------------------------
# index remapping for restricted codebooks (quantize.py:26-52)
# ---------------------------------------------------------------------------


def remap_to_used(indices, used, unknown_index="random", key=None):
    """Map raw codebook ids onto positions in the ``used`` subset.

    Reference: AbstractQuantizer.remap_to_used (quantize.py:26-41). Ids not in
    ``used`` map to ``unknown_index`` (an int, or "random" for a uniform draw
    over ``len(used)`` — the explicit-key version of torch.randint there).
    """
    match = indices[..., None] == used
    new = jnp.argmax(match, axis=-1)
    unknown = ~jnp.any(match, axis=-1)
    if unknown_index == "random":
        if key is None:
            raise ValueError('unknown_index="random" requires a PRNG key')
        rand = jax.random.randint(key, new.shape, 0, used.shape[0])
        return jnp.where(unknown, rand, new)
    return jnp.where(unknown, jnp.asarray(unknown_index, new.dtype), new)


def unmap_to_all(indices, used):
    """Inverse of remap_to_used; out-of-range entries collapse to used[0]
    (quantize.py:43-52)."""
    indices = jnp.where(indices >= used.shape[0], 0, indices)
    return jnp.take(used, indices)


# ---------------------------------------------------------------------------
# VectorQuantizer (quantize.py:172-320)
# ---------------------------------------------------------------------------


def vq_init(key, n_e, e_dim):
    """Uniform(-1/n_e, 1/n_e) codebook (quantize.py:203-204)."""
    emb = jax.random.uniform(key, (n_e, e_dim), jnp.float32, -1.0 / n_e, 1.0 / n_e)
    return {"embedding": emb}


def _nearest_code(z_flat, emb):
    """argmin_j ||z - e_j||^2 via the expanded form (quantize.py:250-259)."""
    d = (
        jnp.sum(z_flat**2, axis=1, keepdims=True)
        + jnp.sum(emb**2, axis=1)
        - 2.0 * (z_flat @ emb.T)
    )
    return jnp.argmin(d, axis=1)


def vq_apply(
    params,
    z,
    beta=0.25,
    used=None,
    unknown_index="random",
    key=None,
    sane_index_shape=False,
    log_perplexity=False,
):
    """z: (..., e_dim) channels-last -> (z_q, loss_dict).

    Straight-through estimator + commitment loss
    ``beta*||sg[z_q]-z||^2 + ||z_q-sg[z]||^2`` (quantize.py:269-275). The
    loss dict carries "loss/vq", "min_encoding_indices", and optionally
    perplexity stats.
    """
    emb = params["embedding"]
    z_flat = z.reshape(-1, emb.shape[1]).astype(jnp.float32)
    idx = _nearest_code(z_flat, emb)
    z_q = jnp.take(emb, idx, axis=0).reshape(z.shape).astype(z.dtype)

    loss_dict = {}
    if log_perplexity:
        perplexity, cluster_use = measure_perplexity(idx, emb.shape[0])
        loss_dict.update({"perplexity": perplexity, "cluster_usage": cluster_use})

    zf = z.astype(jnp.float32)
    zqf = z_q.astype(jnp.float32)
    loss = beta * jnp.mean((jax.lax.stop_gradient(zqf) - zf) ** 2) + jnp.mean(
        (zqf - jax.lax.stop_gradient(zf)) ** 2
    )
    loss_dict["loss/vq"] = loss

    # straight-through (quantize.py:275)
    z_q = z + jax.lax.stop_gradient(z_q - z)

    if used is not None:
        idx = remap_to_used(
            idx.reshape(z.shape[0], -1), used, unknown_index, key
        ).reshape(-1)
    if sane_index_shape:
        idx = idx.reshape(z.shape[:-1])
    loss_dict["min_encoding_indices"] = idx
    return z_q, loss_dict


def vq_codebook_entry(params, indices, shape=None, used=None):
    """Look codebook rows back up (quantize.py:302-320). ``shape`` is the
    channels-last target shape (reference permutes to NCHW; we stay NHWC)."""
    if used is not None:
        indices = unmap_to_all(indices, used)
    z_q = jnp.take(params["embedding"], indices.reshape(-1), axis=0)
    if shape is not None:
        z_q = z_q.reshape(shape)
    return z_q


# ---------------------------------------------------------------------------
# GumbelQuantizer (quantize.py:64-169)
# ---------------------------------------------------------------------------


def gumbel_vq_init(key, num_hiddens, embedding_dim, n_embed):
    """1x1 conv projection to logits + codebook (quantize.py:95-96)."""
    k1, k2 = jax.random.split(key)
    return {
        "proj": conv2d_init(k1, num_hiddens, n_embed, kernel=1),
        "embedding": jax.random.normal(k2, (n_embed, embedding_dim), jnp.float32),
    }


def gumbel_vq_apply(
    params,
    z,
    key=None,
    temp=1.0,
    hard=True,
    kl_weight=5e-4,
    noise=None,
    return_logits=False,
):
    """z: NHWC -> (z_q NHW(e_dim), out_dict).

    Gumbel-softmax relaxed quantization with straight-through hard one-hot
    (quantize.py:119-156; torch F.gumbel_softmax re-derived). ``noise``
    overrides the sampled Gumbel noise (for tests); ``hard`` mirrors the
    reference's straight_through (forced on in eval)."""
    logits = conv2d(params["proj"], z)
    if noise is None:
        if key is None:
            raise ValueError("gumbel sampling requires a PRNG key")
        noise = jax.random.gumbel(key, logits.shape, jnp.float32)
    y_soft = jax.nn.softmax((logits.astype(jnp.float32) + noise) / temp, axis=-1)
    if hard:
        idx = jnp.argmax(y_soft, axis=-1)
        y_hard = jax.nn.one_hot(idx, logits.shape[-1], dtype=y_soft.dtype)
        one_hot = y_hard + y_soft - jax.lax.stop_gradient(y_soft)
    else:
        one_hot = y_soft
        idx = jnp.argmax(y_soft, axis=-1)
    z_q = one_hot @ params["embedding"]

    qy = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    n_embed = logits.shape[-1]
    diff = kl_weight * jnp.mean(
        jnp.sum(qy * jnp.log(qy * n_embed + 1e-10), axis=-1)
    )
    out = {"loss/vq": diff, "indices": idx}
    if return_logits:
        out["logits"] = logits
    return z_q.astype(z.dtype), out


def gumbel_vq_codebook_entry(params, indices):
    """indices: integer (...,) -> (..., e_dim) (quantize.py:158-169)."""
    return jnp.take(params["embedding"], indices, axis=0)


# ---------------------------------------------------------------------------
# EMAVectorQuantizer (quantize.py:323-443)
# ---------------------------------------------------------------------------


def ema_vq_init(key, n_embed, embedding_dim):
    """Codebook + EMA statistics as explicit state (quantize.py:323-332)."""
    weight = jax.random.normal(key, (n_embed, embedding_dim), jnp.float32)
    return {
        "weight": weight,
        "cluster_size": jnp.zeros((n_embed,), jnp.float32),
        "embed_avg": weight,
    }


def ema_vq_apply(state, z, beta, decay=0.99, eps=1e-5, update=True):
    """z: (..., e_dim) -> (z_q, out_dict, new_state).

    Reference: EMAVectorQuantizer.forward (quantize.py:396-443). The codebook
    tracks an exponential moving average of assigned vectors (cluster-size
    EMA + Laplace-smoothed mean, quantize.py:337-352); pass update=False at
    eval to freeze the state.
    """
    weight = state["weight"]
    z_flat = z.reshape(-1, weight.shape[1]).astype(jnp.float32)
    idx = _nearest_code(z_flat, weight)
    z_q = jnp.take(weight, idx, axis=0).reshape(z.shape).astype(z.dtype)
    encodings = jax.nn.one_hot(idx, weight.shape[0], dtype=jnp.float32)
    avg_probs = jnp.mean(encodings, axis=0)
    perplexity = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))

    if update:
        cluster_size = state["cluster_size"] * decay + jnp.sum(encodings, 0) * (
            1.0 - decay
        )
        embed_avg = state["embed_avg"] * decay + (encodings.T @ z_flat) * (
            1.0 - decay
        )
        n = jnp.sum(cluster_size)
        smoothed = (
            (cluster_size + eps) / (n + weight.shape[0] * eps) * n
        )
        new_state = {
            "cluster_size": cluster_size,
            "embed_avg": embed_avg,
            "weight": embed_avg / smoothed[:, None],
        }
    else:
        new_state = state

    loss = beta * jnp.mean(
        (jax.lax.stop_gradient(z_q.astype(jnp.float32)) - z.astype(jnp.float32))
        ** 2
    )
    z_q = z + jax.lax.stop_gradient(z_q - z)
    out = {
        "loss/vq": loss,
        "encodings": encodings,
        "encoding_indices": idx,
        "perplexity": perplexity,
    }
    return z_q, out, new_state


# ---------------------------------------------------------------------------
# VectorQuantizerWithInputProjection (quantize.py:446-487)
# ---------------------------------------------------------------------------


def vq_proj_init(key, input_dim, n_codes, codebook_dim, output_dim=None):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "vq": vq_init(k1, n_codes, codebook_dim),
        "proj_in": linear_init(k2, input_dim, codebook_dim),
    }
    if output_dim is not None:
        p["proj_out"] = linear_init(k3, codebook_dim, output_dim)
    return p


def vq_proj_apply(params, z, beta=1.0, **kwargs):
    """z: (..., input_dim) -> (z_q (..., out_dim), loss_dict)
    (quantize.py:464-487; channels-last so no rearranging needed)."""
    z = linear(params["proj_in"], z)
    z_q, loss_dict = vq_apply(params["vq"], z, beta=beta, **kwargs)
    if "proj_out" in params:
        z_q = linear(params["proj_out"], z_q)
    return z_q, loss_dict
