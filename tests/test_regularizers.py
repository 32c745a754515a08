"""Regularizer parity vs inline torch re-derivations (random weights).

Reference: sgm/modules/autoencoding/regularizers/{__init__,base,quantize}.py.
Our activations are channels-last; the torch re-derivations below use the
reference's NCHW and the tests transpose at the boundary.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_diffusion360_tpu.models.regularizers import (
    diagonal_gaussian_regularizer,
    ema_vq_apply,
    ema_vq_init,
    gumbel_vq_apply,
    gumbel_vq_codebook_entry,
    gumbel_vq_init,
    identity_regularizer,
    measure_perplexity,
    remap_to_used,
    unmap_to_all,
    vq_apply,
    vq_codebook_entry,
    vq_init,
    vq_proj_apply,
    vq_proj_init,
)

torch = pytest.importorskip("torch")


def test_diagonal_gaussian_kl_matches_torch():
    """KL vs DiagonalGaussianDistribution.kl (distributions.py:49-58)."""
    rng = np.random.default_rng(0)
    moments = rng.normal(size=(2, 4, 4, 8)).astype(np.float32)
    z, log = diagonal_gaussian_regularizer(jnp.asarray(moments), sample=False)

    t = torch.tensor(np.transpose(moments, (0, 3, 1, 2)))
    mean, logvar = torch.chunk(t, 2, dim=1)
    logvar = torch.clamp(logvar, -30.0, 20.0)
    var = torch.exp(logvar)
    kl = 0.5 * torch.sum(mean**2 + var - 1.0 - logvar, dim=[1, 2, 3])
    ref = (torch.sum(kl) / kl.shape[0]).item()
    assert np.allclose(float(log["kl_loss"]), ref, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(z), moments[..., :4], rtol=1e-6, atol=0
    )

    # sampled mode: mean + std * eps
    key = jax.random.PRNGKey(1)
    zs, _ = diagonal_gaussian_regularizer(jnp.asarray(moments), key=key)
    eps = jax.random.normal(key, zs.shape)
    expect = moments[..., :4] + np.exp(0.5 * moments[..., 4:]) * np.asarray(eps)
    np.testing.assert_allclose(np.asarray(zs), expect, rtol=1e-5, atol=1e-6)


def test_identity_regularizer():
    z = jnp.arange(12.0).reshape(3, 4)
    out, log = identity_regularizer(z)
    assert log == {}
    np.testing.assert_array_equal(np.asarray(out), np.asarray(z))


def test_vector_quantizer_matches_torch():
    """VectorQuantizer.forward (quantize.py:234-300)."""
    key = jax.random.PRNGKey(0)
    params = vq_init(key, n_e=16, e_dim=6)
    rng = np.random.default_rng(2)
    z = rng.normal(scale=0.2, size=(2, 4, 4, 6)).astype(np.float32)

    z_q, log = vq_apply(params, jnp.asarray(z), beta=0.25,
                        sane_index_shape=True, log_perplexity=True)

    emb = torch.tensor(np.asarray(params["embedding"]))
    zt = torch.tensor(z).reshape(-1, 6)
    d = (
        zt.pow(2).sum(1, keepdim=True)
        + emb.pow(2).sum(1)
        - 2 * zt @ emb.t()
    )
    idx = torch.argmin(d, dim=1)
    zq_ref = emb[idx].reshape(2, 4, 4, 6)
    loss_ref = 0.25 * torch.mean((zq_ref - torch.tensor(z)) ** 2) + torch.mean(
        (zq_ref - torch.tensor(z)) ** 2
    )
    np.testing.assert_allclose(np.asarray(z_q), zq_ref.numpy(), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(log["min_encoding_indices"]).reshape(-1), idx.numpy()
    )
    assert np.allclose(float(log["loss/vq"]), loss_ref.item(), rtol=1e-5)
    assert float(log["cluster_usage"]) <= 16

    # straight-through: d(loss_like)/dz flows as if z_q were z
    g = jax.grad(lambda x: jnp.sum(vq_apply(params, x)[0] ** 2))(jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(z_q), rtol=1e-5)

    lookup = vq_codebook_entry(params, log["min_encoding_indices"],
                               shape=(2, 4, 4, 6))
    np.testing.assert_allclose(np.asarray(lookup), zq_ref.numpy(), rtol=1e-6)


def test_vq_remap_roundtrip():
    used = jnp.asarray([3, 7, 11])
    idx = jnp.asarray([[3, 11, 7, 5]])
    mapped = remap_to_used(idx, used, unknown_index=0)
    np.testing.assert_array_equal(np.asarray(mapped), [[0, 2, 1, 0]])
    back = unmap_to_all(jnp.asarray([[0, 2, 1, 5]]), used)
    np.testing.assert_array_equal(np.asarray(back), [[3, 11, 7, 3]])
    randomized = remap_to_used(idx, used, key=jax.random.PRNGKey(0))
    assert int(randomized[0, 3]) in (0, 1, 2)


def test_gumbel_quantizer_matches_torch():
    """GumbelQuantizer.forward (quantize.py:119-156) with shared noise."""
    key = jax.random.PRNGKey(3)
    params = gumbel_vq_init(key, num_hiddens=8, embedding_dim=5, n_embed=12)
    rng = np.random.default_rng(4)
    z = rng.normal(size=(2, 3, 3, 8)).astype(np.float32)
    noise = rng.gumbel(size=(2, 3, 3, 12)).astype(np.float32)

    z_q, log = gumbel_vq_apply(params, jnp.asarray(z), temp=0.7, hard=True,
                               noise=jnp.asarray(noise), return_logits=True)

    w = torch.tensor(np.transpose(np.asarray(params["proj"]["w"]), (3, 2, 0, 1)))
    b = torch.tensor(np.asarray(params["proj"]["b"]))
    zt = torch.tensor(np.transpose(z, (0, 3, 1, 2)))
    logits = torch.nn.functional.conv2d(zt, w, b)  # (B, n_embed, H, W)
    g = torch.tensor(np.transpose(noise, (0, 3, 1, 2)))
    y_soft = torch.softmax((logits + g) / 0.7, dim=1)
    idx = y_soft.argmax(dim=1)
    y_hard = torch.nn.functional.one_hot(idx, 12).permute(0, 3, 1, 2).float()
    emb = torch.tensor(np.asarray(params["embedding"]))
    zq_ref = torch.einsum("bnhw,nd->bdhw", y_hard, emb)
    qy = torch.softmax(logits, dim=1)
    diff_ref = 5e-4 * torch.sum(qy * torch.log(qy * 12 + 1e-10), dim=1).mean()

    np.testing.assert_allclose(
        np.asarray(z_q), np.transpose(zq_ref.numpy(), (0, 2, 3, 1)),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_array_equal(np.asarray(log["indices"]), idx.numpy())
    assert np.allclose(float(log["loss/vq"]), diff_ref.item(), rtol=1e-4)

    lookup = gumbel_vq_codebook_entry(params, log["indices"])
    np.testing.assert_allclose(
        np.asarray(lookup), np.transpose(zq_ref.numpy(), (0, 2, 3, 1)),
        rtol=1e-5, atol=1e-6,
    )


def test_ema_vector_quantizer_matches_torch():
    """EMAVectorQuantizer.forward incl. the EMA update
    (quantize.py:337-352,396-443)."""
    state = ema_vq_init(jax.random.PRNGKey(5), n_embed=10, embedding_dim=4)
    rng = np.random.default_rng(6)
    z = rng.normal(size=(2, 3, 3, 4)).astype(np.float32)

    z_q, out, new_state = ema_vq_apply(state, jnp.asarray(z), beta=0.9,
                                       decay=0.99, eps=1e-5, update=True)

    w = torch.tensor(np.asarray(state["weight"]))
    zt = torch.tensor(z).reshape(-1, 4)
    d = zt.pow(2).sum(1, keepdim=True) + w.pow(2).sum(1) - 2 * zt @ w.t()
    idx = torch.argmin(d, dim=1)
    zq_ref = w[idx].reshape(2, 3, 3, 4)
    enc = torch.nn.functional.one_hot(idx, 10).float()
    avg = enc.mean(0)
    perp_ref = torch.exp(-(avg * torch.log(avg + 1e-10)).sum())
    cs = torch.tensor(np.asarray(state["cluster_size"])) * 0.99 + enc.sum(0) * 0.01
    ea = torch.tensor(np.asarray(state["embed_avg"])) * 0.99 + (enc.t() @ zt) * 0.01
    n = cs.sum()
    smoothed = (cs + 1e-5) / (n + 10 * 1e-5) * n
    w_new = ea / smoothed.unsqueeze(1)
    loss_ref = 0.9 * torch.mean((zq_ref - torch.tensor(z)) ** 2)

    np.testing.assert_allclose(np.asarray(z_q), zq_ref.numpy(), rtol=1e-5,
                               atol=1e-6)
    assert np.allclose(float(out["perplexity"]), perp_ref.item(), rtol=1e-5)
    assert np.allclose(float(out["loss/vq"]), loss_ref.item(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["weight"]), w_new.numpy(),
                               rtol=1e-4, atol=1e-6)

    # frozen state at eval
    _, _, same_state = ema_vq_apply(state, jnp.asarray(z), beta=0.9,
                                    update=False)
    assert same_state is state


def test_vq_with_input_projection():
    """VectorQuantizerWithInputProjection (quantize.py:446-487)."""
    params = vq_proj_init(jax.random.PRNGKey(7), input_dim=9, n_codes=8,
                          codebook_dim=4, output_dim=6)
    z = jnp.asarray(np.random.default_rng(8).normal(size=(2, 5, 9)),
                    dtype=jnp.float32)
    z_q, log = vq_proj_apply(params, z)
    assert z_q.shape == (2, 5, 6)
    assert "loss/vq" in log and log["min_encoding_indices"].shape == (10,)


def test_autoencoding_engine_pluggable_regularizer():
    """AutoencodingEngine encode with KL / identity / VQ regularizers
    (sgm/models/autoencoder.py:116-214,324-335)."""
    from custom_diffusion360_tpu.models.vae import (
        VAEConfig,
        autoencoding_engine_encode,
        identity_first_stage_decode,
        identity_first_stage_encode,
        init_vae_params,
        vae_encode,
    )

    cfg = VAEConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1)
    params = init_vae_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (1, 16, 16, 3)), jnp.float32
    )

    z, log = autoencoding_engine_encode(
        params, x, key=jax.random.PRNGKey(1), cfg=cfg, return_reg_log=True
    )
    assert z.shape == (1, 8, 8, 4) and "kl_loss" in log

    z_id, log_id = autoencoding_engine_encode(
        params, x, regularizer=identity_regularizer, cfg=cfg,
        return_reg_log=True,
    )
    np.testing.assert_array_equal(
        np.asarray(z_id), np.asarray(vae_encode(params, x, cfg))
    )
    assert log_id == {}

    vq = vq_init(jax.random.PRNGKey(2), n_e=8, e_dim=8)
    z_q, log_q = autoencoding_engine_encode(
        params, x, regularizer=lambda m: vq_apply(vq, m), cfg=cfg,
        return_reg_log=True,
    )
    assert z_q.shape == (1, 8, 8, 8) and "loss/vq" in log_q

    # identity first stage is a no-op both ways
    np.testing.assert_array_equal(
        np.asarray(identity_first_stage_encode(None, x)), np.asarray(x)
    )
    np.testing.assert_array_equal(
        np.asarray(identity_first_stage_decode(None, x)), np.asarray(x)
    )


def test_measure_perplexity_uniform():
    idx = jnp.arange(16) % 4
    perp, used = measure_perplexity(idx, 4)
    assert np.allclose(float(perp), 4.0, rtol=1e-4)
    assert int(used) == 4
