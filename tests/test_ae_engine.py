"""AutoencodingEngine two-optimizer adversarial trainer.

Reference behavior under test: sgm/models/autoencoder.py:182-269 —
training_step sweeps optimizer_idx 0 (AE: recon + KL + adaptive-weight GAN
generator loss with last-layer plumbing) and 1 (discriminator) over the same
batch; configure_optimizers builds two Adam chains with lr_g_factor on the
AE side. The d-loss recipe is vqperceptual.py:5-19.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_diffusion360_tpu.models.vae import VAEConfig
from custom_diffusion360_tpu.train.ae_engine import (
    AEEngine,
    AEEngineConfig,
    _adaptive_weight,
    _rec_nll,
    ae_forward,
    ae_loss,
    disc_loss,
)

TINY = AEEngineConfig(
    vae=VAEConfig(ch=32, ch_mult=(1,), num_res_blocks=1, z_channels=4),
    disc_ndf=8,
    use_lpips=False,
    lr=1e-3,
)


def _batch(key, b=2, hw=32):
    return jax.random.uniform(key, (b, hw, hw, 3), jnp.float32, -1.0, 1.0)


def test_train_step_updates_both_sides():
    eng = AEEngine(TINY)
    state = eng.init_state(jax.random.PRNGKey(0))
    x = _batch(jax.random.PRNGKey(1))
    step = jax.jit(eng.train_step)
    s1, logs = step(state, x, jax.random.PRNGKey(2))
    s2, logs2 = step(s1, x, jax.random.PRNGKey(3))
    assert int(s2.step) == 2
    for k, v in logs2.items():
        assert np.isfinite(float(v)), k
    # both param sides moved
    d_ae = jax.tree_util.tree_reduce(
        lambda a, l: a + float(jnp.abs(l).sum()),
        jax.tree_util.tree_map(
            lambda a, b: a - b, s2.params["ae"], state.params["ae"]
        ),
        0.0,
    )
    d_disc = jax.tree_util.tree_reduce(
        lambda a, l: a + float(jnp.abs(l).sum()),
        jax.tree_util.tree_map(
            lambda a, b: a - b, s2.params["disc"], state.params["disc"]
        ),
        0.0,
    )
    assert d_ae > 0 and d_disc > 0


def test_disc_loss_decreases_on_fixed_batch():
    eng = AEEngine(TINY)
    state = eng.init_state(jax.random.PRNGKey(0))
    x = _batch(jax.random.PRNGKey(1))
    step = jax.jit(eng.train_step)
    losses = []
    for i in range(6):
        state, logs = step(state, x, jax.random.PRNGKey(10 + i))
        losses.append(float(logs["train/disc_loss"]))
    assert losses[-1] < losses[0]


def test_adaptive_weight_matches_explicit_grads():
    """The vjp-through-last-conv shortcut must equal the brute-force
    d||grad||/d||grad|| ratio computed by differentiating the full losses
    w.r.t. the last-layer kernel."""
    from custom_diffusion360_tpu.models.discriminator import (
        discriminator_apply,
    )
    from custom_diffusion360_tpu.models.vae import vae_decode

    cfg = TINY
    eng = AEEngine(cfg)
    state = eng.init_state(jax.random.PRNGKey(0))
    ae, disc = state.params["ae"], state.params["disc"]
    x = _batch(jax.random.PRNGKey(1))
    z, _, _ = ae_forward(ae, x, jax.random.PRNGKey(2), cfg)

    got = _adaptive_weight(ae, None, z, x, None, cfg, disc)

    def sub(w):
        p = dict(ae)
        dec = dict(p["decoder"])
        co = dict(dec["conv_out"])
        co["w"] = w
        dec["conv_out"] = co
        p["decoder"] = dec
        return p

    w0 = ae["decoder"]["conv_out"]["w"]
    g_nll = jax.grad(
        lambda w: _rec_nll(ae, None, x, vae_decode(sub(w), z, cfg.vae), cfg)[0]
    )(w0)
    g_g = jax.grad(
        lambda w: -jnp.mean(
            discriminator_apply(
                disc, vae_decode(sub(w), z, cfg.vae),
                n_layers=cfg.disc_n_layers, use_actnorm=cfg.use_actnorm,
            ).astype(jnp.float32)
        )
    )(w0)
    want = jnp.clip(
        jnp.linalg.norm(g_nll.reshape(-1))
        / (jnp.linalg.norm(g_g.reshape(-1)) + 1e-4),
        0.0,
        1e4,
    ) * cfg.disc_weight
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_disc_start_gates_gan_terms():
    cfg = AEEngineConfig(
        vae=TINY.vae, disc_ndf=8, use_lpips=False, disc_start=100
    )
    eng = AEEngine(cfg)
    state = eng.init_state(jax.random.PRNGKey(0))
    x = _batch(jax.random.PRNGKey(1))
    loss_gated, (_, logs) = ae_loss(
        state.params["ae"], state.params["disc"], None, x,
        jax.random.PRNGKey(2), jnp.zeros((), jnp.int32), cfg,
    )
    # before disc_start the AE loss must equal nll + kl_weight * kl exactly
    want = logs["train/nll_loss"] + cfg.kl_weight * logs["train/kl_loss"]
    np.testing.assert_allclose(
        np.asarray(loss_gated), np.asarray(want), rtol=1e-6
    )
    d, _ = disc_loss(
        state.params["disc"], state.params["ae"], x, x,
        jnp.zeros((), jnp.int32), cfg,
    )
    assert float(d) == 0.0


def test_lpips_term_included():
    cfg = AEEngineConfig(
        vae=TINY.vae, disc_ndf=8, use_lpips=True, perceptual_weight=1.0
    )
    eng = AEEngine(cfg)
    state = eng.init_state(jax.random.PRNGKey(0))
    x = _batch(jax.random.PRNGKey(1), b=1, hw=32)
    nll_with, _ = _rec_nll(
        state.params["ae"], state.params["lpips"], x, -x, cfg
    )
    nll_without, _ = _rec_nll(state.params["ae"], None, x, -x, cfg)
    assert float(nll_with) > float(nll_without)


def test_validation_step_keys():
    eng = AEEngine(TINY)
    state = eng.init_state(jax.random.PRNGKey(0))
    x = _batch(jax.random.PRNGKey(1))
    out = eng.validation_step(state, x, jax.random.PRNGKey(2), postfix="_ema")
    assert "val_ema/rec_loss" in out and "val_ema/disc_loss" in out
    assert all(np.isfinite(float(v)) for v in out.values())


def test_train_step_dp_mesh():
    """One jitted step with the batch sharded over the 8-device mesh —
    the functional step composes with data parallelism unchanged."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.array(devs[:8]), ("data",))
    eng = AEEngine(TINY)
    state = eng.init_state(jax.random.PRNGKey(0))
    x = _batch(jax.random.PRNGKey(1), b=8)
    x = jax.device_put(x, NamedSharding(mesh, P("data")))
    state = jax.device_put(
        state, jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P()), state
        )
    )
    with mesh:
        s1, logs = jax.jit(eng.train_step)(state, x, jax.random.PRNGKey(2))
    assert np.isfinite(float(logs["train/total_loss"]))
    assert int(s1.step) == 1
