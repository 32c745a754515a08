"""Fused LayerNorm kernel: interpret-mode parity with the XLA reference and
gradient correctness (ops/norms.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from custom_diffusion360_tpu.ops import norms


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(norms, "_INTERPRET", True)


@pytest.mark.parametrize("shape", [(4, 640), (2, 37, 1280), (3, 5, 256)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_layer_norm_fused_matches_xla(shape, dtype):
    k = jax.random.PRNGKey(0)
    x = (jax.random.normal(k, shape) * 2.0 + 0.5).astype(dtype)
    c = shape[-1]
    scale = jax.random.normal(jax.random.fold_in(k, 1), (c,)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.fold_in(k, 2), (c,)) * 0.1
    got = norms.layer_norm_fused(x, scale, bias)
    want = norms._ln_xla(x, scale, bias, 1e-5)
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=tol
    )


def test_layer_norm_fused_odd_channels_falls_back():
    x = jnp.ones((4, 100))
    scale, bias = jnp.ones((100,)), jnp.zeros((100,))
    out = norms.layer_norm_fused(x, scale, bias)
    assert out.shape == x.shape


def test_layer_norm_fused_grad_matches_xla():
    k = jax.random.PRNGKey(3)
    x = jax.random.normal(k, (6, 256))
    scale = jax.random.normal(jax.random.fold_in(k, 1), (256,)) * 0.1 + 1.0
    bias = jnp.zeros((256,))

    def f_fused(x, s, b):
        return jnp.sum(jnp.sin(norms.layer_norm_fused(x, s, b)))

    def f_xla(x, s, b):
        return jnp.sum(jnp.sin(norms._ln_xla(x, s, b, 1e-5)))

    g1 = jax.grad(f_fused, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(f_xla, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


@pytest.mark.parametrize("shape,groups", [((2, 8, 8, 640), 32), ((1, 16, 256), 32),
                                          ((2, 8, 8, 128), 32)])
@pytest.mark.parametrize("act", [None, "silu"])
def test_group_norm_fused_matches_xla(shape, groups, act):
    k = jax.random.PRNGKey(1)
    x = (jax.random.normal(k, shape) * 1.5 - 0.2).astype(jnp.bfloat16)
    c = shape[-1]
    scale = jax.random.normal(jax.random.fold_in(k, 1), (c,)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.fold_in(k, 2), (c,)) * 0.1
    got = norms.group_norm_fused(x, scale, bias, groups, 1e-5, act)
    n = shape[0]
    want = norms._gn_xla(
        x.reshape(n, -1, c), scale, bias, groups, 1e-5, act
    ).reshape(shape)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=2e-2
    )


def test_group_norm_fused_grad_matches_xla():
    k = jax.random.PRNGKey(5)
    x = jax.random.normal(k, (2, 8, 256))
    scale = jax.random.normal(jax.random.fold_in(k, 1), (256,)) * 0.1 + 1.0
    bias = jnp.zeros((256,))

    def f_fused(x, s, b):
        return jnp.sum(jnp.sin(norms.group_norm_fused(x, s, b, 32, 1e-5, "silu")))

    def f_xla(x, s, b):
        return jnp.sum(jnp.sin(norms._gn_xla(x, s, b, 32, 1e-5, "silu")))

    g1 = jax.grad(f_fused, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(f_xla, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)
