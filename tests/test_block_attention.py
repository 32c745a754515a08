"""Block-attention kernel correctness (pallas interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import custom_diffusion360_tpu.ops.block_attention as ba


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(ba, "_INTERPRET", True)


def _ref(q, k, v, scale, kv_len=None):
    return ba._xla_f32(q, k, v, scale, kv_len)


class TestKernel:
    def test_matches_reference(self):
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (2, 3, 256, 64))
        k = jax.random.normal(jax.random.fold_in(key, 1), (2, 3, 256, 64))
        v = jax.random.normal(jax.random.fold_in(key, 2), (2, 3, 256, 64))
        got = ba.block_attention(q, k, v, 0.125, None, 128)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(_ref(q, k, v, 0.125)), atol=2e-5
        )

    def test_kv_padding_and_mask(self):
        """m=77 pads to 128; padded keys must not contribute."""
        key = jax.random.PRNGKey(3)
        q = jax.random.normal(key, (1, 2, 128, 64))
        k = jax.random.normal(jax.random.fold_in(key, 1), (1, 2, 77, 64))
        v = jax.random.normal(jax.random.fold_in(key, 2), (1, 2, 77, 64))
        got = ba.block_attention(q, k, v, 0.125, 77, 128)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(_ref(q, k, v, 0.125)), atol=2e-5
        )

    def test_q_padding(self):
        """n not a multiple of block_q."""
        key = jax.random.PRNGKey(4)
        q = jax.random.normal(key, (1, 1, 200, 64))
        k = jax.random.normal(jax.random.fold_in(key, 1), (1, 1, 128, 64))
        got = ba.block_attention(q, k, k, 0.125, None, 128)
        assert got.shape == (1, 1, 200, 64)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(_ref(q, k, k, 0.125)), atol=2e-5
        )

    def test_gradient_matches(self):
        key = jax.random.PRNGKey(5)
        q = jax.random.normal(key, (1, 2, 128, 64))

        g1 = jax.grad(lambda q: (ba.block_attention(q, q, q, 0.125, None, 128) ** 2).sum())(q)
        g2 = jax.grad(lambda q: (_ref(q, q, q, 0.125) ** 2).sum())(q)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


class TestQkvFusedKernel:
    """Fused-QKV self-attention: one (b, 3, h, n, d) operand, three
    BlockSpecs reading the same buffer (ops/block_attention.py:234)."""

    def _pack(self, q, k, v):
        # (b,h,n,d) each -> (b,3,h,n,d)
        return jnp.stack([q, k, v], axis=1)

    def test_matches_reference(self):
        key = jax.random.PRNGKey(11)
        q = jax.random.normal(key, (2, 3, 256, 64))
        k = jax.random.normal(jax.random.fold_in(key, 1), (2, 3, 256, 64))
        v = jax.random.normal(jax.random.fold_in(key, 2), (2, 3, 256, 64))
        got = ba.block_attention_qkv_fused(self._pack(q, k, v), 0.125, 128)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(_ref(q, k, v, 0.125)), atol=2e-5
        )

    def test_gradient_matches(self):
        """Custom VJP on the packed operand vs autodiff through the XLA
        reference, with a non-trivial cotangent."""
        key = jax.random.PRNGKey(12)
        qkv = jax.random.normal(key, (1, 3, 2, 128, 64))
        w = jax.random.normal(jax.random.fold_in(key, 3), (1, 2, 128, 64))

        def loss_kernel(qkv):
            return (ba.block_attention_qkv_fused(qkv, 0.125, 128) * w).sum()

        def loss_ref(qkv):
            return (_ref(qkv[:, 0], qkv[:, 1], qkv[:, 2], 0.125) * w).sum()

        g1 = jax.grad(loss_kernel)(qkv)
        g2 = jax.grad(loss_ref)(qkv)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)

    def test_wrapper_matches_split_path(self):
        """ops/attention.dot_product_attention_qkv == the split+reshape
        route, from the fused (b, n, 3*h*d) projection layout."""
        from custom_diffusion360_tpu.ops import attention as at

        key = jax.random.PRNGKey(13)
        b, h, n, d = 2, 4, 192, 64
        qkv = jax.random.normal(key, (b, n, 3 * h * d))
        q, k, v = jnp.split(qkv, 3, axis=-1)
        want = at.dot_product_attention(
            q.reshape(b, n, h, d), k.reshape(b, n, h, d),
            v.reshape(b, n, h, d), d**-0.5,
        ).reshape(b, n, h * d)
        got = at.dot_product_attention_qkv(qkv, h)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)


class TestBnhdKernel:
    """Transpose-free (b, n, h, d) variant vs the transposed reference."""

    def test_matches_reference(self):
        key = jax.random.PRNGKey(7)
        q = jax.random.normal(key, (2, 256, 3, 64))
        k = jax.random.normal(jax.random.fold_in(key, 1), (2, 256, 3, 64))
        v = jax.random.normal(jax.random.fold_in(key, 2), (2, 256, 3, 64))
        got = ba.block_attention_bnhd(q, k, v, 0.125, None, 128)
        ref = jnp.swapaxes(
            _ref(jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
                 jnp.swapaxes(v, 1, 2), 0.125),
            1, 2,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)

    def test_padding_and_mask(self):
        key = jax.random.PRNGKey(8)
        q = jax.random.normal(key, (1, 200, 2, 64))  # n pads to block_q
        k = jax.random.normal(jax.random.fold_in(key, 1), (1, 77, 2, 64))
        v = jax.random.normal(jax.random.fold_in(key, 2), (1, 77, 2, 64))
        got = ba.block_attention_bnhd(q, k, v, 0.125, 77, 256)
        ref = jnp.swapaxes(
            _ref(jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
                 jnp.swapaxes(v, 1, 2), 0.125, 77),
            1, 2,
        )
        assert got.shape == (1, 200, 2, 64)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)

    def test_gradient_matches(self):
        """Custom VJP (bnhd layout) vs autodiff through the XLA reference,
        with distinct q/k/v cotangents and a KV mask in play."""
        key = jax.random.PRNGKey(9)
        q = jax.random.normal(key, (1, 128, 2, 64))
        k = jax.random.normal(jax.random.fold_in(key, 1), (1, 77, 2, 64))
        v = jax.random.normal(jax.random.fold_in(key, 2), (1, 77, 2, 64))
        w = jax.random.normal(jax.random.fold_in(key, 3), (1, 128, 2, 64))

        def loss_kernel(q, k, v):
            return (ba.block_attention_bnhd(q, k, v, 0.125, 77, 128) * w).sum()

        def loss_ref(q, k, v):
            o = _ref(jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
                     jnp.swapaxes(v, 1, 2), 0.125, 77)
            return (jnp.swapaxes(o, 1, 2) * w).sum()

        g1 = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4)
