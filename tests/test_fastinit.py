"""fast_random_params must mirror the real initializer's tree exactly —
bench.py, cli smoke paths and __graft_entry__ all build SDXL-sized params
through it (utils/fastinit.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from custom_diffusion360_tpu.models.unet import init_unet_params
from custom_diffusion360_tpu.utils.fastinit import fast_random_params
from tests.test_io import TINY_UNET


def test_structure_matches_real_init():
    key = jax.random.PRNGKey(0)
    fast = fast_random_params(
        lambda k: init_unet_params(k, TINY_UNET), key, jnp.bfloat16
    )
    shapes = jax.eval_shape(lambda k: init_unet_params(k, TINY_UNET), key)
    assert jax.tree.structure(fast) == jax.tree.structure(shapes)
    for a, b in zip(jax.tree.leaves(fast), jax.tree.leaves(shapes)):
        assert a.shape == b.shape
        assert a.dtype == jnp.bfloat16


def test_values_finite_and_scaled():
    key = jax.random.PRNGKey(1)
    fast = fast_random_params(
        lambda k: init_unet_params(k, TINY_UNET), key, jnp.float32, scale=0.02
    )
    flat = np.concatenate(
        [np.asarray(l).ravel() for l in jax.tree.leaves(fast)]
    )
    assert np.isfinite(flat).all()
    assert abs(float(flat.std()) - 0.02) < 0.005
    # distinct leaves get distinct slices of the bucket draws
    l0, l1 = jax.tree.leaves(fast)[:2]
    assert not np.array_equal(np.asarray(l0).ravel()[:4],
                              np.asarray(l1).ravel()[:4])
