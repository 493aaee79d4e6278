"""Fast max-pool backward (ops/maxpool.py): parity with XLA SelectAndScatter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from mds_tpu.ops.maxpool import max_pool_3x3_s2_fast


def _ref_pool(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])


@pytest.mark.parametrize("hw", [(16, 24), (18, 26), (17, 25)])
def test_forward_identical(hw):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, *hw, 8)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(max_pool_3x3_s2_fast(x)), np.asarray(_ref_pool(x))
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_backward_matches_select_and_scatter(dtype):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 24, 8)), dtype)

    def loss_ref(x_):
        return jnp.sum(jnp.sin(_ref_pool(x_).astype(jnp.float32)))

    def loss_fast(x_):
        return jnp.sum(jnp.sin(max_pool_3x3_s2_fast(x_).astype(jnp.float32)))

    g_ref = np.asarray(jax.grad(loss_ref)(x), np.float32)
    g_fast = np.asarray(jax.grad(loss_fast)(x), np.float32)
    np.testing.assert_allclose(g_fast, g_ref, atol=1e-5)


@pytest.mark.parametrize("hw", [(16, 24), (17, 25)])
def test_backward_odd_sizes(hw):
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(0, 1, (1, *hw, 4)), jnp.float32)
    g_ref = jax.grad(lambda x_: jnp.sum(jnp.cos(_ref_pool(x_))))(x)
    g_fast = jax.grad(lambda x_: jnp.sum(jnp.cos(max_pool_3x3_s2_fast(x_))))(x)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref), atol=1e-5)


def test_backward_tie_breaking():
    """Quantized values force within-window ties; the first maximum in
    window order must receive the full gradient (SelectAndScatter parity)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.integers(0, 3, (1, 12, 16, 4)), jnp.float32)

    g_ref = jax.grad(lambda x_: jnp.sum(_ref_pool(x_) * 1.7))(x)
    g_fast = jax.grad(lambda x_: jnp.sum(max_pool_3x3_s2_fast(x_) * 1.7))(x)
    np.testing.assert_array_equal(np.asarray(g_fast), np.asarray(g_ref))


def test_gradient_conservation():
    """Each output window routes exactly its dy to exactly one input."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 2)), jnp.float32)
    g = jax.grad(lambda x_: jnp.sum(max_pool_3x3_s2_fast(x_)))(x)
    assert np.isclose(np.asarray(g).sum(), 4 * 4 * 2)
