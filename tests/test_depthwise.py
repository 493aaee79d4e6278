"""Fast depthwise conv: exact parity with XLA's grouped conv lowering."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mds_tpu.ops.depthwise import depthwise_conv3x3, kernel_from_hwio


def xla_grouped(x, hwio, stride, groups):
    # explicit symmetric (1,1) padding = torch padding=1 (what the models use;
    # XLA 'SAME' pads asymmetrically for stride 2)
    return jax.lax.conv_general_dilated(
        x, hwio, (stride, stride), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )


@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("mult", [1, 6])
def test_depthwise_matches_xla(stride, mult):
    rng = np.random.default_rng(0)
    B, H, W, C = 2, 16, 24, 8
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, C)), jnp.float32)
    hwio = jnp.asarray(rng.normal(0, 0.3, (3, 3, 1, C * mult)), jnp.float32)
    want = np.asarray(xla_grouped(x, hwio, stride, C))
    got = np.asarray(depthwise_conv3x3(x, kernel_from_hwio(hwio, C), stride))
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_depthwise_odd_sizes():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (1, 15, 21, 4)), jnp.float32)
    hwio = jnp.asarray(rng.normal(0, 0.3, (3, 3, 1, 4)), jnp.float32)
    for stride in (1, 2):
        want = np.asarray(xla_grouped(x, hwio, stride, 4))
        got = np.asarray(depthwise_conv3x3(x, kernel_from_hwio(hwio, 4), stride))
        np.testing.assert_allclose(got, want, atol=1e-4), stride


def test_convbnrelu_depthwise_path_param_layout():
    """The fast path must keep nn.Conv's param tree (conv/kernel HWIO)."""
    from mds_tpu.models.layers import ConvBNReLU

    m = ConvBNReLU(24, ks=3, groups=4, n_bn=1)
    x = jnp.ones((1, 8, 8, 4))
    v = m.init(jax.random.PRNGKey(0), [x], train=False)
    assert v["params"]["conv"]["kernel"].shape == (3, 3, 1, 24)
    (y,) = m.apply(v, [x], train=False)
    assert y.shape == (1, 8, 8, 24)


def test_depthwise_conv_grad_bf16():
    """Regression: bf16 training through the grouped-conv path must be
    differentiable (preferred_element_type=f32 broke the VJP)."""
    from mds_tpu.models.layers import ConvBNReLU

    m = ConvBNReLU(12, ks=3, groups=4, n_bn=1, dtype=jnp.bfloat16)
    x = jnp.ones((1, 8, 8, 4), jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(0), [x], train=False)

    def loss(params):
        (y,) = m.apply({"params": params, "batch_stats": v["batch_stats"]},
                       [x], train=False)
        return jnp.sum(y.astype(jnp.float32))

    g = jax.grad(loss)(v["params"])
    leaf = jax.tree_util.tree_leaves(g)[0]
    assert np.isfinite(np.asarray(leaf, np.float32)).all()
