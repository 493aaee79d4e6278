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


# ---------------------------------------------------------------------------
# Hybrid-VJP grouped conv (ops/depthwise.py depthwise_conv3x3_hybrid):
# forward is the same XLA lowering; gradients must match pure autodiff.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("mult", [1, 6])
def test_hybrid_vjp_matches_autodiff(stride, mult):
    from mds_tpu.ops.depthwise import depthwise_conv3x3_hybrid

    rng = np.random.default_rng(2)
    B, H, W, C = 2, 13, 17, 8
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, C)), jnp.float32)
    hwio = jnp.asarray(rng.normal(0, 0.3, (3, 3, 1, C * mult)), jnp.float32)

    def ad_loss(x_, w_):
        return jnp.sum(jnp.sin(xla_grouped(x_, w_, stride, C)))

    def hy_loss(x_, w_):
        return jnp.sum(jnp.sin(depthwise_conv3x3_hybrid(x_, w_, stride)))

    fwd_want = np.asarray(xla_grouped(x, hwio, stride, C))
    fwd_got = np.asarray(depthwise_conv3x3_hybrid(x, hwio, stride))
    np.testing.assert_allclose(fwd_got, fwd_want, atol=1e-4)

    gx_ad, gw_ad = jax.grad(ad_loss, argnums=(0, 1))(x, hwio)
    gx_hy, gw_hy = jax.grad(hy_loss, argnums=(0, 1))(x, hwio)
    np.testing.assert_allclose(np.asarray(gx_hy), np.asarray(gx_ad), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_hy), np.asarray(gw_ad), atol=1e-4)


def test_hybrid_vjp_bf16_finite():
    from mds_tpu.ops.depthwise import depthwise_conv3x3_hybrid

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (1, 10, 12, 4)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.3, (3, 3, 1, 24)), jnp.bfloat16)
    gx, gw = jax.grad(
        lambda a, b: jnp.sum(
            depthwise_conv3x3_hybrid(a, b, 2).astype(jnp.float32)
        ),
        argnums=(0, 1),
    )(x, w)
    assert gx.dtype == jnp.bfloat16 and gw.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(gx, np.float32)).all()
    assert np.isfinite(np.asarray(gw, np.float32)).all()


def test_fast_dropout():
    from mds_tpu.models.layers import FastDropout

    m = FastDropout(0.25)
    x = jnp.ones((64, 64, 16), jnp.float32)
    # deterministic: identity, no rng needed
    y = m.apply({}, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    # training: zeros at ~rate, survivors scaled by 1/keep (quantized /256)
    y = m.apply({}, x, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(0)})
    y = np.asarray(y)
    drop_frac = (y == 0).mean()
    assert abs(drop_frac - 0.25) < 0.01, drop_frac
    kept = y[y != 0]
    np.testing.assert_allclose(kept, 256.0 / 192.0, rtol=1e-6)
    # E[y] preserved
    assert abs(y.mean() - 1.0) < 0.02
    # rate 0: passthrough even in train mode
    z = FastDropout(0.0).apply({}, x, deterministic=False,
                               rngs={"dropout": jax.random.PRNGKey(1)})
    np.testing.assert_array_equal(np.asarray(z), np.asarray(x))
