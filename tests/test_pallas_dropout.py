"""HW-PRNG dropout kernel (ops/pallas/dropout.py) — plumbing + VJP.

Interpret mode stubs pltpu.prng_random_bits to zeros, so the mask itself
is degenerate on CPU (everything drops); what CPU can still verify is the
shape/padding plumbing, the rate edge cases, and the custom-VJP *property*
grad(sum∘dropout)(x) == dropout(ones) — which holds for any mask stream,
so it validates the regenerate-in-backward contract without depending on
the generator. The statistical checks (keep fraction, determinism, fwd/bwd
mask identity with real bits) are gated on a real TPU backend; they were
run on-chip 2026-08-18 (keep≈0.9005 at rate 0.1, bit-identical repeats).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mds_tpu.models import layers
from mds_tpu.ops.pallas.dropout import dropout_u8_pallas

SEED = jnp.asarray([1234, 5678], jnp.int32)


def _on_tpu():
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


@pytest.mark.parametrize("shape", [(7, 33), (256 * 1024,), (3, 5, 129)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_shape_dtype_padding(shape, dtype):
    x = jnp.ones(shape, dtype)
    y = dropout_u8_pallas(x, SEED, 0.1, interpret=True)
    assert y.shape == x.shape and y.dtype == x.dtype
    # interpret stubs the PRNG to zero bits => top-8 < drop => all dropped
    np.testing.assert_array_equal(np.asarray(y, np.float32), 0.0)


def test_rate_zero_is_identity():
    x = jnp.arange(24.0).reshape(4, 6)
    y = dropout_u8_pallas(x, SEED, 0.0, interpret=True)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_rate_one_drops_all_without_nan():
    x = jnp.ones((130,), jnp.float32)
    y = dropout_u8_pallas(x, SEED, 1.0, interpret=True)
    got = np.asarray(y)
    assert np.all(got == 0.0) and not np.any(np.isnan(got))


@pytest.mark.parametrize("rate", [0.1, 0.5])
def test_vjp_regenerates_forward_mask(rate):
    """d/dx sum(dropout(x)) == dropout(ones): exact for ANY mask stream,
    because the backward re-runs the generator with the same seeds/grid."""
    x = jnp.asarray(np.random.default_rng(0).normal(size=(9, 47)), jnp.float32)
    g = jax.grad(
        lambda v: dropout_u8_pallas(v, SEED, rate, interpret=True).sum()
    )(x)
    want = dropout_u8_pallas(jnp.ones_like(x), SEED, rate, interpret=True)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(want))


def test_seed_grad_is_none():
    x = jnp.ones((4, 4), jnp.float32)
    s = SEED
    _, vjp = jax.vjp(
        lambda v: dropout_u8_pallas(v, s, 0.1, interpret=True), x
    )
    (gx,) = vjp(jnp.ones_like(x))
    assert gx.shape == x.shape  # seed stays out of the diff path entirely


def test_fastdropout_impl_switch(monkeypatch):
    """set_dropout_impl routes FastDropout through the kernel; auto picks
    threefry off-TPU so the default CPU suite never touches Mosaic."""
    assert layers.auto_dropout_impl() == (
        "pallas" if _on_tpu() else "threefry"
    )
    seen = {}

    def fake(x, seed, rate, interpret=False):
        seen["args"] = (x.shape, tuple(np.asarray(seed)), rate)
        return x

    import mds_tpu.ops.pallas.dropout as mod

    monkeypatch.setattr(mod, "dropout_u8_pallas", fake)
    layers.set_dropout_impl("pallas")
    try:
        m = layers.FastDropout(rate=0.25)
        x = jnp.ones((2, 8, 8, 4), jnp.float32)
        y = m.apply({}, x, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(3)})
        assert seen["args"][0] == x.shape and seen["args"][2] == 0.25
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    finally:
        layers.set_dropout_impl("threefry")


@pytest.mark.skipif(not _on_tpu(), reason="needs the hardware PRNG")
def test_statistics_on_chip():
    rate = 0.1
    x = jnp.ones((512, 2048), jnp.bfloat16)
    y = dropout_u8_pallas(x, SEED, rate)
    kept = np.asarray(jnp.count_nonzero(y)) / x.size
    assert abs(kept - (1 - rate)) < 0.01
    # unbiased in expectation: kept values carry the 256/(256-drop) scale
    mean = float(jnp.mean(y.astype(jnp.float32)))
    assert abs(mean - 1.0) < 0.02
    # deterministic for a fixed seed, decorrelated across seeds
    y2 = dropout_u8_pallas(x, SEED, rate)
    np.testing.assert_array_equal(np.asarray(y, np.float32),
                                  np.asarray(y2, np.float32))
    y3 = dropout_u8_pallas(x, jnp.asarray([99, 7], jnp.int32), rate)
    assert np.any(np.asarray(y, np.float32) != np.asarray(y3, np.float32))
    # backward regenerates the identical mask
    g = jax.grad(lambda v: dropout_u8_pallas(v, SEED, rate).sum())(x)
    np.testing.assert_array_equal(
        np.asarray(g, np.float32) != 0, np.asarray(y, np.float32) != 0
    )
