"""Fused Pallas conv3x3+BN+ReLU — interpreter-mode correctness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from mds_tpu.ops.pallas import conv3x3 as mod


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(mod.pl, "pallas_call", patched)


@pytest.mark.parametrize("shape", [(1, 16, 24, 64, 64), (2, 10, 16, 128, 32)])
@pytest.mark.parametrize("relu", [True, False])
def test_conv3x3_fused_matches_xla(shape, relu):
    B, H, W, Cin, Cout = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, Cin)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, Cin, Cout)), jnp.float32)
    s = jnp.asarray(rng.normal(1, 0.1, (Cout,)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.1, (Cout,)), jnp.float32)
    want = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) * s + b
    if relu:
        want = jnp.maximum(want, 0)
    got = mod.conv3x3_bn_relu_pallas(x, w, s, b, relu=relu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_conv3x3_multi_tile(monkeypatch):
    monkeypatch.setattr(mod, "_BLOCK_BYTES", 24 * 66 * 8 * 4 * 4)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (1, 32, 24, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, 8, 8)), jnp.float32)
    want = jnp.maximum(
        jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ), 0,
    )
    got = mod.conv3x3_bn_relu_pallas(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)
