"""Pallas depthwise kernel — interpreter-mode correctness on CPU.

On TPU this kernel is bit-accurate to an fp64 reference while XLA's grouped
conv drifts ~2e-2 (bf16 accumulation); see mds_tpu/ops/pallas/depthwise.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from mds_tpu.ops.pallas import depthwise as dwmod


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(dwmod.pl, "pallas_call", patched)


def _np_dw_interleaved(x, w, stride):
    B, H, W, C = x.shape
    mult = w.shape[3]
    h_out, w_out = -(-H // stride), -(-W // stride)
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = np.zeros((B, h_out, w_out, C * mult), np.float64)
    for dy in range(3):
        for dx in range(3):
            tap = xp[:, dy : dy + (h_out - 1) * stride + 1 : stride,
                     dx : dx + (w_out - 1) * stride + 1 : stride, :]
            for c in range(C):
                for j in range(mult):
                    out[..., c * mult + j] += tap[..., c] * w[dy, dx, c, j]
    return out


@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("mult", [1, 6])
@pytest.mark.parametrize("hw", [(16, 24), (17, 25)])
def test_pallas_depthwise_matches_numpy(stride, mult, hw):
    rng = np.random.default_rng(0)
    H, W = hw
    B, C = 2, 16
    x = rng.normal(0, 1, (B, H, W, C)).astype(np.float32)
    w = rng.normal(0, 0.3, (3, 3, C, mult)).astype(np.float32)
    want = _np_dw_interleaved(x, w, stride)
    got = np.asarray(
        dwmod.depthwise3x3_pallas(jnp.asarray(x), jnp.asarray(w), stride)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_tiling_path():
    """Force multi-tile by shrinking the block budget."""
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (1, 32, 16, 8)).astype(np.float32)
    w = rng.normal(0, 0.3, (3, 3, 8, 1)).astype(np.float32)
    orig = dwmod._BLOCK_BYTES
    try:
        dwmod._BLOCK_BYTES = 16 * 18 * 8 * 4 * 6  # ≈6 rows per tile
        got = np.asarray(dwmod.depthwise3x3_pallas(jnp.asarray(x), jnp.asarray(w), 1))
    finally:
        dwmod._BLOCK_BYTES = orig
    want = _np_dw_interleaved(x, w, 1)
    np.testing.assert_allclose(got, want, atol=1e-4)
