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


def _np_dw_wgrad(x, dy, stride):
    """gw[ky,kx,c,j] = sum_{b,h,w} x_tap * dy (fp64 oracle)."""
    B, H, W, C = x.shape
    cm = dy.shape[-1]
    mult = cm // C
    h_out, w_out = dy.shape[1], dy.shape[2]
    xp = np.pad(x.astype(np.float64), ((0, 0), (1, 1), (1, 1), (0, 0)))
    gw = np.zeros((3, 3, C, mult), np.float64)
    dy5 = dy.astype(np.float64).reshape(B, h_out, w_out, C, mult)
    for ky in range(3):
        for kx in range(3):
            tap = xp[:, ky : ky + (h_out - 1) * stride + 1 : stride,
                     kx : kx + (w_out - 1) * stride + 1 : stride, :]
            gw[ky, kx] = np.einsum("bhwc,bhwcj->cj", tap, dy5)
    return gw.reshape(3, 3, 1, C * mult)


@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("mult", [1, 6])
@pytest.mark.parametrize("hw", [(16, 24), (17, 25)])
def test_pallas_wgrad_matches_numpy(stride, mult, hw):
    rng = np.random.default_rng(4)
    H, W = hw
    B, C = 2, 16
    h_out, w_out = -(-H // stride), -(-W // stride)
    x = rng.normal(0, 1, (B, H, W, C)).astype(np.float32)
    dy = rng.normal(0, 1, (B, h_out, w_out, C * mult)).astype(np.float32)
    want = _np_dw_wgrad(x, dy, stride)
    got = np.asarray(
        dwmod.depthwise3x3_wgrad_pallas(jnp.asarray(x), jnp.asarray(dy), stride)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-3)


def test_pallas_wgrad_tiling_path():
    rng = np.random.default_rng(5)
    x = rng.normal(0, 1, (1, 32, 16, 8)).astype(np.float32)
    dy = rng.normal(0, 1, (1, 32, 16, 48)).astype(np.float32)
    orig = dwmod._BLOCK_BYTES
    try:
        dwmod._BLOCK_BYTES = 16 * 18 * 8 * 4 * 6  # force several row tiles
        got = np.asarray(
            dwmod.depthwise3x3_wgrad_pallas(jnp.asarray(x), jnp.asarray(dy), 1)
        )
    finally:
        dwmod._BLOCK_BYTES = orig
    np.testing.assert_allclose(got, _np_dw_wgrad(x, dy, 1), rtol=2e-5, atol=1e-3)


@pytest.mark.parametrize("stride", [1, 2])
def test_hybrid_vjp_pallas_wgrad_backend(stride):
    """set_dw_wgrad_impl('pallas') must give the same gradients as einsum."""
    from mds_tpu.ops import depthwise as dwm

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(0, 1, (2, 12, 16, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.3, (3, 3, 1, 48)), jnp.float32)

    def loss(x_, w_):
        return jnp.sum(jnp.sin(dwm.depthwise_conv3x3_hybrid(x_, w_, stride)))

    want = jax.grad(loss, argnums=(0, 1))(x, w)
    try:
        dwm.set_dw_wgrad_impl("pallas")
        got = jax.grad(loss, argnums=(0, 1))(x, w)
    finally:
        dwm.set_dw_wgrad_impl("einsum")
    for g, wv in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(wv), atol=1e-4)
