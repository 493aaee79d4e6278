"""Fused upsample+argmax Pallas kernel — interpreter-mode correctness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from mds_tpu.ops.pallas import upsample_argmax as mod


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(mod.pl, "pallas_call", patched)


def test_interp_matrix_matches_jax_resize():
    rng = np.random.default_rng(0)
    for h, s in [(8, 8), (16, 4), (5, 8), (12, 2)]:
        x = rng.normal(0, 1, (h,)).astype(np.float32)
        want = np.asarray(
            jax.image.resize(jnp.asarray(x), (h * s,), method="linear")
        )
        got = mod.interp_matrix(h, h * s) @ x
        np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("shape,scale", [
    ((1, 8, 16, 19), 8),
    ((2, 16, 8, 5), 4),
    ((1, 12, 12, 3), 2),
])
def test_fused_matches_xla_chain_f32(shape, scale):
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
    want = np.asarray(mod.upsample_argmax_reference(logits, scale))
    got = np.asarray(mod.upsample_argmax_pallas(logits, scale))
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_fused_bf16_near_exact():
    """bf16 path: the kernel accumulates each pass in f32 (MXU) before the
    bf16 inter-pass rounding, so vs the XLA bf16 chain only bf16-ulp
    near-ties can flip — and vs the FLOAT32 oracle the kernel must be at
    least as accurate as the XLA bf16 chain."""
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.normal(0, 1, (1, 16, 32, 19)), jnp.bfloat16)
    want_bf16 = np.asarray(mod.upsample_argmax_reference(logits, 8))
    got = np.asarray(mod.upsample_argmax_pallas(logits, 8))
    agree = (got == want_bf16).mean()
    assert agree > 0.99, agree  # i.i.d.-noise logits are a worst case
    oracle = np.asarray(
        mod.upsample_argmax_reference(logits.astype(jnp.float32), 8)
    )
    assert (got == oracle).mean() >= (want_bf16 == oracle).mean()


def test_fused_pred_path_matches_model():
    """BiSeNetV2.pred with set_pred_impl('fused') equals the XLA pred."""
    from mds_tpu.models.bisenetv2 import BiSeNetV2
    from mds_tpu.models.layers import set_pred_impl

    model = BiSeNetV2(n_classes=(7,), n_bn=1, aux=False, dtype=jnp.float32)
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = model.init({"params": jax.random.PRNGKey(0)}, [x0], train=False)
    x = jnp.asarray(
        np.random.default_rng(3).normal(0, 1, (1, 64, 64, 3)), jnp.float32
    )
    want = np.asarray(model.apply(v, x, dataset=0, method=model.pred))
    set_pred_impl("fused")
    try:
        got = np.asarray(model.apply(v, x, dataset=0, method=model.pred))
    finally:
        set_pred_impl("xla")
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)
