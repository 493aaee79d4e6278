"""Export / deploy round-trip tests (small shapes, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mds_tpu.deploy.export import (
    export_model,
    load_exported,
    make_e2e_fn,
    save_exported,
    stablehlo_text,
)
from mds_tpu.models.bisenetv2 import BiSeNetV2

HW = 64


@pytest.fixture(scope="module")
def model_vars():
    model = BiSeNetV2(n_classes=(5,), n_bn=1, aux=False)
    x = jnp.zeros((1, HW, HW, 3))
    v = jax.jit(lambda k: model.init({"params": k}, [x], train=False))(
        jax.random.PRNGKey(0)
    )
    return model, v


def test_e2e_fn_outputs_labels(model_vars):
    model, v = model_vars
    fn = jax.jit(make_e2e_fn(model, v, np.zeros(3), np.ones(3)))
    im = np.random.default_rng(0).integers(0, 256, (1, HW, HW, 3)).astype(np.uint8)
    out = np.asarray(fn(jnp.asarray(im)))
    assert out.shape == (1, HW, HW) and out.dtype == np.int32
    assert out.min() >= 0 and out.max() < 5


def test_export_roundtrip(model_vars, tmp_path):
    model, v = model_vars
    blob = export_model(model, v, (HW, HW))
    path = str(tmp_path / "model.shlo")
    save_exported(blob, path)
    call = load_exported(path)
    im = jnp.asarray(
        np.random.default_rng(1).integers(0, 256, (1, HW, HW, 3)), jnp.uint8
    )
    out = np.asarray(call(im))
    # parity with the in-process graph
    want = np.asarray(
        jax.jit(make_e2e_fn(model, v, np.zeros(3), np.ones(3)))(im)
    )
    np.testing.assert_array_equal(out, want)


def test_stablehlo_text_contains_module(model_vars):
    model, v = model_vars
    txt = stablehlo_text(model, v, (HW, HW))
    assert "module" in txt and "func" in txt


def test_demo_size_rounding_for_bga():
    """Non-/32 inputs shape-mismatch BiSeNetV2's BGA merge (found driving
    tools/demo.py on the reference's 720x960 CamVid frame); the demo rounds
    down to /32 and nearest-resizes the label map back."""
    import numpy as np

    from mds_tpu.models.bisenetv2 import BiSeNetV2

    model = BiSeNetV2(n_classes=(5,), n_bn=1, aux=False)
    # the rounding the demo applies
    h, w = 70, 100
    rh, rw = (max(32, (d // 32) * 32) for d in (h, w))
    assert (rh, rw) == (64, 96)
    x = jnp.zeros((1, rh, rw, 3), jnp.float32)
    v = model.init({"params": jax.random.PRNGKey(0)}, [x], train=False)
    pred = model.apply(v, x, dataset=0, method=model.pred)
    assert pred.shape == (1, rh, rw)
    # unrounded sizes must be the thing that fails (guards the invariant)
    import pytest as _pytest

    bad = jnp.zeros((1, 72, 96, 3), jnp.float32)  # 72 = not /32
    with _pytest.raises(Exception):
        model.apply(v, bad, dataset=0, method=model.pred)
