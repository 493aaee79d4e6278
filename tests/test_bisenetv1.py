import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mds_tpu.models.bisenetv1 import BiSeNetV1
from mds_tpu.models.resnet import Resnet18

HW = 64


def test_resnet18_feature_strides():
    model = Resnet18()
    x = jnp.zeros((1, HW, HW, 3))
    v = jax.eval_shape(lambda k: model.init(k, x, train=False), jax.random.PRNGKey(0))
    f8, f16, f32 = jax.eval_shape(
        lambda v, x: model.apply(v, x, train=False), v, x
    )
    assert f8.shape == (1, HW // 8, HW // 8, 128)
    assert f16.shape == (1, HW // 16, HW // 16, 256)
    assert f32.shape == (1, HW // 32, HW // 32, 512)


def test_resnet18_param_count():
    model = Resnet18()
    v = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, HW, HW, 3)), train=False),
        jax.random.PRNGKey(0),
    )
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(v["params"]))
    # torchvision resnet18 trunk minus fc ≈ 11.18M
    assert 10_500_000 < n < 11_800_000, n


def test_bisenetv1_shapes():
    model = BiSeNetV1(n_classes=(5,))
    x = jnp.zeros((2, HW, HW, 3))
    v = jax.eval_shape(
        lambda k: model.init(k, [x], train=True), jax.random.PRNGKey(0)
    )
    out = jax.eval_shape(
        lambda v, x: model.apply(v, [x], train=True, mutable=["batch_stats"])[0],
        v, x,
    )
    assert out["logits"][0].shape == (2, HW, HW, 5)
    assert out["aux"][0][0].shape == (2, HW, HW, 5)
    assert out["aux"][1][0].shape == (2, HW, HW, 5)
    pred = jax.eval_shape(
        lambda v, x: model.apply(v, x, method=model.pred), v, x
    )
    assert pred.shape == (2, HW, HW)


def test_bisenetv1_forward_finite():
    model = BiSeNetV1(n_classes=(5,), aux=False)
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (1, HW, HW, 3)), jnp.float32)
    v = jax.jit(lambda k: model.init(k, [x], train=False))(jax.random.PRNGKey(0))
    logits = jax.jit(lambda v, x: model.apply(v, x, method=model.eval_logits))(v, x)
    assert np.isfinite(np.asarray(logits)).all()
