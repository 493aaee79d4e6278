import jax
import jax.numpy as jnp
import numpy as np

from mds_tpu.models.swin import BiSeNetV1Swin, SwinTransformer, shift_attn_mask, window_partition, window_reverse

HW = 224  # 224/8=28 divisible by window 7


def test_window_partition_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (2, 14, 14, 8)), jnp.float32)
    w = window_partition(x, 7)
    assert w.shape == (2 * 4, 7, 7, 8)
    back = window_reverse(w, 7, 14, 14)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_shift_mask_shape():
    m = shift_attn_mask(14, 14, 7, 3)
    assert m.shape == (4, 49, 49)
    assert set(np.unique(m)) <= {0.0, -100.0}


def test_swin_feature_shapes():
    model = SwinTransformer()
    x = jnp.zeros((1, HW, HW, 3))
    v = jax.eval_shape(lambda k: model.init(k, x), jax.random.PRNGKey(0))
    f8, f16, f32 = jax.eval_shape(lambda v, x: model.apply(v, x), v, x)
    assert f8.shape == (1, HW // 8, HW // 8, 192)
    assert f16.shape == (1, HW // 16, HW // 16, 384)
    assert f32.shape == (1, HW // 32, HW // 32, 768)


def test_bisenetv1_swin_shapes():
    model = BiSeNetV1Swin(n_classes=(5,))
    x = jnp.zeros((1, HW, HW, 3))
    v = jax.eval_shape(
        lambda k: model.init(k, [x], train=True), jax.random.PRNGKey(0)
    )
    out = jax.eval_shape(
        lambda v, x: model.apply(v, [x], train=True, mutable=["batch_stats"])[0],
        v, x,
    )
    assert out["logits"][0].shape == (1, HW, HW, 5)
    assert out["aux"][0][0].shape == (1, HW, HW, 5)
