import jax
import jax.numpy as jnp
import numpy as np

from mds_tpu.losses.ohem_ce import MdsOhemNLLPlusLoss
from mds_tpu.models.bisenetv2_contrast import BiSeNetV2Contrast, WNClassifier
from mds_tpu.evaluation.evaluator import MscEvalV0Contrast

HW = 32


def test_contrast_model_outputs():
    model = BiSeNetV2Contrast(
        num_unify_classes=10, datasets_cats=(3, 4), n_bn=2, proj_dim=16,
        with_dataset_aux_heads=True,
    )
    xs = [jnp.zeros((1, HW, HW, 3)), jnp.zeros((1, HW, HW, 3))]
    v = jax.eval_shape(
        lambda k: model.init({"params": k, "dropout": jax.random.PRNGKey(1)},
                             xs, train=True),
        jax.random.PRNGKey(0),
    )
    out = jax.eval_shape(
        lambda v, a, b: model.apply(
            v, [a, b], train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)},
        )[0],
        v, xs[0], xs[1],
    )
    assert out["seg"][0].shape == (1, HW, HW, 10)
    assert out["embed"][0].shape == (1, HW // 8, HW // 8, 16)
    assert len(out["aux"]) == 4
    assert out["dataset_aux"][0].shape == (1, HW, HW, 3)
    assert out["dataset_aux"][1].shape == (1, HW, HW, 4)


def test_wn_classifier_cosine():
    m = WNClassifier(5)
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (1, 4, 4, 8)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 4, 4, 5)
    # scaling the kernel must not change outputs (weight-normalized)
    v2 = {"params": {"kernel": v["params"]["kernel"] * 7.3}}
    np.testing.assert_allclose(np.asarray(m.apply(v2, x)), np.asarray(y), atol=1e-5)


def test_mds_ohem_nllplus():
    rng = np.random.default_rng(0)
    lg = [jnp.asarray(rng.normal(0, 1, (1, 8, 8, 6)), jnp.float32)]
    adj = [jnp.asarray(np.eye(4, 6), jnp.float32)]
    lb = [jnp.asarray(rng.integers(0, 4, (1, 32, 32)), jnp.int32)]
    loss = MdsOhemNLLPlusLoss(0.4, exact=True)(lg, adj, lb)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_contrast_eval_label_downsample():
    # oracle at 1/4 resolution: logits_fn returns one-hot of label blocks
    n = 4
    rng = np.random.default_rng(0)
    lb8 = rng.integers(0, n, (1, 16, 24))
    lb = np.repeat(np.repeat(lb8, 4, 1), 4, 2).astype(np.uint8)
    im = (lb * 20).astype(np.uint8)[..., None].repeat(3, -1)

    def logits_fn(x, ds):
        # downsample by 4 and decode class from pixel value
        small = x[:, ::4, ::4, 0]
        cls = jnp.clip(jnp.round(small / 20.0), 0, n - 1).astype(jnp.int32)
        return jax.nn.one_hot(cls, n) * 10.0

    ev = MscEvalV0Contrast(scales=(1.0,), flip=False, ori_scales=False)
    miou = ev(logits_fn, [{"im": im, "lb": lb}], n, 0)
    assert miou == 1.0
