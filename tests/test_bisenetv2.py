import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mds_tpu.models.bisenetv2 import BiSeNetV2


HW = 32


@pytest.fixture(scope="module")
def model_and_vars():
    model = BiSeNetV2(n_classes=(5, 7), n_bn=2)
    x = jnp.zeros((2, HW, HW, 3))
    init = jax.jit(
        lambda k: model.init(
            {"params": k, "dropout": jax.random.PRNGKey(1)},
            x,
            train=True,
            splits=(1, 1),
        )
    )
    return model, init(jax.random.PRNGKey(0))


def test_train_forward_shapes(model_and_vars):
    model, variables = model_and_vars
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (3, HW, HW, 3)), jnp.float32)

    @jax.jit
    def fwd(v, x):
        return model.apply(
            v, x, train=True, splits=(2, 1), mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)},
        )

    out, mut = fwd(variables, x)
    assert out["logits"][0].shape == (2, HW, HW, 5)
    assert out["logits"][1].shape == (1, HW, HW, 7)
    assert len(out["aux"]) == 4
    for aux_set in out["aux"]:
        assert aux_set[0].shape == (2, HW, HW, 5)
        assert aux_set[1].shape == (1, HW, HW, 7)
    assert np.isfinite(np.asarray(out["logits"][0])).all()
    # batch stats were updated away from init
    assert np.abs(np.asarray(mut["batch_stats"]["detail"]["S1_1"]["bn"]["mean"])).sum() > 0


def test_eval_and_pred_shapes(model_and_vars):
    model, variables = model_and_vars
    x = jnp.zeros((1, HW, HW, 3))
    logits = jax.eval_shape(
        lambda v, x: model.apply(v, x, dataset=1, method=model.eval_logits),
        variables, x,
    )
    assert logits.shape == (1, HW, HW, 7)
    pred = jax.eval_shape(
        lambda v, x: model.apply(v, x, dataset=0, method=model.pred), variables, x
    )
    assert pred.shape == (1, HW, HW)


def test_absent_dataset_split(model_and_vars):
    model, variables = model_and_vars
    x = jnp.zeros((2, HW, HW, 3))
    out = jax.eval_shape(
        lambda v, x: model.apply(
            v, x, train=True, splits=(2, 0), mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )[0],
        variables, x,
    )
    assert out["logits"][0].shape == (2, HW, HW, 5)
    assert out["logits"][1] is None


def test_param_count_plausible():
    # single-dataset BiSeNetV2 ≈ 5.2M backbone+head params (paper scale)
    model = BiSeNetV2(n_classes=(19,), n_bn=1)
    shapes = jax.eval_shape(
        lambda k: model.init(
            {"params": k, "dropout": jax.random.PRNGKey(1)},
            jnp.zeros((1, HW, HW, 3)),
            train=True,
        ),
        jax.random.PRNGKey(0),
    )
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(shapes["params"]))
    assert 2_000_000 < n < 20_000_000, n


def test_bf16_compute_dtype():
    model = BiSeNetV2(n_classes=(5,), n_bn=1, dtype=jnp.bfloat16)
    x = jnp.zeros((1, HW, HW, 3))
    v_shapes = jax.eval_shape(
        lambda k: model.init({"params": k}, x, train=False), jax.random.PRNGKey(0)
    )
    logits = jax.eval_shape(
        lambda v, x: model.apply(v, x, dataset=0, method=model.eval_logits),
        v_shapes, x,
    )
    # head returns float32 logits regardless of compute dtype; params stay f32
    assert logits.dtype == jnp.float32
    assert jax.tree_util.tree_leaves(v_shapes["params"])[0].dtype == jnp.float32
