import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mds_tpu.models.bisenetv2 import BiSeNetV2


HW = 32


@pytest.fixture(scope="module")
def model_and_vars():
    model = BiSeNetV2(n_classes=(5, 7), n_bn=2)
    xs = [jnp.zeros((1, HW, HW, 3)), jnp.zeros((1, HW, HW, 3))]
    init = jax.jit(
        lambda k: model.init(
            {"params": k, "dropout": jax.random.PRNGKey(1)}, xs, train=True
        )
    )
    return model, init(jax.random.PRNGKey(0))


def test_train_forward_shapes(model_and_vars):
    model, variables = model_and_vars
    g = np.random.default_rng(0)
    xs = [
        jnp.asarray(g.normal(0, 1, (2, HW, HW, 3)), jnp.float32),
        jnp.asarray(g.normal(0, 1, (1, HW, HW, 3)), jnp.float32),
    ]

    @jax.jit
    def fwd(v, xs):
        return model.apply(
            v, xs, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)},
        )

    out, mut = fwd(variables, xs)
    assert out["logits"][0].shape == (2, HW, HW, 5)
    assert out["logits"][1].shape == (1, HW, HW, 7)
    assert len(out["aux"]) == 4
    for aux_set in out["aux"]:
        assert aux_set[0].shape == (2, HW, HW, 5)
        assert aux_set[1].shape == (1, HW, HW, 7)
    assert np.isfinite(np.asarray(out["logits"][0])).all()
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


def test_absent_dataset(model_and_vars):
    model, variables = model_and_vars
    xs = [jnp.zeros((2, HW, HW, 3)), None]
    out = jax.eval_shape(
        lambda v, x0: model.apply(
            v, [x0, None], train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )[0],
        variables, xs[0],
    )
    assert out["logits"][0].shape == (2, HW, HW, 5)
    assert out["logits"][1] is None


def test_param_count_plausible():
    model = BiSeNetV2(n_classes=(19,), n_bn=1)
    shapes = jax.eval_shape(
        lambda k: model.init(
            {"params": k, "dropout": jax.random.PRNGKey(1)},
            [jnp.zeros((1, HW, HW, 3))],
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
        lambda k: model.init({"params": k}, [x], train=False), jax.random.PRNGKey(0)
    )
    logits = jax.eval_shape(
        lambda v, x: model.apply(v, x, dataset=0, method=model.eval_logits),
        v_shapes, x,
    )
    # logits stay in the compute dtype (the full-res class volume dominates
    # HBM traffic); losses/eval cast to f32 where it matters
    assert logits.dtype == jnp.bfloat16
    assert jax.tree_util.tree_leaves(v_shapes["params"])[0].dtype == jnp.float32
