import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mds_tpu.models.semseg import (
    SemsegModel,
    proto_logits,
    remap_logits,
    set_bipartite_graphs,
    set_unify_prototype,
)
from mds_tpu.models.swiftnet import SharedListBN, SwiftNetPyramid

HW = 64  # swiftnet needs /32 at the deepest pyramid level (64/4/32 = ... ok /128 of base)


def test_sharedlistbn_joint_moments_match_stacked():
    """Joint moments over a list must equal BN over the concatenated batch."""
    rng = np.random.default_rng(0)
    c = 5
    a = rng.normal(1, 2, (2, 4, 4, c)).astype(np.float32)
    b = rng.normal(-3, 0.5, (3, 4, 4, c)).astype(np.float32)
    m = SharedListBN(c, n_slots=1)
    v = m.init(jax.random.PRNGKey(0), [jnp.zeros((1, 4, 4, c))] * 2, train=False)
    ys, mut = m.apply(v, [jnp.asarray(a), jnp.asarray(b)], train=True,
                      mutable=["batch_stats"])
    stacked = np.concatenate([a, b], 0)
    mean = stacked.reshape(-1, c).mean(0)
    var = stacked.reshape(-1, c).var(0)
    got = np.concatenate([np.asarray(ys[0]), np.asarray(ys[1])], 0)
    want = (stacked - mean) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(got, want, atol=1e-4)
    n = stacked.reshape(-1, c).shape[0]
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["mean"][0]), 0.1 * mean, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["var"][0]),
        0.9 * 1.0 + 0.1 * var * n / (n - 1),
        atol=1e-4,
    )


@pytest.fixture(scope="module")
def semseg_model():
    model = SemsegModel(
        datasets_cats=(5, 7), output_feat_dim=32, unify_ratio=2.0,
        with_datasets_aux=True,
    )
    xs = [jnp.zeros((1, HW, HW, 3)), jnp.zeros((1, HW, HW, 3))]
    init = jax.jit(lambda k: model.init({"params": k}, xs, train=True))
    return model, init(jax.random.PRNGKey(0))


def test_semseg_train_shapes(semseg_model):
    model, variables = semseg_model
    M = model.max_num_unify_class
    assert M == 24
    xs = [jnp.zeros((2, HW, HW, 3)), jnp.zeros((1, HW, HW, 3))]
    out = jax.eval_shape(
        lambda v, a, b: model.apply(v, [a, b], train=True, mutable=["batch_stats"])[0],
        variables, xs[0], xs[1],
    )
    assert out["seg"][0].shape == (2, HW // 4, HW // 4, M)
    assert out["seg"][1].shape == (1, HW // 4, HW // 4, M)
    assert out["aux"][0].shape == (2, HW // 4, HW // 4, 5)
    assert out["aux"][1].shape == (1, HW // 4, HW // 4, 7)
    assert out["feat"][0].shape == (2, HW // 4, HW // 4, 32)


def test_semseg_eval_remap(semseg_model):
    model, variables = semseg_model
    x = jnp.zeros((1, HW, HW, 3))
    logits = jax.eval_shape(
        lambda v, x: model.apply(v, x, dataset=1, method=model.eval_logits),
        variables, x,
    )
    assert logits.shape == (1, HW // 4, HW // 4, 7)
    pred = jax.eval_shape(
        lambda v, x: model.apply(v, x, dataset=0, method=model.pred), variables, x
    )
    assert pred.shape == (1, HW, HW)


def test_set_bipartite_and_prototype(semseg_model):
    model, variables = semseg_model
    M = model.max_num_unify_class
    g0 = np.eye(5, M, dtype=np.float32)
    g1 = np.eye(7, M, k=5, dtype=np.float32)
    v2 = set_bipartite_graphs(variables, [g0, g1])
    np.testing.assert_array_equal(np.asarray(v2["buffers"]["bi_graph_0"]), g0)
    # 2n form: even indices taken
    v3 = set_bipartite_graphs(variables, [g0, g0 * 2, g1, g1 * 2])
    np.testing.assert_array_equal(np.asarray(v3["buffers"]["bi_graph_1"]), g1)

    proto = np.random.default_rng(0).normal(size=(5 + 7 + M, 32)).astype(np.float32)
    v4 = set_unify_prototype(variables, proto, (5, 7), with_datasets_aux=True)
    np.testing.assert_array_equal(np.asarray(v4["params"]["aux_prototype_0"]), proto[:5])
    np.testing.assert_array_equal(np.asarray(v4["params"]["aux_prototype_1"]), proto[5:12])
    np.testing.assert_array_equal(np.asarray(v4["params"]["unify_prototype"]), proto[12:])


def test_proto_and_remap_einsums():
    rng = np.random.default_rng(1)
    f = jnp.asarray(rng.normal(0, 1, (2, 3, 3, 8)), jnp.float32)
    P = jnp.asarray(rng.normal(0, 1, (10, 8)), jnp.float32)
    lg = proto_logits(f, P)
    want = np.einsum("bhwc,nc->bhwn", np.asarray(f), np.asarray(P))
    np.testing.assert_allclose(np.asarray(lg), want, atol=1e-4)
    G = jnp.asarray(rng.normal(0, 1, (4, 10)), jnp.float32)
    rm = remap_logits(lg, G)
    want2 = np.einsum("bhwn,cn->bhwc", want, np.asarray(G))
    np.testing.assert_allclose(np.asarray(rm), want2, atol=1e-3)


def test_swiftnet_output_stride_4():
    model = SwiftNetPyramid()
    xs = [jnp.zeros((1, HW, HW, 3))]
    out = jax.eval_shape(
        lambda k: model.init(k, xs, train=False), jax.random.PRNGKey(0)
    )
    feat = jax.eval_shape(
        lambda v, x: model.apply(v, [x], train=False)[0],
        out, xs[0],
    )
    assert feat.shape == (1, HW // 4, HW // 4, 128)


def test_snp_mulbn_variant():
    model = SemsegModel(
        datasets_cats=(3, 4), output_feat_dim=16, unify_ratio=1.0, mulbn=True,
    )
    xs = [jnp.zeros((1, HW, HW, 3)), jnp.zeros((1, HW, HW, 3))]
    v = jax.eval_shape(
        lambda k: model.init({"params": k}, xs, train=True), jax.random.PRNGKey(0)
    )
    # per-dataset stats: (n_slots, n_datasets, C)
    bn = v["batch_stats"]["backbone"]["layer1_0"]["bn1"]
    assert bn["mean"].shape == (3, 2, 64)
    out = jax.eval_shape(
        lambda v, a, b: model.apply(v, [a, b], train=True,
                                    mutable=["batch_stats"])[0],
        v, xs[0], xs[1],
    )
    assert out["seg"][0].shape == (1, HW // 4, HW // 4, 7)


def test_swiftnet_remat_grad():
    """remat (the reference's `efficient` checkpointing) must be trainable."""
    model = SwiftNetPyramid(remat=True)
    x = jnp.ones((1, HW, HW, 3), jnp.float32)
    v = jax.jit(lambda k: model.init(k, [x], train=False))(jax.random.PRNGKey(0))

    @jax.jit
    def loss(params):
        f = model.apply({"params": params, "batch_stats": v["batch_stats"]},
                        [x], train=False)[0]
        return jnp.sum(f.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(v["params"])
    leaf = jax.tree_util.tree_leaves(g)[0]
    assert np.isfinite(np.asarray(leaf)).all()


def test_clip_unseen_tg_modes():
    """aux_mode clip/unseen/train_tg coverage (reference semseg.py:355-374)."""
    model = SemsegModel(datasets_cats=(3, 4), output_feat_dim=16,
                        unify_ratio=1.0)
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (1, 64, 64, 3)),
                    jnp.float32)
    v = model.init({"params": jax.random.PRNGKey(0)}, [x, None], train=False)
    # identity graphs so rows are meaningful
    from mds_tpu.models.semseg import set_bipartite_graphs
    from mds_tpu.ops.uot_match import pretrain_bipartite_graphs

    v = {**v, **set_bipartite_graphs(
        {"buffers": dict(v.get("buffers", {}))},
        pretrain_bipartite_graphs((3, 4), 7),
    )}
    clip = model.apply(v, x, dataset=1, method=model.clip_logits)
    assert clip.shape[-1] == 4  # dataset 1's own class count
    unseen = model.apply(v, x, dataset=0, method=model.unseen_pred_logits)
    assert unseen.shape[-1] == 3
    # one-hot remap: each pixel's row sums to <= 1 and is binary-ish
    u = np.asarray(unseen)
    assert ((u == 0) | (u == 1)).all()
    tg = model.apply(v, [x, None], method=model.features_tg)
    assert tg["seg"][0].shape[-1] == 16 and tg["seg"][1] is None
