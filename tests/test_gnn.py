import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mds_tpu.config import Configer
from mds_tpu.losses.cross_datasets import CrossDatasetsCELossAdvGNN, similarity_dsb
from mds_tpu.models.gnn import LearnableTopologyBGNN, max_mask_graphs, normalize_adj
from mds_tpu.ops.sinkhorn import (
    log_optimal_transport,
    sinkhorn_knopp_unbalanced,
    solve_optimal_transport,
)
from mds_tpu.ops.uot_match import (
    pretrain_bipartite_graphs,
    sep_bipartite_graphs_by_uot,
    uot_bipartite_match,
)

CATS = (3, 4)
NFEAT = 16


# ------------------------------------------------------------------- sinkhorn
def np_uot(a, b, M, reg, reg_m, iters=1000, thr=1e-6):
    """Independent numpy reimplementation of POT sinkhorn_knopp_unbalanced."""
    K = np.exp(-M / reg)
    fi = reg_m / (reg_m + reg)
    u = np.ones(len(a)) / len(a)
    v = np.ones(len(b)) / len(b)
    for _ in range(iters):
        u_prev, v_prev = u, v
        u = (a / (K @ v)) ** fi
        v = (b / (K.T @ u)) ** fi
        err = 0.5 * (
            np.max(np.abs(u - u_prev)) / max(np.max(np.abs(u)), np.max(np.abs(u_prev)), 1.0)
            + np.max(np.abs(v - v_prev)) / max(np.max(np.abs(v)), np.max(np.abs(v_prev)), 1.0)
        )
        if err < thr:
            break
    return u[:, None] * K * v[None, :]


def test_uot_matches_numpy_reference():
    rng = np.random.default_rng(0)
    M = rng.random((6, 4)).astype(np.float64)
    a = np.full(6, 1 / 6)
    b = np.full(4, 1 / 4)
    want = np_uot(a, b, M, reg=0.01, reg_m=5.0)
    got = np.asarray(
        sinkhorn_knopp_unbalanced(jnp.asarray(a), jnp.asarray(b), jnp.asarray(M), 0.01, 5.0)
    )
    # ours runs f32 on device, the reference f64 — tolerance reflects that
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-4)
    # mass roughly preserved vs marginals (unbalanced: close, not exact)
    assert 0.2 < got.sum() < 2.0


def test_balanced_sinkhorn_marginals():
    rng = np.random.default_rng(1)
    scores = jnp.asarray(rng.normal(0, 1, (1, 5, 7)), jnp.float32)
    Z = log_optimal_transport(scores, iters=200)
    P = np.exp(np.asarray(Z))  # scaled by m+n
    # the v-update runs last, so the column marginal is satisfied exactly
    # (rows only approximately — rectangular uniform marginals are inconsistent)
    np.testing.assert_allclose(P.sum(1), np.ones((1, 7)), atol=2e-2)


def test_solve_ot_mutual_max_identity():
    # strongly diagonal scores → identity matching
    s = jnp.asarray(10 * np.eye(4)[None], jnp.float32)
    res = solve_optimal_transport(s, 100, -10)
    np.testing.assert_array_equal(np.asarray(res["matches1"][0]), np.arange(4))


# ------------------------------------------------------------------- uot match
def test_uot_match_invariants():
    rng = np.random.default_rng(2)
    n_cats, M = 5, 9
    aff = rng.random((n_cats, M))
    beta = np.full(n_cats, 1 / n_cats)
    g, nb = uot_bipartite_match(aff, beta, uot_ratio=1.0)
    assert g.shape == (n_cats, M)
    # every dataset class keeps at least one unified column
    assert (g.sum(axis=1) >= 1).all()
    # every unified column maps to at most one class
    assert (g.sum(axis=0) <= 1).all()
    # beta EMA moved but stays a distribution-ish vector
    assert nb.shape == beta.shape and not np.allclose(nb, beta)


def test_sep_uot_multidataset():
    rng = np.random.default_rng(3)
    adj = rng.random((sum(CATS), 10))
    betas = [np.full(c, 1 / c) for c in CATS]
    graphs, new_betas = sep_bipartite_graphs_by_uot(adj, CATS, betas)
    assert len(graphs) == 2
    assert graphs[0].shape == (3, 10) and graphs[1].shape == (4, 10)
    for g in graphs:
        assert (g.sum(axis=1) >= 1).all()


def test_pretrain_identity_graphs():
    gs = pretrain_bipartite_graphs(CATS, 10)
    assert gs[0][0, 0] == 1 and gs[1][0, 3] == 1
    np.testing.assert_array_equal(gs[0].sum(1), np.ones(3))


# ------------------------------------------------------------------- gnn model
@pytest.fixture(scope="module")
def gnn_and_vars():
    model = LearnableTopologyBGNN(
        dataset_cats=CATS, nfeat=NFEAT, nfeat_out=8, nfeat_adj=8,
        output_feat_dim=8, unify_ratio=1.0, adj_mode="direct",
        with_datasets_aux=True, mse_or_adv="mse",
    )
    x = jnp.zeros((sum(CATS), NFEAT))
    v = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                   x, train=False)
    return model, v


def test_gnn_forward_shapes(gnn_and_vars):
    model, v = gnn_and_vars
    T, M = sum(CATS), sum(CATS)
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (T, NFEAT)), jnp.float32)
    out = model.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
    assert out["unify_prototype"].shape == (T + M, 8)  # aux rows + unified
    assert len(out["bi_graphs"]) == 2
    assert out["bi_graphs"][0].shape == (3, M)
    assert out["adj_block"].shape == (T, M)
    # softmax over dataset-class axis per dataset
    np.testing.assert_allclose(np.asarray(out["bi_graphs"][0]).sum(0), 1.0, atol=1e-5)
    assert len(out["adv_pairs"]) == 4 and len(out["ret_feats"]) == 5


def test_gnn_cosine_mode():
    model = LearnableTopologyBGNN(
        dataset_cats=CATS, nfeat=NFEAT, nfeat_out=8, nfeat_adj=8,
        output_feat_dim=8, adj_mode="cosine",
    )
    x = jnp.zeros((sum(CATS), NFEAT))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = model.apply(v, x, train=False)
    assert out["unify_prototype"].shape == (sum(CATS), 8)


def test_normalize_adj_rows():
    a = jnp.asarray([[1.0, 3.0], [0.0, 0.0]])
    n = np.asarray(normalize_adj(a))
    np.testing.assert_allclose(n[0], [0.25, 0.75])
    np.testing.assert_allclose(n[1], [0.0, 0.0])


def test_max_mask_graphs():
    block = jnp.asarray(np.random.default_rng(0).random((sum(CATS), 7)), jnp.float32)
    gs = max_mask_graphs(block, CATS)
    for g in gs:
        g = np.asarray(g)
        assert ((g > 0).sum(axis=0) == 1).all()  # one surviving row per column


# ------------------------------------------------------------------- adv loss
def _mk_configer():
    return Configer(configs={
        "n_datasets": 2,
        "dataset1": {"n_cats": 3}, "dataset2": {"n_cats": 4},
        "GNN": {"unify_ratio": 1.0, "with_orth": True, "orth_weight": 1.0,
                 "mse_or_adv": "mse", "output_max_adj": True,
                 "output_softmax_and_max_adj": True},
        "loss": {"with_datasets_aux": True, "aux_weight": 0.2,
                  "with_spa": True, "spa_loss_weight": 0.1},
        "contrast": {"temperature": 0.07},
    })


def test_adv_gnn_loss_smoke():
    cfg = _mk_configer()
    crit = CrossDatasetsCELossAdvGNN(cfg)
    rng = np.random.default_rng(4)
    T, M, D = 7, 7, 8
    h = w = 8
    feats = [jnp.asarray(rng.normal(0, 1, (2, h, w, D)), jnp.float32),
             jnp.asarray(rng.normal(0, 1, (1, h, w, D)), jnp.float32)]
    proto = jnp.asarray(rng.normal(0, 1, (T + M, D)), jnp.float32)
    block = jax.nn.softmax(jnp.asarray(rng.normal(0, 1, (T, M)), jnp.float32), axis=0)
    graphs = []
    from mds_tpu.models.gnn import max_mask_graphs as mmg
    maxg = mmg(block, (3, 4))
    cur = 0
    for i, c in enumerate((3, 4)):
        graphs.extend([maxg[i], block[cur:cur + c]])
        cur += c
    targets = [jnp.asarray(rng.integers(0, 3, (2, h * 4, w * 4)), jnp.int32),
               jnp.asarray(rng.integers(0, 4, (1, h * 4, w * 4)), jnp.int32)]
    adv_pairs = [(jnp.zeros((T + M, 8)), jnp.ones((T + M, 8)) * 0.1)] * 4
    loss, metrics = crit(
        {"seg": feats, "unify_prototype": proto, "bi_graphs": graphs,
         "adv_pairs": adv_pairs},
        targets, is_adv=True, max_rate=0.5,
    )
    assert np.isfinite(float(loss))
    for k in ("ce_loss", "orth_loss", "aux_loss", "adv_loss"):
        assert k in metrics, k


def test_adv_gnn_loss_grad_flows():
    cfg = _mk_configer()
    crit = CrossDatasetsCELossAdvGNN(cfg)
    rng = np.random.default_rng(5)
    T, M, D, h = 7, 7, 8, 8
    feats = [jnp.asarray(rng.normal(0, 1, (1, h, h, D)), jnp.float32),
             jnp.asarray(rng.normal(0, 1, (1, h, h, D)), jnp.float32)]
    targets = [jnp.asarray(rng.integers(0, 3, (1, h * 4, h * 4)), jnp.int32),
               jnp.asarray(rng.integers(0, 4, (1, h * 4, h * 4)), jnp.int32)]
    block = jax.nn.softmax(jnp.asarray(rng.normal(0, 1, (T, M)), jnp.float32), axis=0)
    graphs = [block[:3], block[3:]]

    def f(proto):
        loss, _ = crit(
            {"seg": feats, "unify_prototype": proto, "bi_graphs": graphs},
            targets, is_adv=False,
        )
        return loss

    proto = jnp.asarray(rng.normal(0, 1, (T + M, D)), jnp.float32)
    g = jax.grad(f)(proto)
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).sum() > 0


def test_similarity_dsb_entropy():
    # orthogonal prototypes at low temperature → tiny entropy
    p = jnp.eye(4) * 10
    lo = float(similarity_dsb(p, 0.07))
    hi = float(similarity_dsb(jnp.ones((4, 4)), 0.07))
    assert lo < hi


def test_gat_layer_and_gnn_type():
    from mds_tpu.models.gnn import GATLayer

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(0, 1, (7, 8)), jnp.float32)
    adj = jnp.asarray((rng.random((7, 7)) > 0.5).astype(np.float32))
    m = GATLayer(8)
    v = m.init(jax.random.PRNGKey(0), x, adj)
    y = m.apply(v, x, adj)
    assert y.shape == (7, 8)
    assert np.isfinite(np.asarray(y)).all()

    gnn = LearnableTopologyBGNN(
        dataset_cats=CATS, nfeat=NFEAT, nfeat_out=8, nfeat_adj=8,
        output_feat_dim=8, gnn_type="GAT", adj_mode="direct",
    )
    xg = jnp.zeros((sum(CATS), NFEAT))
    vg = gnn.init({"params": jax.random.PRNGKey(0)}, xg, train=False)
    out = gnn.apply(vg, xg, train=False)
    assert out["unify_prototype"].shape == (sum(CATS), 8)


def test_gumbel_softmax_decay_schedule():
    """Golden vs the reference formula (np_gumbel_softmax_decay,
    graph_attention_network.py:1207-1218)."""
    import numpy as np

    from mds_tpu.models.gnn import gumbel_softmax_decay

    for it, r, mx, mn in [(0, 2e-5, 10.0, 0.01), (1000, 2e-5, 10.0, 0.01),
                          (10**6, 2e-5, 10.0, 0.01), (5, 1e-4, 1.0, 0.1)]:
        want = max(mn, mx * np.exp(-r * it))
        got = gumbel_softmax_decay(it, r, mx, mn)
        assert abs(got - want) < 1e-9, (it, got, want)


def test_gumbel_max_graphs_matches_numpy_formula():
    """The jax Gumbel sampler must equal softmax((10·g + G)/τ) with the same
    Gumbel noise (torch F.gumbel_softmax semantics, dim=0)."""
    import numpy as np

    from mds_tpu.models.gnn import gumbel_max_graphs

    cats = (3, 4)
    M = 6
    rng = np.random.default_rng(0)
    block = jnp.asarray(rng.normal(0, 1, (sum(cats), M)), jnp.float32)
    key = jax.random.PRNGKey(3)
    tau = 0.7
    out = gumbel_max_graphs(block, cats, tau, key)
    # reconstruct the same noise with the same key schedule
    keys = jax.random.split(key, len(cats))
    cur = 0
    for i, c in enumerate(cats):
        g = np.asarray(block[cur:cur + c])
        u = np.asarray(jax.random.uniform(
            keys[i], (c, M), minval=float(np.finfo(np.float32).tiny), maxval=1.0
        ))
        gum = -np.log(-np.log(u))
        z = (10.0 * g + gum) / tau
        want = np.exp(z - z.max(0)) / np.exp(z - z.max(0)).sum(0)
        np.testing.assert_allclose(np.asarray(out[i]), want, atol=1e-5)
        # columns are distributions over dataset classes
        np.testing.assert_allclose(np.asarray(out[i]).sum(0), 1.0, atol=1e-5)
        cur += c


def test_gumbel_anneals_to_argmax():
    """At τ→min the samples sharpen onto the column-argmax rows when the
    affinities are well separated."""
    import numpy as np

    cats = (4,)
    block = jnp.asarray(np.eye(4, 5) * 5.0, jnp.float32)  # huge margins
    from mds_tpu.models.gnn import gumbel_max_graphs

    out = gumbel_max_graphs(block, cats, 0.01, jax.random.PRNGKey(0))[0]
    hard = np.asarray(out).argmax(0)
    assert list(hard[:4]) == [0, 1, 2, 3]
    assert np.asarray(out).max(0).min() > 0.99  # nearly one-hot columns


def test_km_bipartite_match():
    """Hungarian matching + orphan-column repair
    (reference sep_bipartite_graphs_by_km, :1220-1244)."""
    import numpy as np

    from mds_tpu.ops.uot_match import km_bipartite_match, sep_bipartite_graphs_by_km

    aff = np.array([
        [0.9, 0.1, 0.0, 0.8],
        [0.2, 0.8, 0.1, 0.9],
        [0.1, 0.3, 0.7, 0.0],
    ], np.float32)
    g = km_bipartite_match(aff)
    # assignment maximizes total affinity: (0,0), (1,1)... check optimality
    # by brute force over all row permutations of 3 of the 4 columns
    import itertools

    best, best_v = None, -1.0
    for cols in itertools.permutations(range(4), 3):
        v = sum(aff[r, c] for r, c in enumerate(cols))
        if v > best_v:
            best, best_v = cols, v
    got_v = 0.0
    for r in range(3):
        matched = np.flatnonzero(g[r] == 1)
        # the row's assignment column is among its 1s
    # every column has exactly one owner; every row kept >= 1 column
    assert (g.sum(axis=0) == 1).all()
    assert (g.sum(axis=1) >= 1).all()
    # the assignment part achieves the brute-force optimum
    assign_cols = {r: None for r in range(3)}
    # reconstruct: columns owned by each row; the Hungarian columns are the
    # subset where that column's owner row also maximizes the brute force
    total = sum(aff[np.argmax(g[:, j]), j] for j in range(4) if g[:, j].sum())
    assert total >= best_v - 1e-6  # includes orphan columns => >= optimum

    gs = sep_bipartite_graphs_by_km(
        np.concatenate([aff, aff[:2]], axis=0), (3, 2)
    )
    assert gs[0].shape == (3, 4) and gs[1].shape == (2, 4)
    for gg in gs:
        assert (gg.sum(axis=0) == 1).all()


def test_crop_image_by_label_value():
    """Class-crop mining (gen_graph_node_feature.py:192-264): largest
    component bbox, gray fill outside the dilated mask, square padding."""
    import numpy as np

    from mds_tpu.data.node_features import crop_image_by_label_value

    img = np.full((20, 30, 3), 7, np.uint8)
    lb = np.zeros((20, 30), np.uint8)
    lb[4:10, 5:25] = 3          # big component: 6 x 20 bbox
    lb[15:17, 1:3] = 3          # small component — must be ignored
    out = crop_image_by_label_value(img, lb, 3)
    # padded to square of the larger side (20)
    assert out.shape[0] == out.shape[1] == 20
    # interior keeps image pixels; padding rows are gray
    assert (out[0] == 128).all() and (out[-1] == 128).all()
    assert (out[10] == 7).any()
    # absent class → zeros
    assert (crop_image_by_label_value(img, lb, 9) == 0).all()


def test_node_features_offline_fallback_stable():
    from mds_tpu.data.node_features import gen_graph_node_features

    a = gen_graph_node_features(class_names=[["road", "car"], ["sky"]],
                                nfeat=32)
    b = gen_graph_node_features(class_names=[["road", "car"], ["sky"]],
                                nfeat=32)
    assert a.shape == (3, 32)
    np.testing.assert_allclose(a, b)


def test_self_attention_gnn_forward():
    """Self_Attention_GNN fork (graph_attention_network.py:244-420)."""
    from mds_tpu.models.gnn import SelfAttentionGNN, fixed_block_adjacency

    cats = (3, 4)
    m = SelfAttentionGNN(dataset_cats=cats, nfeat=16, nfeat_out=16,
                         adj_feat_dim=8, output_feat_dim=8, nheads=2)
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (7, 16)), jnp.float32)
    v = m.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
               x, train=False)
    out = m.apply(v, x, train=False)
    assert out["unify_prototype"].shape == (7, 8)
    assert len(out["bi_graphs"]) == 2
    assert out["bi_graphs"][0].shape == (3, 7)
    np.testing.assert_allclose(
        np.asarray(out["bi_graphs"][0]).sum(0), 1.0, atol=1e-5
    )
    # pretrain mode → identity graphs
    out_p = m.apply(v, x, train=False, pretrain=True)
    np.testing.assert_array_equal(
        np.asarray(out_p["bi_graphs"][0]), np.eye(3, 7)
    )
    # fixed adjacency is symmetric + normalized, bipartite identity blocks
    A = np.asarray(fixed_block_adjacency(cats, 7))
    np.testing.assert_allclose(A, A.T, atol=1e-6)
    assert A[0, 7] > 0 and A[0, 8] == 0  # identity sub-block row 0


def test_learnable_topology_gat_forward():
    """Learnable_Topology_GAT fork (graph_attention_network.py:670-860)."""
    from mds_tpu.models.gnn import LearnableTopologyGAT

    cats = (3, 4)
    m = LearnableTopologyGAT(dataset_cats=cats, nfeat=16, nfeat_out=16,
                             nfeat_adj=8, nhid=8, nheads=2,
                             output_feat_dim=8)
    x = jnp.asarray(np.random.default_rng(1).normal(0, 1, (7, 16)), jnp.float32)
    v = m.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
               x, train=False)
    out = m.apply(v, x, train=False)
    assert out["unify_prototype"].shape == (7, 8)
    assert out["adj_block"].shape == (7, 7)
    np.testing.assert_allclose(
        np.asarray(out["bi_graphs"][1]).sum(0), 1.0, atol=1e-5
    )
    # differentiable end-to-end
    def loss(p):
        o = m.apply({"params": p}, x, train=False)
        return jnp.sum(o["unify_prototype"] ** 2) + sum(
            jnp.sum(g) for g in o["bi_graphs"]
        )
    g = jax.grad(loss)(v["params"])
    leaf = jax.tree_util.tree_leaves(g)[0]
    assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.parametrize("kw,blocks", [
    (dict(adj_mode="direct_full"), (3, 4)),           # ltbgnn_direct_learn3
    (dict(adj_mode="direct_full", n_gcn_layers=3), (3, 4)),  # ltbgnn_sfg
    (dict(adj_mode="direct", with_unlabel=True), (4, 5)),    # ltbgnn_unlabel
])
def test_bgnn_fork_variants(kw, blocks):
    """Research forks as options (ltbgnn_direct_learn3 / _sfg / _unlabel)."""
    from mds_tpu.models.gnn import LearnableTopologyBGNN

    cats = (3, 4)
    m = LearnableTopologyBGNN(
        dataset_cats=cats, nfeat=16, nfeat_out=16, nfeat_adj=8,
        output_feat_dim=8, unify_ratio=1.0, dropout_rate=0.0, **kw,
    )
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (7, 16)), jnp.float32)
    v = m.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
               x, train=False)
    out = m.apply(v, x, train=False)
    M = m.max_num_unify_class
    assert M == 7  # unify from true cats, not graph nodes
    assert out["unify_prototype"].shape == (M, 8)
    for g, c in zip(out["bi_graphs"], blocks):
        assert g.shape == (c, M), (g.shape, c)
        np.testing.assert_allclose(np.asarray(g).sum(0), 1.0, atol=1e-5)
    if kw.get("adj_mode") == "direct_full":
        assert v["params"]["adj_matrix"].shape == (14, 14)
    if kw.get("with_unlabel"):
        assert v["params"]["unlabel_node_features"].shape == (2, 16)
    if "n_gcn_layers" in kw:
        assert "gcn_layers_3" not in v["params"]
