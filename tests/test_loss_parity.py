"""Numeric parity of the flagship GNN-era loss vs the reference's own code.

Imports the reference's REAL CrossDatasetsCELoss_AdvGNN + MdsOhemCELoss +
OhemCELoss (lib/loss/loss_cross_datasets.py:812-1138, ohem_ce_loss.py),
feeds identical random inputs to them (torch, NCHW) and to our
CrossDatasetsCELossAdvGNN (jax, NHWC per-dataset lists), and asserts the
total losses agree — covering the prototype einsum, per-dataset bipartite
remaps with the annealed max/softmax mix, ×4 align_corners upsample into
the global-pool OHEM, aux-prototype OHEM, orth (similarity_dsb) and spa
terms in one number.

With random logits every per-pixel CE sits far above the OHEM floors
(−log 0.4 / −log 0.7), so both implementations keep the same (fixed-
threshold) pixel set and the comparison is exact up to float accumulation.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_reference_parity import DictConfiger, _stub  # noqa: E402

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_loss_mod():
    """Import lib.loss.loss_cross_datasets with only its UNUSED deps stubbed
    (class_remap/prototype_learning/kmeans/memory-bank are runtime paths the
    AdvGNN loss never touches); the OHEM/helper loss modules are REAL."""
    # py3.12 dropped distutils (the reference does
    # `from distutils.command.config import config` — an unused stray import)
    _stub("distutils")
    _stub("distutils.command")
    _stub("distutils.command.config", config=None)
    _stub("lib.class_remap", ClassRemap=None, ClassRemapOneHotLabel=None)
    _stub("lib.prototype_learning", prototype_learning=None,
          KmeansProtoLearning=None)
    _stub("lib.module.kmeans", kmeans=None)
    _stub("lib.module.memory_bank_helper", memory_bank_push=None)
    _stub("tools")
    _stub("tools.logger", Logger=object)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    _stub("lib")  # namespace only; real submodules load from __path__
    sys.modules["lib"].__path__ = [f"{REF}/lib"]
    pkg = types.ModuleType("lib.loss")
    pkg.__path__ = [f"{REF}/lib/loss"]
    sys.modules.setdefault("lib.loss", pkg)
    _stub("lib.module")
    sys.modules["lib.module"].__path__ = [f"{REF}/lib/module"]
    return importlib.import_module("lib.loss.loss_cross_datasets")


def _cfg_dict(with_aux: bool):
    return {
        "n_datasets": 2,
        "dataset1": {"n_cats": 3},
        "dataset2": {"n_cats": 4},
        "contrast": {"num_prototype": 1, "temperature": 0.07,
                     "with_mulbn": False},
        "loss": {"reweight": False, "ignore_index": 255,
                 "with_unify_label": True,
                 "with_spa": True, "spa_loss_weight": 0.1,
                 "with_max_enc": False, "max_enc_weight": 1.0,
                 "with_datasets_aux": with_aux, "aux_weight": 0.2,
                 "adv_loss_weight": 1.0, "adj_loss_weight": 1.0,
                 "GridSplit": False},
        "GNN": {"output_softmax_and_max_adj": True, "with_orth": True,
                "output_max_adj": True, "mse_or_adv": "None",
                "unify_ratio": 1.0, "orth_weight": 1.0},
        "lr": {"max_iter": 100},
        "train": {"gnn_iters": 10, "seg_iters": 20},
        # cur_iter % (gnn+seg) % gnn = 3 → max_rate 0.3 (ref :1065-1068)
        "iter": 3,
    }


def _inputs(seed: int, n_cats, D=16, hw=8, up=4, M=None):
    g = np.random.default_rng(seed)
    M = M if M is not None else sum(n_cats)
    feats = [g.normal(size=(1, hw, hw, D)).astype(np.float32) for _ in n_cats]
    labels = []
    for c in n_cats:
        lb = g.integers(0, c, (1, hw * up, hw * up)).astype(np.int64)
        lb[g.random(lb.shape) < 0.1] = 255
        labels.append(lb)
    proto = g.normal(size=(sum(n_cats) + M, D)).astype(np.float32)
    proto /= np.linalg.norm(proto, axis=1, keepdims=True)
    graphs = []
    for c in n_cats:
        soft = g.random((c, M)).astype(np.float32)
        soft /= soft.sum(1, keepdims=True)
        hard = np.zeros((c, M), np.float32)
        hard[np.arange(c), g.integers(0, M, c)] = 1.0
        graphs.extend([hard, soft])
    return feats, labels, proto, graphs


def test_advgnn_gnn_stage_loss_matches_reference(ref_loss_mod):
    """GNN-stage flavor: prototypes + 2n graphs + aux + orth + spa."""
    import jax.numpy as jnp

    from mds_tpu.config import Configer
    from mds_tpu.losses.cross_datasets import CrossDatasetsCELossAdvGNN

    n_cats = [3, 4]
    feats, labels, proto, graphs = _inputs(21, n_cats)

    # ---- reference (torch, NCHW, concatenated batch + dataset_ids) ----
    ref_crit = ref_loss_mod.CrossDatasetsCELoss_AdvGNN(
        DictConfiger(_cfg_dict(True))
    )
    t_seg = torch.cat(
        [torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats]
    )
    t_target = torch.cat([torch.from_numpy(lb) for lb in labels])
    t_ids = torch.tensor([0, 1])
    t_preds = {
        "seg": t_seg,
        "unify_prototype": torch.from_numpy(proto),
        "bi_graphs": [torch.from_numpy(gr) for gr in graphs],
    }
    with torch.no_grad():
        want, want_orth, want_aux, _ = ref_crit(
            t_preds, t_target, t_ids, is_adv=True, init_gnn_stage=False
        )

    # ---- ours (jax, NHWC per-dataset lists, explicit max_rate) ----
    crit = CrossDatasetsCELossAdvGNN(Configer(configs=_cfg_dict(True)))
    preds = {
        "seg": [jnp.asarray(f) for f in feats],
        "unify_prototype": jnp.asarray(proto),
        "bi_graphs": [jnp.asarray(gr) for gr in graphs],
    }
    got, metrics = crit(
        preds, [jnp.asarray(lb) for lb in labels], is_adv=True, max_rate=0.3
    )
    np.testing.assert_allclose(float(got), float(want), rtol=2e-4)
    np.testing.assert_allclose(
        float(metrics["orth_loss"]), float(want_orth), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(metrics["aux_loss"]), float(want_aux), rtol=2e-4
    )


def test_advgnn_seg_stage_loss_matches_reference(ref_loss_mod):
    """SEG-stage flavor: prototype=None, n UOT graphs, plain remap OHEM."""
    import jax.numpy as jnp

    from mds_tpu.config import Configer
    from mds_tpu.losses.cross_datasets import CrossDatasetsCELossAdvGNN

    n_cats = [3, 4]
    M = sum(n_cats)
    g = np.random.default_rng(5)
    # seg-stage 'seg' entries are the model's UNIFIED logits (M channels)
    logits = [g.normal(size=(1, 8, 8, M)).astype(np.float32) for _ in n_cats]
    _, labels, _, graphs = _inputs(23, n_cats)
    uot = [graphs[0], graphs[2]]  # one discrete graph per dataset

    ref_crit = ref_loss_mod.CrossDatasetsCELoss_AdvGNN(
        DictConfiger(_cfg_dict(False))
    )
    t_preds = {
        "seg": torch.cat(
            [torch.from_numpy(l.transpose(0, 3, 1, 2)) for l in logits]
        ),
        "unify_prototype": None,
        "bi_graphs": [torch.from_numpy(gr) for gr in uot],
    }
    t_target = torch.cat([torch.from_numpy(lb) for lb in labels])
    with torch.no_grad():
        want, _, _, _ = ref_crit(
            t_preds, t_target, torch.tensor([0, 1]),
            is_adv=False, init_gnn_stage=False,
        )

    crit = CrossDatasetsCELossAdvGNN(Configer(configs=_cfg_dict(False)))
    preds = {
        "seg": [jnp.asarray(l) for l in logits],
        "unify_prototype": None,
        "bi_graphs": [jnp.asarray(gr) for gr in uot],
    }
    got, _ = crit(preds, [jnp.asarray(lb) for lb in labels], is_adv=False)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-4)


def test_advgnn_init_stage_loss_matches_reference(ref_loss_mod):
    """Init-phase distillation (ref :1091-1115): adjacency-block MSE×10 to
    the identity graphs + prototype MSE×10·n to the seg model's prototypes."""
    import jax.numpy as jnp

    from mds_tpu.config import Configer
    from mds_tpu.losses.cross_datasets import CrossDatasetsCELossAdvGNN
    from mds_tpu.ops.uot_match import pretrain_bipartite_graphs

    n_cats = [3, 4]
    total = sum(n_cats)
    M = total
    D = 16
    g = np.random.default_rng(31)
    adj_full = g.random((total + M, total + M)).astype(np.float32)
    proto = g.normal(size=(M, D)).astype(np.float32)
    seg_proto = g.normal(size=(M, D)).astype(np.float32)
    pbg = [np.asarray(x, np.float32)
           for x in pretrain_bipartite_graphs(n_cats, M)]

    ref_crit = ref_loss_mod.CrossDatasetsCELoss_AdvGNN(
        DictConfiger(_cfg_dict(False))
    )
    t_preds = {
        "seg": torch.from_numpy(seg_proto),
        "unify_prototype": torch.from_numpy(proto),
        "bi_graphs": [],
        "adj": torch.from_numpy(adj_full),
        "pretrain_bipart_graph": [torch.from_numpy(x) for x in pbg],
    }
    with torch.no_grad():
        want, _, _, _ = ref_crit(
            t_preds, torch.zeros(1), torch.tensor([0]),
            is_adv=False, init_gnn_stage=True,
        )

    crit = CrossDatasetsCELossAdvGNN(Configer(configs=_cfg_dict(False)))
    preds = {
        "seg": [None, None],
        "unify_prototype": jnp.asarray(proto),
        "bi_graphs": [],
        "adj_block": jnp.asarray(adj_full[:total, total:]),
        "pretrain_bipart_graph": [jnp.asarray(x) for x in pbg],
        "seg_prototype": jnp.asarray(seg_proto),
    }
    got, _ = crit(preds, [None, None], is_adv=False, init_gnn_stage=True)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-4)


def test_rmi_loss_matches_reference(monkeypatch):
    """RMI (region mutual information) numeric parity vs lib/rmi_loss.py
    forward_sigmoid: masked BCE + Cholesky-log-det lower bound. The
    reference runs the covariance in float64, ours in f32 with the same
    1e-3 diagonal loading — agreement to 1e-3 relative."""
    from test_reference_parity import load_flat_module

    import jax.numpy as jnp

    from mds_tpu.losses.rmi import rmi_loss

    ref = load_flat_module("lib/rmi_loss.py", "ref_rmi_loss")
    # the reference casts via torch.cuda.DoubleTensor unconditionally
    # (rmi_loss.py:359-360); no GPU here
    monkeypatch.setattr(torch.cuda, "DoubleTensor", torch.DoubleTensor,
                        raising=False)
    C = 5
    cfg = DictConfiger({
        "loss": {"params": {
            "use_sigmoid": True, "num_classes": C, "rmi_radius": 3,
            "rmi_pool_way": 1, "rmi_pool_size": 4, "rmi_pool_stride": 4,
            "loss_weight_lambda": 0.5, "loss_weight": 1.0, "lambda_way": 1,
        }},
    })
    crit = ref.RMILoss(cfg)
    g = np.random.default_rng(41)
    logits = g.normal(size=(2, 32, 32, C)).astype(np.float32)
    labels = g.integers(0, C, (2, 32, 32)).astype(np.int64)
    labels[g.random(labels.shape) < 0.1] = 255

    with torch.no_grad():
        want = crit.forward_sigmoid(
            torch.from_numpy(logits.transpose(0, 3, 1, 2)),
            torch.from_numpy(labels),
        )
    got = rmi_loss(jnp.asarray(logits), jnp.asarray(labels), C,
                   radius=3, pool_size=4, pool_way=1,
                   weight_lambda=0.5, lambda_way=True)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-3)


def test_advgnn_gnn_stage_grad_matches_reference(ref_loss_mod):
    """Gradient parity wrt the seg features and the prototypes: pins the
    OHEM keep-mask semantics (selection is non-differentiable in both —
    torch indexes, we stop_gradient the threshold) and every einsum/upsample
    adjoint in the GNN-stage backward."""
    import jax
    import jax.numpy as jnp

    from mds_tpu.config import Configer
    from mds_tpu.losses.cross_datasets import CrossDatasetsCELossAdvGNN

    n_cats = [3, 4]
    feats, labels, proto, graphs = _inputs(29, n_cats)

    ref_crit = ref_loss_mod.CrossDatasetsCELoss_AdvGNN(
        DictConfiger(_cfg_dict(True))
    )
    t_feats = [
        torch.from_numpy(f.transpose(0, 3, 1, 2)).requires_grad_(True)
        for f in feats
    ]
    t_proto = torch.from_numpy(proto).requires_grad_(True)
    t_preds = {
        "seg": torch.cat(t_feats),
        "unify_prototype": t_proto,
        "bi_graphs": [torch.from_numpy(gr) for gr in graphs],
    }
    t_target = torch.cat([torch.from_numpy(lb) for lb in labels])
    want, _, _, _ = ref_crit(
        t_preds, t_target, torch.tensor([0, 1]), is_adv=True,
        init_gnn_stage=False,
    )
    want.backward()
    want_gf = [t.grad.numpy().transpose(0, 2, 3, 1) for t in t_feats]
    want_gp = t_proto.grad.numpy()

    crit = CrossDatasetsCELossAdvGNN(Configer(configs=_cfg_dict(True)))
    jl = [jnp.asarray(lb) for lb in labels]

    def loss_of(fs, p):
        preds = {
            "seg": list(fs),
            "unify_prototype": p,
            "bi_graphs": [jnp.asarray(gr) for gr in graphs],
        }
        return crit(preds, jl, is_adv=True, max_rate=0.3)[0]

    got_gf, got_gp = jax.grad(loss_of, argnums=(0, 1))(
        tuple(jnp.asarray(f) for f in feats), jnp.asarray(proto)
    )
    for a, b in zip(got_gf, want_gf):
        np.testing.assert_allclose(np.asarray(a), b, rtol=2e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_gp), want_gp, rtol=2e-3,
                               atol=1e-6)


def test_nll_plus_family_matches_reference(ref_loss_mod):
    """NLLPlus / WeightedNLLPlus / AdjNLLPlus / CircleLoss numeric parity vs
    lib/loss/loss_helper.py (:606-689)."""
    import importlib

    import jax.numpy as jnp

    from mds_tpu.losses.helpers import (
        adj_nll_plus_loss,
        nll_plus_loss,
        weighted_nll_plus_loss,
    )

    helper = importlib.import_module("lib.loss.loss_helper")
    g = np.random.default_rng(51)
    B, C, H, W = 2, 6, 8, 8
    x = g.normal(size=(B, C, H, W)).astype(np.float32)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))

    # NLLPlus: k alternative label maps, absent ones = ignore
    cfg = DictConfiger({"loss": {"ignore_index": 255}})
    labels_k = []
    for k in range(3):
        lb = g.integers(0, C, (B, H, W)).astype(np.int64)
        lb[g.random(lb.shape) < 0.2 * (k + 1)] = 255
        labels_k.append(lb)
    with torch.no_grad():
        want = helper.NLLPlusLoss(cfg)(
            torch.from_numpy(x), torch.from_numpy(np.stack(labels_k))
        )
    got = nll_plus_loss(x_nhwc, [jnp.asarray(l) for l in labels_k])
    np.testing.assert_allclose(float(got), float(want), rtol=1e-4)

    # WeightedNLLPlus
    wm = g.random((B, H, W, C)).astype(np.float32)
    with torch.no_grad():
        want = helper.WeightedNLLPlusLoss(cfg)(
            torch.from_numpy(x), torch.from_numpy(wm)
        )
    got = weighted_nll_plus_loss(x_nhwc, jnp.asarray(wm))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-4)

    # AdjNLLPlus (per-pixel values over valid pixels)
    n_cats = 4
    adj = g.random((n_cats, C)).astype(np.float32)
    adj /= adj.sum(1, keepdims=True)
    lb = g.integers(0, n_cats, (B, 2 * H, 2 * W)).astype(np.int64)
    lb[g.random(lb.shape) < 0.1] = 255
    with torch.no_grad():
        want = helper.AdjNLLPlusLoss()(
            torch.from_numpy(x), torch.from_numpy(adj),
            torch.from_numpy(lb.copy()),
        )
    nll, valid = adj_nll_plus_loss(x_nhwc, jnp.asarray(adj), jnp.asarray(lb))
    got_vals = np.asarray(nll)[np.asarray(valid)]
    np.testing.assert_allclose(
        np.sort(got_vals), np.sort(want.numpy()), rtol=1e-4
    )

    # (the reference file defines a second, configer-based CircleLoss that
    # SHADOWS the sp/sn variant our circle_loss ports — no importable
    # counterpart; formula-level coverage lives in test_losses.py)
