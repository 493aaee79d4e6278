"""Eval drivers: flagship (prototype-model) evaluability end-to-end.

Regression for VERDICT r2 weak #1: `tools/evaluate.py` crashed with
ScopeCollectionNotFound('bi_graph_0') on any prototype model because the
buffers collection was never threaded through. These tests drive the same
code path the CLI runs (drivers.run_evaluation) on a tiny synthetic config.

Reference drivers being matched: evaluate.py eval_model :907 (+crop),
eval_model_contrast :1107, eval_model_uni/unseen/clip :1346-1460,
find_unuse_label :1688, eval_find_use_and_unuse_label :1788.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mds_tpu.config import Configer

HW = 64


def snp_configer(tmp_path=None, mode="alternate"):
    return Configer(configs={
        "model_name": "snp_rn18",
        "n_datasets": 2,
        "dataset1": {"n_cats": 3, "ims_per_gpu": 1, "data_reader": "Synthetic",
                     "reader_kwargs": {"n_cats": 3, "size": [HW, HW],
                                       "length": 2}},
        "dataset2": {"n_cats": 4, "ims_per_gpu": 1, "data_reader": "Synthetic",
                     "reader_kwargs": {"n_cats": 4, "size": [HW, HW],
                                       "length": 2, "seed": 1}},
        "GNN": {
            "model_name": "learnable_topology_BGNN_adj",
            "nfeat": 32, "nfeat_out": 16, "nfeat_adj": 16,
            "output_feat_dim": 16, "adj_feat_dim": 16,
            "unify_ratio": 1.0, "dropout_rate": 0.1,
            "GNN_type": "GSAGE", "mse_or_adv": "None",
            "output_max_adj": True, "output_softmax_and_max_adj": True,
            "with_orth": True, "orth_weight": 1.0, "uot_ratio": 1.0,
        },
        "loss": {"with_datasets_aux": True, "aux_weight": 0.2,
                 "ignore_index": 255},
        "contrast": {"temperature": 0.07},
        "lr": {"seg_lr_start": 1e-3, "gnn_lr_start": 1e-3,
               "weight_decay": 1e-5, "max_iter": 20, "warmup_iters": 2},
        "train": {"mode": mode, "seg_iters": 3, "gnn_iters": 2,
                  "cropsize": [HW, HW], "num_workers": 2,
                  "ckpt_interval": 2},
    })


def make_batch(rng, cats=(3, 4)):
    ims, lbs = [], []
    for c in cats:
        lb8 = rng.integers(0, c, (1, HW // 4, HW // 4))
        lb = np.repeat(np.repeat(lb8, 4, 1), 4, 2).astype(np.uint8)
        ims.append(rng.integers(0, 256, (1, HW, HW, 3)).astype(np.uint8))
        lbs.append(lb)
    return {"ims": ims, "lbs": lbs}


@pytest.fixture(scope="module")
def trained_bundle(tmp_path_factory):
    """A few alternating steps (past one GNN→SEG switch so real UOT graphs
    live in the buffers), saved + reloaded through build_eval_bundle."""
    from mds_tpu.engine.gnn_trainer import AlternatingTrainer
    from mds_tpu.evaluation.drivers import build_eval_bundle

    cfg = snp_configer()
    t = AlternatingTrainer(cfg)
    rng = np.random.default_rng(0)
    for _ in range(4):  # 2 gnn → switch → 2 seg
        t.step(make_batch(rng))
    d = str(tmp_path_factory.mktemp("gnn_ckpt"))
    t.save(d)
    model, variables, info = build_eval_bundle(cfg, ckpt=d,
                                               compute_dtype=jnp.float32)
    assert "buffers" in variables and "bi_graph_0" in variables["buffers"]
    # the restored buffers are the post-switch UOT graphs, not init zeros
    np.testing.assert_array_equal(
        np.asarray(variables["buffers"]["bi_graph_0"]), t.uot_bi[0]
    )
    return cfg, model, variables


def test_run_eval_contrast_and_ss(trained_bundle):
    """The r2 crash repro: prototype model through the CLI eval path."""
    from mds_tpu.evaluation.evaluator import eval_model
    from mds_tpu.data.loader import get_data_loader

    cfg, model, variables = trained_bundle
    for mode in ("contrast", "ss"):
        loaders = get_data_loader(cfg, "eval")
        mious = eval_model(cfg, model, variables, loaders, mode=mode)
        assert len(mious) == 2
        assert all(0.0 <= m <= 1.0 for m in mious), (mode, mious)


@pytest.mark.slow
def test_run_eval_all_modes(trained_bundle):
    """Every protocol mode produces a finite mIoU on the prototype model."""
    from mds_tpu.evaluation.evaluator import eval_model
    from mds_tpu.data.loader import get_data_loader

    cfg, model, variables = trained_bundle
    for mode in ("ssc", "msf", "mscf", "uni", "unseen", "clip", "label_link"):
        loaders = get_data_loader(cfg, "eval")
        mious = eval_model(cfg, model, variables, loaders, mode=mode)
        assert len(mious) == 2, mode
        assert all(np.isfinite(m) and 0.0 <= m <= 1.0 for m in mious), (
            mode, mious,
        )


def test_find_unuse_audit(trained_bundle):
    from mds_tpu.data.loader import get_data_loader
    from mds_tpu.evaluation.drivers import (
        eval_find_use_and_unuse_label,
        find_unuse_label,
    )

    cfg, model, variables = trained_bundle
    loaders = get_data_loader(cfg, "eval")
    buckets = find_unuse_label(cfg, model, variables, loaders[0], 3, 0)
    assert set(buckets.keys()) == {0, 1, 2}
    M = variables["buffers"]["bi_graph_0"].shape[1]
    for slots in buckets.values():
        assert all(0 <= s < M for s in slots)
    loaders = get_data_loader(cfg, "eval")
    _, _, target = eval_find_use_and_unuse_label(cfg, model, variables, loaders)
    assert len(target) == 2
    assert target[0].shape == (3, M) and target[1].shape == (4, M)
    # entries are only ever {0, 1, ignore_index}
    for t in target:
        assert set(np.unique(t)).issubset({0.0, 1.0, 255.0})


def test_find_label_relation():
    from mds_tpu.evaluation.drivers import find_label_relation

    cfg = snp_configer()
    # dataset0's classes map into dataset1's space and vice versa
    remaps = [
        [None, [0, 1, 2]],       # ds0 → ds1
        [[2, 0, 1, 0], None],    # ds1 → ds0
    ]
    rels = find_label_relation(cfg, remaps)
    assert len(rels) == 1
    rel = rels[0]
    assert rel.shape == (7, 7)
    assert rel[0][3 + 0] and rel[1][3 + 1] and rel[2][3 + 2]
    assert rel[3 + 0][2] and rel[3 + 3][0]


def test_trainer_buffers_roundtrip(tmp_path):
    """Plain-Trainer checkpoints persist the buffers collection (r2 weak #1:
    the CheckpointManager saved only TrainState)."""
    from mds_tpu.engine.trainer import Trainer

    cfg = snp_configer(mode=None)
    cfg.update(["train", "mode"], None)
    t = Trainer(cfg, work_dir=str(tmp_path), compute_dtype=jnp.float32)
    assert t.buffers, "snp model must expose a buffers collection"
    marked = dict(t.buffers)
    marked["bi_graph_0"] = jnp.ones_like(marked["bi_graph_0"]) * 3.0
    t.buffers = marked
    t.ckpt.maybe_save(t.state, extras=t._ckpt_extras(), force=True)
    t.ckpt.wait()

    t2 = Trainer(cfg, work_dir=str(tmp_path), compute_dtype=jnp.float32)
    t2.restore_if_available()
    np.testing.assert_array_equal(
        np.asarray(t2.buffers["bi_graph_0"]),
        np.asarray(marked["bi_graph_0"]),
    )
    v = t2.variables()
    assert set(v) == {"params", "batch_stats", "buffers"}


def test_alternating_cli_resume(tmp_path):
    """Kill/restart semantics (VERDICT r2 next #2): total_iter, stage,
    alter_iter, β and uot graphs all resume."""
    from mds_tpu.engine.gnn_trainer import AlternatingTrainer

    cfg = snp_configer()
    t = AlternatingTrainer(cfg)
    rng = np.random.default_rng(0)
    for _ in range(3):  # 2 gnn → switch → 1 seg
        t.step(make_batch(rng))
    d = str(tmp_path / "ck")
    t.save(d)
    assert t.latest_step(d) == t.total_iter == 3

    t2 = AlternatingTrainer(cfg)
    t2.restore(d)
    assert t2.total_iter == 3
    assert t2.stage == t.stage
    assert t2.alter_iter == t.alter_iter
    for a, b in zip(t2.betas, t.betas):
        np.testing.assert_allclose(a, b)
    np.testing.assert_array_equal(
        np.asarray(t2.seg_buffers["bi_graph_0"]),
        np.asarray(t.seg_buffers["bi_graph_0"]),
    )
    # and stepping continues where it left off
    m = t2.step(make_batch(rng))
    assert np.isfinite(m["loss"])
    assert t2.total_iter == 4


def test_dsg_eval_reads_stage2_train_anns(tmp_path, monkeypatch):
    """dsg protocol = contrast eval over the STAGE-2 TRAIN ann lists
    (reference evaluate.py:1267 builds get_data_loader(aux_mode='train',
    stage=2)). Loader level: stage=2 + mode='eval' must read train_2.txt;
    driver level: run_evaluation(mode='dsg') must request stage=2."""
    import os
    import shutil

    from mds_tpu.data.loader import get_data_loader

    ref_im = "/root/reference/lib/test/test_leftImg8bit.png"
    ref_lb = "/root/reference/lib/test/test_labelIds.png"
    if not (os.path.exists(ref_im) and os.path.exists(ref_lb)):
        pytest.skip("reference fixtures absent")
    root = tmp_path / "ds"
    root.mkdir()
    shutil.copy(ref_im, root / "im.png")
    shutil.copy(ref_lb, root / "lb.png")
    (tmp_path / "train.txt").write_text("missing.png,missing.png\n")
    (tmp_path / "train_2.txt").write_text("im.png,lb.png\n")
    (tmp_path / "val.txt").write_text("missing.png,missing.png\n")

    cfg = Configer(configs={
        "model_name": "snp_rn18",
        "n_datasets": 1,
        "dataset1": {
            "n_cats": 19, "ims_per_gpu": 1, "data_reader": "CityScapes",
            "im_root": str(root),
            "train_im_anns": str(tmp_path / "train.txt"),
            "val_im_anns": str(tmp_path / "val.txt"),
        },
        "train": {"cropsize": [32, 32]},
    })
    loaders = get_data_loader(cfg, "eval", stage=2)
    batches = list(loaders[0])
    assert len(batches) == 1  # train_2.txt has exactly the fixture line
    im, lb = batches[0].im, batches[0].lb
    assert im.shape[-1] == 3 and lb.ndim >= 2

    # driver wiring: run_evaluation(mode='dsg') builds stage=2 loaders
    import mds_tpu.data.loader as loader_mod
    from mds_tpu.evaluation import drivers

    seen = {}
    real = loader_mod.get_data_loader

    def spy(configer, mode="train", **kw):
        seen["mode"] = mode
        seen["stage"] = kw.get("stage")
        return real(configer, mode, **kw)

    monkeypatch.setattr(loader_mod, "get_data_loader", spy)
    monkeypatch.setattr(
        drivers, "build_eval_bundle",
        lambda *a, **k: (None, None, {}),
    )
    monkeypatch.setattr(
        drivers, "eval_model",
        lambda *a, **k: [0.0],
    )
    drivers.run_evaluation(cfg, mode="dsg")
    assert seen == {"mode": "eval", "stage": 2}
    drivers.run_evaluation(cfg, mode="ss")
    assert seen == {"mode": "eval", "stage": None}
