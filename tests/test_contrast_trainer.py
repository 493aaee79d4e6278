"""End-to-end contrast training stage (reference
tools/train_amp_contrast_single.py): memory-bank enqueue each step, EMA
teacher, contrast warmup gate, checkpoint round-trip."""

import jax.numpy as jnp
import numpy as np
import pytest

from mds_tpu.config import Configer
from mds_tpu.engine.contrast_trainer import ContrastTrainer

HW = 64


def tiny_configer(use_ema=True):
    return Configer(configs={
        "model_name": "bisenetv2_contrast",
        "n_datasets": 2,
        "n_bn": 2,
        "num_unify_classes": 6,
        "use_ema": use_ema,
        "dataset1": {"n_cats": 3, "ims_per_gpu": 1},
        "dataset2": {"n_cats": 4, "ims_per_gpu": 1},
        "class_remap1": {"0": [0], "1": [1, 5], "2": [2]},
        "class_remap2": {"0": [0], "1": [3], "2": [4], "3": [5]},
        "loss": {"ohem_thresh": 0.7, "ignore_index": 255},
        "contrast": {
            "proj_dim": 16, "temperature": 0.07, "base_temperature": 0.07,
            "max_views": 2, "loss_weight": 0.1, "memory_bank_size": 4,
            "ema_momentum": 0.9,
        },
        "lr": {"lr_start": 1e-2, "max_iter": 10, "warmup_iters": 2},
        "train": {"mode": "contrast", "cropsize": [HW, HW]},
    })


def make_batch(rng, cats=(3, 4), hw=HW):
    ims, lbs = [], []
    for c in cats:
        ims.append(rng.integers(0, 256, (1, hw, hw, 3)).astype(np.uint8))
        lbs.append(rng.integers(0, c, (1, hw, hw)).astype(np.uint8))
    return {"ims": ims, "lbs": lbs}


@pytest.mark.slow
def test_contrast_trainer_e2e(tmp_path):
    t = ContrastTrainer(tiny_configer(), work_dir=str(tmp_path))
    rng = np.random.default_rng(0)
    ptr0 = np.asarray(t.bank.ptr).copy()
    teacher_leaf0 = np.asarray(
        t.teacher["params"]["head"]["conv_out"]["kernel"]
    ).copy()
    losses, contrast_losses = [], []
    for i in range(5):
        m = t.step(make_batch(rng))
        losses.append(m["loss"])
        contrast_losses.append(m["contrast_loss"])
        assert np.isfinite(m["loss"]), m
    # warmup gate: first 2 steps exclude the contrast term from the total
    assert abs(losses[0] - (losses[0] - 0.0)) < 1e9  # smoke
    # bank occupancy advanced (labels cover all classes across steps)
    assert (np.asarray(t.bank.ptr) != ptr0).any()
    # teacher moved off its init copy (EMA tracks the student)
    teacher_leaf = np.asarray(t.teacher["params"]["head"]["conv_out"]["kernel"])
    assert not np.allclose(teacher_leaf, teacher_leaf0)
    # training reduces the seg loss on repeated data
    fixed = make_batch(np.random.default_rng(1))
    before = t.step(fixed)["seg_loss"]
    for _ in range(6):
        after = t.step(fixed)["seg_loss"]
    assert after < before, (before, after)

    # checkpoint round-trip restores bank + teacher + params
    t.save()
    t2 = ContrastTrainer(tiny_configer(), work_dir=str(tmp_path))
    t2.restore()
    np.testing.assert_allclose(
        np.asarray(t2.bank.ptr), np.asarray(t.bank.ptr)
    )
    np.testing.assert_allclose(
        np.asarray(t2.teacher["params"]["head"]["conv_out"]["kernel"]),
        np.asarray(t.teacher["params"]["head"]["conv_out"]["kernel"]),
    )
    m = t2.step(make_batch(rng))
    assert np.isfinite(m["loss"])


def test_contrast_warmup_gate(tmp_path):
    """contrast weight is 0 before lr.warmup_iters, loss_weight after."""
    cfg = tiny_configer(use_ema=False)
    cfg.update(["train", "cropsize"], [32, 32])  # smallest /32-safe crop
    t = ContrastTrainer(cfg, work_dir=str(tmp_path))
    rng = np.random.default_rng(2)
    b = make_batch(rng, hw=32)
    m0 = t.step(b, it=0)
    assert abs(m0["loss"] - m0["seg_loss"]) < 1e-4  # gated off
    m1 = t.step(b, it=5)
    assert m1["loss"] != m1["seg_loss"] or m1["contrast_loss"] == 0.0


@pytest.mark.slow
def test_contrast_trainer_num_prototype_path(tmp_path):
    """num_prototype>1: per-pixel sinkhorn prototype assignment drives the
    contrast term (lib/loss/loss_cross_datasets.py:135-193 path) — the
    prototype slots update by momentum, the multi-hot seg loss takes over
    after warmup, and prototypes ride the checkpoint."""
    cfg = tiny_configer(use_ema=False)
    cfg.update(["contrast", "num_prototype"], 3)
    cfg.update(["contrast", "coefficient"], 0.9)
    cfg.update(["network", "stride"], 8)
    cfg.update(["train", "cropsize"], [32, 32])
    t = ContrastTrainer(cfg, work_dir=str(tmp_path))
    assert t.P == 3 and t.prototypes is not None
    assert t.prototypes.shape == (6, 3, 16)
    protos0 = np.asarray(t.prototypes).copy()
    rng = np.random.default_rng(3)
    b = make_batch(rng, hw=32)
    m_warm = t.step(b, it=0)  # warmup: contrast gated off
    assert np.isfinite(m_warm["loss"])
    m = t.step(b, it=5)  # past warmup: sinkhorn-assigned contrast active
    assert np.isfinite(m["loss"]) and np.isfinite(m["contrast_loss"])
    assert m["contrast_loss"] != 0.0
    assert "seg_mul_loss" in m and np.isfinite(m["seg_mul_loss"])
    # momentum update moved slots that received mass
    protos1 = np.asarray(t.prototypes)
    assert not np.allclose(protos1, protos0)
    # updated slots stay (approximately) unit-mixed: norms bounded
    norms = np.linalg.norm(protos1, axis=-1)
    assert np.all(norms < 1.5)

    # prototypes round-trip through the checkpoint
    t.save()
    cfg2 = tiny_configer(use_ema=False)
    cfg2.update(["contrast", "num_prototype"], 3)
    cfg2.update(["contrast", "coefficient"], 0.9)
    cfg2.update(["network", "stride"], 8)
    cfg2.update(["train", "cropsize"], [32, 32])
    t2 = ContrastTrainer(cfg2, work_dir=str(tmp_path))
    t2.restore()
    np.testing.assert_allclose(np.asarray(t2.prototypes), protos1)
