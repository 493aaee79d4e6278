"""Precise-BN end-to-end (VERDICT r3 next #5).

Reference workflow: train_bn.py + lib/precise_bn.py:88 update_bn_stats —
recompute BN running stats over train batches with frozen weights before
eval (the CamVidPreciseBN.md ablation). Here: deliberately skew a trained
model's BN stats (mIoU collapses), run `recompute_bn_stats`, and assert the
mIoU recovers; plus CLI flag threading for `tools/evaluate.py --precise-bn`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mds_tpu.config import Configer


def synth_configer():
    return Configer(config_file="configs/test_synthetic.json")


@pytest.mark.slow
def test_precise_bn_recovers_skewed_stats(tmp_path):
    from mds_tpu.data.loader import get_data_loader
    from mds_tpu.engine.trainer import Trainer
    from mds_tpu.evaluation.drivers import recompute_bn_stats
    from mds_tpu.evaluation.evaluator import eval_model

    # the integration-test recipe (test_integration_miou): 120 iters on
    # big-block 32×32 synthetic data gets real spatial predictions — with
    # a barely-trained net the argmax collapses to the head bias and BN
    # corruption can't change the mIoU
    cfg = synth_configer()
    cfg.update(["lr", "max_iter"], 120)
    cfg.update(["lr", "warmup_iters"], 5)
    cfg.update(["train", "scales"], [1.0, 1.0])
    cfg.update(["train", "cropsize"], [32, 32])
    for i in (1, 2):
        cfg.update([f"dataset{i}", "reader_kwargs", "size"], [32, 32])
        cfg.update([f"dataset{i}", "reader_kwargs", "ignore_frac"], 0.0)
    t = Trainer(cfg, work_dir=str(tmp_path), compute_dtype=jnp.float32)
    t.train()
    variables = t.variables()

    def miou(v):
        loaders = get_data_loader(cfg, "eval")
        return eval_model(cfg, t.model, v, loaders, mode="ss")

    good = miou(variables)

    # skew every BN running stat with per-channel random corruption (a
    # crashed/mis-merged checkpoint shape) — a uniform scale/shift would be
    # largely renormalized away by the downstream BN chain
    corrupt_rng = np.random.default_rng(7)

    def corrupt(stats):
        # scale-aware: shift each mean by a few of its own sigmas and blow
        # up the variance, so normalized activations lose their signal —
        # a uniform shift would be renormalized away by later BN layers
        out = {}
        for k, v in stats.items():
            if isinstance(v, dict):
                if set(v) >= {"mean", "var"}:
                    var = np.asarray(v["var"])
                    mean = np.asarray(v["mean"])
                    sig = np.sqrt(np.maximum(var, 1e-6))
                    out[k] = {
                        "mean": jnp.asarray(
                            mean + corrupt_rng.normal(0, 4.0, mean.shape)
                            * sig),
                        "var": jnp.asarray(
                            var * corrupt_rng.uniform(25.0, 400.0, var.shape)),
                    }
                else:
                    out[k] = corrupt(v)
            else:
                out[k] = v
        return out

    skewed = dict(variables)
    skewed["batch_stats"] = corrupt(variables["batch_stats"])
    bad = miou(skewed)

    fixed_vars = recompute_bn_stats(
        cfg, t.model, skewed, n_batches=6, compute_dtype=jnp.float32
    )
    fixed = miou(fixed_vars)

    assert sum(bad) < sum(good), (bad, good)
    assert sum(fixed) > sum(bad), (fixed, bad)
    # recomputed stats land close to the healthy ones
    assert sum(fixed) > 0.8 * sum(good), (fixed, good)


def test_evaluate_cli_threads_precise_bn(monkeypatch, tmp_path):
    import sys

    sys.path.insert(0, "tools")
    import importlib

    evaluate_cli = importlib.import_module("evaluate")

    seen = {}

    def fake_run_evaluation(configer, mode="ss", ckpt=None, work_dir="./res",
                            precise_bn=0, **kw):
        seen["precise_bn"] = precise_bn
        seen["mode"] = mode
        return [0.5]

    import mds_tpu.evaluation.drivers as drivers

    monkeypatch.setattr(drivers, "run_evaluation", fake_run_evaluation)
    monkeypatch.setattr(
        sys, "argv",
        ["evaluate.py", "--config", "configs/test_synthetic.json",
         "--precise-bn", "7"],
    )
    evaluate_cli.main()
    assert seen == {"precise_bn": 7, "mode": "ss"}
