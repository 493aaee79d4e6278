import json
import os

import jax.numpy as jnp
import numpy as np

from mds_tpu.utils.meters import AvgMeter, TimeMeter
from mds_tpu.utils.metrics_writer import MetricsWriter, read_metrics
from mds_tpu.utils.profiling import StepTimer
from mds_tpu.engine.precise_bn import update_bn_stats


def test_metrics_writer_roundtrip(tmp_path):
    w = MetricsWriter(str(tmp_path), tensorboard=False)
    w.write(1, {"seg": 0.5, "lr": 1e-3}, group="loss")
    w.write(2, {"seg": 0.4}, group="loss")
    w.close()
    recs = read_metrics(str(tmp_path))
    assert len(recs) == 2
    assert recs[0]["seg"] == 0.5 and recs[1]["step"] == 2


def test_meters():
    tm = TimeMeter(10)
    tm.update()
    interval, eta = tm.get()
    assert interval >= 0 and isinstance(eta, str)
    am = AvgMeter()
    am.update(1.0)
    am.update(3.0)
    avg, gavg = am.get()
    assert avg == 2.0


def test_step_timer():
    t = StepTimer()
    t.start()
    dt = t.stop(jnp.ones(4))
    assert dt >= 0 and t.mean >= 0


def test_precise_bn_recovers_true_moments():
    """Feeding the same batch repeatedly must converge running stats to that
    batch's exact moments (reference lib/precise_bn.py behavior)."""
    rng = np.random.default_rng(0)
    data = rng.normal(3.0, 2.0, (64, 4)).astype(np.float32)
    true_mean = data.mean(0)
    true_var = data.var(0) * (64 / 63)

    variables = {"batch_stats": {"mean": jnp.zeros(4), "var": jnp.ones(4)}}

    def apply_train_fn(v, batch):
        # emulate one BN train step: new = 0.9*old + 0.1*batch_moments
        m = jnp.asarray(batch.mean(0))
        var = jnp.asarray(batch.var(0) * (64 / 63))
        return {
            "mean": 0.9 * v["batch_stats"]["mean"] + 0.1 * m,
            "var": 0.9 * v["batch_stats"]["var"] + 0.1 * var,
        }

    out = update_bn_stats(apply_train_fn, variables, [data] * 5)
    np.testing.assert_allclose(np.asarray(out["batch_stats"]["mean"]), true_mean,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["batch_stats"]["var"]), true_var,
                               atol=1e-3)
