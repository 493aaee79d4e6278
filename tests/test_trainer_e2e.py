"""End-to-end config-driven trainer smoke test on the synthetic config."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from mds_tpu.config import Configer
from mds_tpu.engine.trainer import Trainer

CFG = os.path.join(os.path.dirname(__file__), "..", "configs", "test_synthetic.json")


@pytest.mark.slow
def test_trainer_runs_from_config(tmp_path):
    configer = Configer(config_file=CFG)
    t = Trainer(configer, work_dir=str(tmp_path), compute_dtype=jnp.float32)
    state = t.train(log_interval=2)
    assert int(state.step) == 6
    # checkpoint written at end
    assert t.ckpt.latest_step() == 6
    # restore round-trips
    t2 = Trainer(configer, work_dir=str(tmp_path), compute_dtype=jnp.float32)
    t2.restore_if_available()
    assert int(t2.state.step) == 6
    a = np.asarray(
        t.state.params["detail"]["S1_1"]["conv"]["kernel"]
    )
    b = np.asarray(t2.state.params["detail"]["S1_1"]["conv"]["kernel"])
    np.testing.assert_allclose(a, b)


def test_ema_and_precise_bn_utils():
    from mds_tpu.engine.ema import ema_update

    t = {"w": jnp.ones(3)}
    s = {"w": jnp.zeros(3)}
    out = ema_update(t, s, momentum=0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.9)
