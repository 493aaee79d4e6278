"""End-to-end integration: train on synthetic data → eval mIoU improves.

The reference's integration testing is "short training runs + periodic eval"
(SURVEY.md §4); this is the CPU-runnable version over the full stack:
loader → augment → jitted train step → checkpointless eval via MscEvalV0.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mds_tpu.data.base import SyntheticDataset
from mds_tpu.data.loader import EvalLoader, MultiDatasetTrainLoader
from mds_tpu.data.transforms import TransformationTrain
from mds_tpu.engine.lr_schedule import warmup_poly_lr
from mds_tpu.engine.optim import sgd_param_groups
from mds_tpu.engine.train_step import init_train_state, make_seg_train_step
from mds_tpu.evaluation.evaluator import MscEvalV0
from mds_tpu.models.bisenetv2 import BiSeNetV2

HW = 32
N_CATS = 5


@pytest.mark.slow
def test_train_then_eval_miou_improves():
    model = BiSeNetV2(n_classes=(N_CATS,), n_bn=1)
    sched = warmup_poly_lr(5e-3, 0.9, 120, warmup_iter=5, warmup_ratio=0.1)
    tx = sgd_param_groups(sched, weight_decay=5e-4)
    state = init_train_state(model, tx, [np.zeros((1, HW, HW, 3), np.float32)])
    step = make_seg_train_step(
        model, tx, [np.zeros(3, np.float32)], [np.ones(3, np.float32)],
        compute_dtype=jnp.float32,
    )

    # big block structure (>=8px) so the 1/8-resolution head can fit it
    ds = SyntheticDataset(n_cats=N_CATS, size=(HW, HW), length=8, seed=3,
                          ignore_frac=0.0)
    t = TransformationTrain([1.0, 1.0], (HW, HW), min_side=None)
    ds_train = SyntheticDataset(n_cats=N_CATS, size=(HW, HW), length=8, seed=3,
                                ignore_frac=0.0, trans_func=t)
    loader = MultiDatasetTrainLoader([ds_train], [8], num_threads=2, prefetch=2)

    def logits_fn(im, dsid):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            im / 255.0, dataset=dsid, method=model.eval_logits,
        )

    ev = MscEvalV0(scales=(1.0,), flip=False)
    miou_before = ev(logits_fn, EvalLoader(ds), N_CATS, 0)

    key = jax.random.PRNGKey(0)
    try:
        for _ in range(120):
            b = next(loader)
            state, metrics = step(
                state, [jnp.asarray(b.ims[0])], [jnp.asarray(b.lbs[0])], key
            )
    finally:
        loader.close()
    assert np.isfinite(float(metrics["loss"]))

    ev2 = MscEvalV0(scales=(1.0,), flip=False)
    miou_after = ev2(logits_fn, EvalLoader(ds), N_CATS, 0)
    assert miou_after > miou_before + 0.1, (miou_before, miou_after)
    assert miou_after > 0.35, miou_after
