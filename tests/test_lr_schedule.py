import numpy as np

from mds_tpu.engine.lr_schedule import (
    warmup_cosine_lr,
    warmup_exp_lr,
    warmup_poly_lr,
    warmup_step_lr,
)


def torch_ref_poly(step, lr, power, max_iter, warmup_iter, warmup_ratio, warmup):
    # mirrors lib/lr_scheduler.py get_lr_ratio semantics exactly
    if step < warmup_iter:
        alpha = step / warmup_iter
        if warmup == "exp":
            ratio = warmup_ratio ** (1.0 - alpha)
        else:
            ratio = warmup_ratio + (1 - warmup_ratio) * alpha
    else:
        real_iter = step - warmup_iter
        real_max_iter = max_iter - warmup_iter
        alpha = real_iter / real_max_iter
        ratio = (1 - alpha) ** power
    return lr * ratio


def test_poly_matches_reference_semantics():
    sched = warmup_poly_lr(5e-3, 0.9, 130000, warmup_iter=1000, warmup_ratio=0.1)
    for step in [0, 1, 500, 999, 1000, 2000, 65000, 129999]:
        want = torch_ref_poly(step, 5e-3, 0.9, 130000, 1000, 0.1, "exp")
        got = float(sched(step))
        # schedule math runs in float32 inside jit; compare at f32 tolerance
        assert abs(got - want) < 1e-5 * max(abs(want), 1e-3), (step, got, want)


def test_poly_linear_warmup():
    sched = warmup_poly_lr(1.0, 0.9, 100, warmup_iter=10, warmup_ratio=0.1, warmup="linear")
    assert abs(float(sched(0)) - 0.1) < 1e-6
    assert float(sched(5)) > 0.1
    # monotonic ramp then decay
    assert float(sched(9)) < 1.0


def test_exp_schedule():
    sched = warmup_exp_lr(1.0, gamma=0.5, interval=10, warmup_iter=0)
    assert abs(float(sched(0)) - 1.0) < 1e-6
    assert abs(float(sched(10)) - 0.5) < 1e-6
    assert abs(float(sched(25)) - 0.25) < 1e-6


def test_cosine_schedule():
    sched = warmup_cosine_lr(1.0, max_iter=100, warmup_iter=0)
    assert abs(float(sched(0)) - 1.0) < 1e-6
    assert abs(float(sched(50)) - 0.5) < 1e-6
    assert float(sched(100)) < 1e-6


def test_step_schedule():
    sched = warmup_step_lr(1.0, milestones=[10, 20], gamma=0.1, warmup_iter=0)
    assert abs(float(sched(5)) - 1.0) < 1e-6
    assert abs(float(sched(15)) - 0.1) < 1e-6
    assert abs(float(sched(25)) - 0.01) < 1e-8


def test_jit_compatible():
    import jax

    sched = warmup_poly_lr(5e-3, 0.9, 1000)
    f = jax.jit(sched)
    np.testing.assert_allclose(float(f(100)), float(sched(100)), rtol=1e-6)
