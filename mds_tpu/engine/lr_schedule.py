"""LR schedules as pure functions of the step — jit/optax compatible.

Reference semantics: lib/lr_scheduler.py WarmupPolyLrScheduler (:49-70),
WarmupExpLrScheduler (:73-90), WarmupCosineLrScheduler (:93-120),
WarmupStepLrScheduler; warmup ratio ramp `get_warmup_ratio` (:38-46) with
'linear' and 'exp' modes. Each builder returns `f(step) -> lr multiplier×base`.
All math is jnp so the schedule can live inside a jitted train step.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp


def _warmup_ratio(step, warmup_iter: int, warmup_ratio: float, warmup: str):
    alpha = step / jnp.maximum(warmup_iter, 1)
    if warmup == "linear":
        return warmup_ratio + (1.0 - warmup_ratio) * alpha
    if warmup == "exp":
        return warmup_ratio ** (1.0 - alpha)
    raise ValueError(f"unknown warmup mode {warmup}")


def warmup_poly_lr(
    lr_start: float,
    power: float,
    max_iter: int,
    warmup_iter: int = 500,
    warmup_ratio: float = 5e-4,
    warmup: str = "exp",
) -> Callable:
    """WarmupPolyLrScheduler (reference: lib/lr_scheduler.py:49-70)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        wr = _warmup_ratio(step, warmup_iter, warmup_ratio, warmup)
        real_iter = step - warmup_iter
        real_max = max(max_iter - warmup_iter, 1)
        alpha = real_iter / real_max
        main = jnp.maximum(1.0 - alpha, 0.0) ** power
        ratio = jnp.where(step < warmup_iter, wr, main)
        return lr_start * ratio

    return schedule


def warmup_exp_lr(
    lr_start: float,
    gamma: float,
    interval: int = 1,
    warmup_iter: int = 500,
    warmup_ratio: float = 5e-4,
    warmup: str = "exp",
) -> Callable:
    """WarmupExpLrScheduler (reference: lib/lr_scheduler.py:73-90)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        wr = _warmup_ratio(step, warmup_iter, warmup_ratio, warmup)
        real_iter = step - warmup_iter
        main = gamma ** jnp.floor(real_iter / interval)
        ratio = jnp.where(step < warmup_iter, wr, main)
        return lr_start * ratio

    return schedule


def warmup_cosine_lr(
    lr_start: float,
    max_iter: int,
    eta_ratio: float = 0.0,
    warmup_iter: int = 500,
    warmup_ratio: float = 5e-4,
    warmup: str = "exp",
) -> Callable:
    """WarmupCosineLrScheduler (reference: lib/lr_scheduler.py:93-120)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        wr = _warmup_ratio(step, warmup_iter, warmup_ratio, warmup)
        real_iter = step - warmup_iter
        real_max = max(max_iter - warmup_iter, 1)
        main = eta_ratio + (1.0 - eta_ratio) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * real_iter / real_max)
        )
        ratio = jnp.where(step < warmup_iter, wr, main)
        return lr_start * ratio

    return schedule


def warmup_step_lr(
    lr_start: float,
    milestones: Sequence[int],
    gamma: float = 0.1,
    warmup_iter: int = 500,
    warmup_ratio: float = 5e-4,
    warmup: str = "exp",
) -> Callable:
    """WarmupStepLrScheduler (reference: lib/lr_scheduler.py:123+)."""
    ms = jnp.asarray(sorted(milestones), jnp.float32)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        wr = _warmup_ratio(step, warmup_iter, warmup_ratio, warmup)
        real_iter = step - warmup_iter
        n_passed = jnp.sum(ms <= real_iter)
        main = gamma ** n_passed
        ratio = jnp.where(step < warmup_iter, wr, main)
        return lr_start * ratio

    return schedule
