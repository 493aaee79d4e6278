"""Precise-BN: recompute BN running statistics from data.

Reference: lib/precise_bn.py:88 `update_bn_stats` — set BN momentum to 1/i
running-average and forward N batches, so running stats become the true
moments of the data rather than an EMA (ablated in CamVidPreciseBN.md).

Here: run the model's train-mode forward over N batches collecting the fresh
per-batch moments from the mutated `batch_stats`, and average them exactly
(arithmetic mean of batch means; mean of batch vars — the reference's
running-average-with-momentum-1/i scheme)."""

from __future__ import annotations

from typing import Callable, Iterable

import jax
import jax.numpy as jnp


def update_bn_stats(apply_train_fn: Callable, variables: dict,
                    batches: Iterable, max_batches: int = 200) -> dict:
    """apply_train_fn(variables, batch) must return the mutated batch_stats
    tree of one train-mode forward (moments of that batch folded with
    momentum 1.0, i.e. raw batch moments — pass momentum-1 BN or derive:
    here we extract batch moments as (new - (1-m)*old)/m with m known)."""
    count = 0
    acc = None
    for batch in batches:
        if count >= max_batches:
            break
        new_stats = apply_train_fn(variables, batch)
        if acc is None:
            acc = jax.tree_util.tree_map(jnp.zeros_like, new_stats)
        # recover raw batch moments from the EMA update with momentum 0.1:
        # new = 0.9*old + 0.1*batch  →  batch = (new - 0.9*old)/0.1
        old_stats = variables["batch_stats"]
        batch_moments = jax.tree_util.tree_map(
            lambda new, old: (new - 0.9 * old) / 0.1, new_stats, old_stats
        )
        acc = jax.tree_util.tree_map(lambda a, b: a + b, acc, batch_moments)
        count += 1
    if count == 0:
        return variables
    mean_stats = jax.tree_util.tree_map(lambda a: a / count, acc)
    out = dict(variables)
    out["batch_stats"] = mean_stats
    return out
