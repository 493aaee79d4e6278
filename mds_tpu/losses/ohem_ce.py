"""OHEM cross-entropy losses.

Reference: lib/loss/ohem_ce_loss.py — OhemCELoss (:13-34) and the
multi-dataset MdsOhemCELoss (:36-90) whose hard-pixel pool (and hence the
n_min floor) is global across the concatenated per-dataset losses.

Logits here are NHWC (…, n_classes); labels are integer maps with
ignore=255. Per-pixel CE is computed in float32 regardless of logit dtype.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from mds_tpu.ops.ohem import ohem_mean, ohem_mean_exact


def select_class(values: jax.Array, idx: jax.Array) -> jax.Array:
    """values (..., C), idx (...) int → values[..., idx] via an iota-compare
    masked sum (take_along_axis gathers are pathologically slow on TPU)."""
    c = values.shape[-1]
    iota = jax.lax.broadcasted_iota(
        jnp.int32, (1,) * (values.ndim - 1) + (c,), values.ndim - 1
    )
    mask = idx[..., None].astype(jnp.int32) == iota
    return jnp.sum(jnp.where(mask, values, 0.0), axis=-1)


def cross_entropy_per_pixel(
    logits: jax.Array, labels: jax.Array, ignore: int = 255
):
    """(per-pixel CE losses, valid mask). logits (…, C), labels (…,)."""
    logits = logits.astype(jnp.float32)
    valid = labels != ignore
    safe = jnp.where(valid, labels, 0).astype(jnp.int32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    true_logit = select_class(logits, safe)
    ce = logz - true_logit
    return jnp.where(valid, ce, 0.0), valid


class OhemCELoss:
    """CE with OHEM keep rule (reference: lib/loss/ohem_ce_loss.py:13-34)."""

    def __init__(self, thresh: float = 0.7, ignore_lb: int = 255,
                 n_min_ratio: int = 16, exact: bool = False):
        self.thresh = -math.log(thresh)
        self.ignore_lb = ignore_lb
        self.n_min_ratio = n_min_ratio
        self.exact = exact

    def __call__(self, logits: jax.Array, labels: jax.Array) -> jax.Array:
        ce, valid = cross_entropy_per_pixel(logits, labels, self.ignore_lb)
        fn = ohem_mean_exact if self.exact else ohem_mean
        return fn(ce, valid, self.thresh, self.n_min_ratio)


class MdsOhemCELoss:
    """Multi-dataset OHEM: per-dataset logits list, one global hard pool
    (reference: lib/loss/ohem_ce_loss.py:36-90)."""

    def __init__(self, thresh: float = 0.7, ignore_lb: int = 255,
                 n_min_ratio: int = 16, exact: bool = False):
        self.thresh = -math.log(thresh)
        self.ignore_lb = ignore_lb
        self.n_min_ratio = n_min_ratio
        self.exact = exact

    def __call__(
        self,
        logits_list: Sequence[Optional[jax.Array]],
        labels_list: Sequence[Optional[jax.Array]],
    ) -> jax.Array:
        losses: List[jax.Array] = []
        valids: List[jax.Array] = []
        for logits, labels in zip(logits_list, labels_list):
            if logits is None:
                continue
            ce, valid = cross_entropy_per_pixel(logits, labels, self.ignore_lb)
            losses.append(ce.reshape(-1))
            valids.append(valid.reshape(-1))
        all_losses = jnp.concatenate(losses)
        all_valid = jnp.concatenate(valids)
        fn = ohem_mean_exact if self.exact else ohem_mean
        return fn(all_losses, all_valid, self.thresh, self.n_min_ratio)


class MdsOhemNLLPlusLoss:
    """Bipartite-graph-aware multi-dataset OHEM
    (reference: lib/loss/ohem_ce_loss.py:92-146 — per-dataset AdjNLLPlus
    losses pooled into one global hard-pixel set)."""

    def __init__(self, thresh: float = 0.4, ignore_lb: int = 255,
                 n_min_ratio: int = 16, exact: bool = False):
        self.thresh = -math.log(thresh)
        self.ignore_lb = ignore_lb
        self.n_min_ratio = n_min_ratio
        self.exact = exact

    def __call__(self, logits_list, adjs, labels_list) -> jax.Array:
        from mds_tpu.losses.helpers import adj_nll_plus_loss

        losses, valids = [], []
        for logits, adj, labels in zip(logits_list, adjs, labels_list):
            if logits is None:
                continue
            nll, valid = adj_nll_plus_loss(logits, adj, labels, self.ignore_lb)
            losses.append(nll.reshape(-1))
            valids.append(valid.reshape(-1))
        all_losses = jnp.concatenate(losses)
        all_valid = jnp.concatenate(valids)
        fn = ohem_mean_exact if self.exact else ohem_mean
        return fn(all_losses, all_valid, self.thresh, self.n_min_ratio)
