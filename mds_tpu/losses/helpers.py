"""Loss-helper zoo.

Reference: lib/loss/loss_helper.py — RecallCrossEntropy (:31-76), FocalLoss
(:78-180), NLLPlusLoss (:606-628), WeightedNLLPlusLoss (:630-645),
AdjNLLPlusLoss (:647-668), CircleLoss (:670-689), MultiLabelCrossEntropyLoss
(:691-740). All jnp/NHWC; per-pixel math in float32.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from mds_tpu.models.layers import resize_bilinear_ac
from mds_tpu.losses.ohem_ce import cross_entropy_per_pixel, select_class


def recall_cross_entropy(
    logits: jax.Array, target: jax.Array, n_classes: int, ignore: int = 255
) -> jax.Array:
    """CE reweighted by per-class false-negative rate (loss_helper.py:31-76).
    weight[c] = (#misclassified pixels of class c) / (#pixels of class c)."""
    logits = logits.astype(jnp.float32)
    target = target.astype(jnp.int32)
    pred = jnp.argmax(logits, axis=-1)
    valid = target != ignore
    tgt = jnp.where(valid, target, ignore).reshape(-1)
    wrong = (pred.reshape(-1) != tgt) & valid.reshape(-1)

    size = ignore + 1
    # reference initializes counters to ones then OVERWRITES counted classes
    # (loss_helper.py:45-64): count where present, 1 where absent
    gt_counts = jnp.zeros((size,), jnp.float32).at[tgt].add(
        valid.reshape(-1).astype(jnp.float32)
    )
    fn_counts = jnp.zeros((size,), jnp.float32).at[tgt].add(wrong.astype(jnp.float32))
    gt_counter = jnp.where(gt_counts > 0, gt_counts, 1.0)
    fn_counter = jnp.where(fn_counts > 0, fn_counts, 1.0)
    weight = fn_counter / gt_counter
    weight = weight.at[ignore].set(0.0)
    ce, _ = cross_entropy_per_pixel(logits, target, ignore)
    return jnp.mean(weight[tgt].reshape(target.shape) * ce)


def focal_loss(
    logits: jax.Array, target: jax.Array, gamma: float = 2.0,
    alpha: Optional[jax.Array] = None, ignore: int = 255,
    reduction: str = "mean",
) -> jax.Array:
    """FL(p) = −α (1−p)^γ log p (loss_helper.py:78-180)."""
    ce, valid = cross_entropy_per_pixel(logits, target, ignore)
    pt = jnp.exp(-ce)
    fl = ((1 - pt) ** gamma) * ce
    if alpha is not None:
        safe = jnp.where(valid, target, 0).astype(jnp.int32)
        fl = fl * alpha[safe]
    fl = jnp.where(valid, fl, 0.0)
    if reduction == "none":
        return fl
    if reduction == "sum":
        return jnp.sum(fl)
    return jnp.sum(fl) / jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)


def nll_plus_loss(
    logits: jax.Array, labels_k: Sequence[jax.Array], ignore: int = 255
) -> jax.Array:
    """Multi-positive NLL: sum softmax prob over the k admissible labels,
    −log of the (mean-reduced) total (loss_helper.py:606-628). logits NHWC,
    labels_k = list of (B,H,W) maps with ignore for absent alternatives."""
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    total = None
    for lb in labels_k:
        lb = lb.astype(jnp.int32)
        valid = lb != ignore
        safe = jnp.where(valid, lb, 0)
        picked = select_class(p, safe)
        val = jnp.sum(jnp.where(valid, picked, 0.0)) / jnp.maximum(
            jnp.sum(valid.astype(jnp.float32)), 1.0
        )
        total = val if total is None else total + val
    return -jnp.log(jnp.maximum(total, 1e-12))


def weighted_nll_plus_loss(logits: jax.Array, weighted_mask: jax.Array) -> jax.Array:
    """probs = Σ_c softmax(x)·mask; −log(mean) (loss_helper.py:630-645).
    weighted_mask (B,H,W,C)."""
    b, h, w, c = logits.shape
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    probs = jnp.einsum("bhwc,bhwc->bhw", p, weighted_mask.astype(jnp.float32))
    prob = jnp.sum(probs) / (b * h * w)
    return -jnp.log(jnp.maximum(prob, 1e-12))


def adj_nll_plus_loss(
    logits: jax.Array, adj: jax.Array, lb: jax.Array, ignore: int = 255
) -> jax.Array:
    """softmax → graph-weighted class probs → upsample → NLL at the label
    (loss_helper.py:647-668). Returns per-pixel losses over valid pixels
    (reduction='none' variant used by MdsOhemNLLPlusLoss)."""
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    probs = jnp.einsum("bhwc,nc->bhwn", p, adj.astype(jnp.float32))
    probs = resize_bilinear_ac(probs, (lb.shape[1], lb.shape[2]))
    nll = -jnp.log(jnp.maximum(probs, 1e-12))
    lb = lb.astype(jnp.int32)
    valid = lb != ignore
    safe = jnp.where(valid, lb, 0)
    loss = select_class(nll, safe)
    return jnp.where(valid, loss, 0.0), valid


def circle_loss(sp: jax.Array, sn: jax.Array, m: float, gamma: float) -> jax.Array:
    """CircleLoss (loss_helper.py:670-689)."""
    ap = jnp.maximum(-jax.lax.stop_gradient(sp) + 1 + m, 0.0)
    an = jnp.maximum(jax.lax.stop_gradient(sn) + m, 0.0)
    logit_p = -ap * (sp - (1 - m)) * gamma
    logit_n = an * (sn - m) * gamma
    return jax.nn.softplus(
        jax.nn.logsumexp(logit_n, axis=0) + jax.nn.logsumexp(logit_p, axis=0)
    )


def multi_label_cross_entropy(
    logits: jax.Array, multi_hot: jax.Array, m: float = 0.0, gamma: float = 1.0
) -> jax.Array:
    """Circle-style multi-label CE over (B,H,W,C) multi-hot targets
    (loss_helper.py:691-740): logsumexp over negatives + logsumexp over
    −positives, softplus."""
    x = logits.astype(jnp.float32).reshape(-1, logits.shape[-1])
    y = multi_hot.astype(jnp.float32).reshape(-1, logits.shape[-1])
    pos_mask = y > 0
    neg_mask = ~pos_mask
    inf = jnp.float32(1e12)
    logit_p = jnp.where(pos_mask, -x * gamma, -inf)
    logit_n = jnp.where(neg_mask, (x + m) * gamma, -inf)
    loss = jax.nn.softplus(
        jax.nn.logsumexp(logit_n, axis=-1) + jax.nn.logsumexp(logit_p, axis=-1)
    )
    return jnp.mean(loss)
