"""Lovász-Softmax loss.

Reference: lib/loss/lovasz_loss.py (lovasz_softmax :148-163, the flat variant
and lovasz_grad). Sorting per class is a jnp.sort/argsort over the flattened
valid pixels — O(P log P) on device, static shapes via ignore masking (sorted
errors of ignored pixels are forced to the tail with error 0 so the Jaccard
gradient weights them zero).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lovasz_grad(gt_sorted: jax.Array) -> jax.Array:
    """Gradient of the Lovász extension w.r.t sorted errors."""
    p = gt_sorted.shape[0]
    gts = jnp.sum(gt_sorted)
    intersection = gts - jnp.cumsum(gt_sorted, axis=0)
    union = gts + jnp.cumsum(1.0 - gt_sorted, axis=0)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
    if p > 1:
        jaccard = jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])
    return jaccard


def lovasz_softmax_flat(
    probas: jax.Array, labels: jax.Array, valid: jax.Array,
    classes: str = "present",
) -> jax.Array:
    """probas (P, C) softmax probabilities, labels (P,), valid (P,) bool."""
    C = probas.shape[1]
    losses = []
    present = []
    for c in range(C):
        fg = ((labels == c) & valid).astype(jnp.float32)
        err = jnp.abs(fg - probas[:, c])
        err = jnp.where(valid, err, 0.0)  # ignored pixels: zero error
        perm = jnp.argsort(-err)
        err_sorted = err[perm]
        fg_sorted = fg[perm]
        grad = lovasz_grad(fg_sorted)
        # grad is detached like the reference's Variable(grad) wrapper
        losses.append(jnp.dot(err_sorted, jax.lax.stop_gradient(grad)))
        present.append(jnp.sum(fg) > 0)
    losses = jnp.stack(losses)
    if classes == "present":
        pm = jnp.stack(present).astype(jnp.float32)
        return jnp.sum(losses * pm) / jnp.maximum(jnp.sum(pm), 1.0)
    return jnp.mean(losses)


def lovasz_softmax(
    logits: jax.Array, labels: jax.Array, ignore: int = 255,
    classes: str = "present",
) -> jax.Array:
    """NHWC logits → softmax → flat Lovász (reference lovasz_softmax)."""
    C = logits.shape[-1]
    probas = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).reshape(-1, C)
    labels = labels.astype(jnp.int32).reshape(-1)
    valid = labels != ignore
    labels = jnp.where(valid, labels, 0)
    return lovasz_softmax_flat(probas, labels, valid, classes)


def boundary_aware_focal_loss(
    logits: jax.Array, target: jax.Array, alphas: jax.Array,
    gamma: float = 0.5, ignore: int = 255,
) -> jax.Array:
    """BoundaryAwareFocalLoss (lib/loss/boundary_loss.py:8-45):
    loss = Σ α · e^{γ(1−p_t)} · (−log p_t) / #(α>0); α comes from a label
    distance transform (zero at ignore)."""
    logits = logits.astype(jnp.float32)
    target = target.astype(jnp.int32)
    valid = target != ignore
    safe = jnp.where(valid, target, 0)
    from mds_tpu.losses.ohem_ce import select_class

    logp = jax.nn.log_softmax(logits, axis=-1)
    logpt = select_class(logp, safe)
    pt = jax.lax.stop_gradient(jnp.exp(logpt))
    alphas = alphas.astype(jnp.float32)
    n = jnp.maximum(jnp.sum((alphas > 0).astype(jnp.float32)), 1.0)
    loss = -alphas * jnp.exp(gamma * (1.0 - pt)) * logpt
    return jnp.sum(loss) / n
