"""Pixel-contrast loss with memory bank — TPU-native (static-shape) redesign.

Reference: lib/loss/loss_contrast_mem.py — `PixelContrastLoss` with
`_hard_anchor_sampling` (:28-93: per class present in the batch, up to n_view
anchors split half hard (mispredicted) / half easy), `_contrastive`
(:115-160: InfoNCE over anchors vs class-queue negatives, temperature /
base_temperature), and lib/module/memory_bank_helper.py:memory_bank_push
(per-class circular pixel queues).

The torch version's sampling is dynamically shaped (per-batch class lists,
data-dependent n_view). Here every shape is static for jit:
  * anchors: a fixed (n_classes, n_view, D) tensor — per class, n_view pixels
    chosen by randomized top-k over a hard-first score (hard pixels get +1),
    with a per-class validity flag when the batch lacks max_views pixels;
  * the memory is a (n_classes, memory_size, D) circular buffer updated
    functionally (enqueue one feature per class per call, like the
    reference's per-image pixel queue push).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


def hard_anchor_sample(
    feats: jax.Array,  # (P, D) flattened pixel features
    labels: jax.Array,  # (P,)
    preds: jax.Array,  # (P,)
    n_classes: int,
    n_view: int,
    rng: jax.Array,
    max_views: int = 2,
    ignore: int = 255,
) -> Tuple[jax.Array, jax.Array]:
    """→ anchors (n_classes, n_view, D), valid (n_classes,) bool."""
    P, D = feats.shape
    labels = labels.astype(jnp.int32)
    anchors = []
    valid = []
    keys = jax.random.split(rng, n_classes)
    for c in range(n_classes):
        mask = (labels == c)
        count = jnp.sum(mask.astype(jnp.int32))
        hard = mask & (preds != c)
        # hard-first randomized ranking: hard pixels get +1 over easy
        score = jax.random.uniform(keys[c], (P,)) + hard.astype(jnp.float32)
        score = jnp.where(mask, score, -jnp.inf)
        _, idx = jax.lax.top_k(score, n_view)
        anchors.append(feats[idx])
        valid.append(count > max_views)
    return jnp.stack(anchors), jnp.stack(valid)


def contrastive_loss(
    anchors: jax.Array,  # (C, V, D) L2-normalized
    valid: jax.Array,  # (C,)
    memory: jax.Array,  # (C, M, D) L2-normalized class queues
    temperature: float = 0.07,
    base_temperature: float = 0.07,
) -> jax.Array:
    """InfoNCE: positives = same-class queue entries, negatives = all others
    (loss_contrast_mem.py:115-160)."""
    C, V, D = anchors.shape
    M = memory.shape[1]
    flat_mem = memory.reshape(C * M, D)
    logits = jnp.einsum("cvd,nd->cvn", anchors, flat_mem) / temperature
    logits = logits - jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    mem_cls = jnp.repeat(jnp.arange(C), M)  # (C*M,)
    pos_mask = (mem_cls[None, None, :] == jnp.arange(C)[:, None, None]).astype(
        jnp.float32
    )
    exp_logits = jnp.exp(logits)
    log_prob = logits - jnp.log(jnp.sum(exp_logits, axis=-1, keepdims=True) + 1e-12)
    mean_log_prob_pos = jnp.sum(pos_mask * log_prob, axis=-1) / jnp.maximum(
        jnp.sum(pos_mask, axis=-1), 1.0
    )
    loss = -(temperature / base_temperature) * mean_log_prob_pos  # (C, V)
    w = valid.astype(jnp.float32)[:, None]
    return jnp.sum(loss * w) / jnp.maximum(jnp.sum(w) * V, 1.0)


class MemoryBank(NamedTuple):
    """Per-class circular feature queues (memory_bank_helper.py).
    `count` tracks how many REAL features each class queue holds (saturates
    at M) — the memory_bank_init role of the reference, letting consumers
    mask out the placeholder init slots."""

    feats: jax.Array  # (C, M, D)
    ptr: jax.Array  # (C,) int32
    count: jax.Array  # (C,) int32, ≤ M

    @staticmethod
    def create(n_classes: int, memory_size: int, dim: int) -> "MemoryBank":
        f = jnp.zeros((n_classes, memory_size, dim), jnp.float32)
        # unit-norm random init so early negatives are well-conditioned
        f = f.at[:, :, 0].set(1.0)
        return MemoryBank(
            feats=f,
            ptr=jnp.zeros(n_classes, jnp.int32),
            count=jnp.zeros(n_classes, jnp.int32),
        )


def memory_bank_push(
    bank: MemoryBank,
    feats: jax.Array,  # (P, D)
    labels: jax.Array,  # (P,)
    rng: jax.Array,
    ignore: int = 255,
) -> MemoryBank:
    """Enqueue the per-class mean feature of this batch into each class queue
    (the reference pushes segment-mean + random pixel features per image;
    memory_bank_helper.py memory_bank_push)."""
    C, M, D = bank.feats.shape
    labels = labels.astype(jnp.int32)
    onehot = jax.nn.one_hot(jnp.where(labels == ignore, C, labels), C + 1)[:, :C]
    counts = jnp.sum(onehot, axis=0)  # (C,)
    sums = onehot.T @ feats  # (C, D)
    means = sums / jnp.maximum(counts[:, None], 1.0)
    means = means / jnp.maximum(jnp.linalg.norm(means, axis=-1, keepdims=True), 1e-12)
    present = counts > 0
    new_feats = bank.feats.at[jnp.arange(C), bank.ptr].set(
        jnp.where(present[:, None], means, bank.feats[jnp.arange(C), bank.ptr])
    )
    new_ptr = jnp.where(present, (bank.ptr + 1) % M, bank.ptr)
    new_count = jnp.where(
        present, jnp.minimum(bank.count + 1, M), bank.count
    )
    return MemoryBank(feats=new_feats, ptr=new_ptr, count=new_count)


class PixelContrastLoss:
    """Drop-in equivalent of the reference PixelContrastLoss (config keys
    contrast.temperature/base_temperature/max_samples/max_views)."""

    def __init__(self, configer=None, temperature=0.07, base_temperature=0.07,
                 max_views=2, n_view=16, ignore=255):
        if configer is not None:
            g = lambda *k, d=None: configer.get(*k, default=d)
            temperature = float(g("contrast", "temperature", d=temperature))
            base_temperature = float(
                g("contrast", "base_temperature", d=base_temperature)
            )
            max_views = int(g("contrast", "max_views", d=max_views))
            ignore = int(g("loss", "ignore_index", d=ignore))
        self.temperature = temperature
        self.base_temperature = base_temperature
        self.max_views = max_views
        self.n_view = n_view
        self.ignore = ignore

    def __call__(self, feats, labels, preds, bank: MemoryBank, rng) -> jax.Array:
        """feats (B,h,w,D); labels/preds (B,h,w) at feature resolution."""
        B, h, w, D = feats.shape
        flat = feats.reshape(-1, D)
        flat = flat / jnp.maximum(jnp.linalg.norm(flat, axis=-1, keepdims=True), 1e-12)
        anchors, valid = hard_anchor_sample(
            flat, labels.reshape(-1), preds.reshape(-1),
            bank.feats.shape[0], self.n_view, rng,
            max_views=self.max_views, ignore=self.ignore,
        )
        return contrastive_loss(
            anchors, valid, bank.feats, self.temperature, self.base_temperature
        )
