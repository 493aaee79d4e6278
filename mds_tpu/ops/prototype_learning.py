"""Per-pixel sinkhorn prototype assignment (ProtoSeg-style).

Reference: /root/reference/lib/prototype_learning.py:11-77 and
lib/sinkhorn.py:5-28 (`distributed_sinkhorn`). Used by the contrast-era
CrossDatasetsLoss (lib/loss/loss_cross_datasets.py:135) when the model
carries `num_prototype` (P) slots per unified class: each pixel embedding is
balanced-assigned to one of its ground-truth class's P prototype slots via a
tiny Sinkhorn, correctly-predicted pixels update the slots by momentum, and
the per-pixel slot index becomes the contrast target
(`proto_target = index + P*class`).

TPU-native design — the reference loops over classes with boolean indexing
(dynamic shapes, one (n_k, P) solve per class, prototype_learning.py:32-63).
Classes partition pixels, so every per-class Sinkhorn normalisation is either
a per-row op or a per-(class, slot) sum: we solve ALL classes at once on the
dense (N, P) score matrix with `jax.ops.segment_sum` keyed by the pixel's
class id. No dynamic shapes, no host loop, one fused pass under jit.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


def grouped_sinkhorn(
    scores: jax.Array,  # (N, P) per-pixel scores against OWN-class slots
    seg_ids: jax.Array,  # (N,) int class id per pixel (rows grouped by this)
    num_classes: int,
    valid: jax.Array,  # (N,) bool — rows taking part (gt < K etc.)
    n_iters: int = 3,
    epsilon: float = 0.05,
) -> tuple:
    """The reference's `distributed_sinkhorn` (lib/sinkhorn.py:5-28) run
    independently for every class k on its own pixel rows, vectorized.

    Per class: L = exp(s/eps).T (P, n_k); L /= ΣL; then `n_iters` rounds of
    row-normalize (/Σ_row, /P) and column-normalize (/Σ_col, /n_k); finally
    L *= n_k. Returns (q (N, P) transport plan rows, idx (N,) argmax slot).
    Invalid rows return q=0, idx=0.
    """
    N, P = scores.shape
    f32 = jnp.float32
    seg = jnp.where(valid, seg_ids, num_classes).astype(jnp.int32)
    K1 = num_classes + 1  # spare bucket swallows invalid rows

    s = scores.astype(f32) / epsilon
    # per-class max shift before exp: cancels exactly in the global
    # per-class normalisation below (the reference skips it and can overflow
    # for non-cosine scores; for cosine scores both are bit-comparable)
    smax = jax.ops.segment_max(
        jnp.max(jnp.where(valid[:, None], s, -jnp.inf), axis=1),
        seg, num_segments=num_classes + 1,
    )
    s = s - jnp.where(jnp.isfinite(smax), smax, 0.0)[seg][:, None]
    L = jnp.exp(s) * valid[:, None]

    def _per_class_sum(mat):  # (N, P) -> (K1, P) sums over each class's rows
        return jax.ops.segment_sum(mat, seg, num_segments=K1)

    # per-class pixel counts n_k (the reference's B)
    cnt = jax.ops.segment_sum(valid.astype(f32), seg, num_segments=K1)

    # global per-class normalisation: L /= sum(L) over the class block
    tot = _per_class_sum(L).sum(axis=1)  # (K1,)
    L = L / jnp.maximum(tot, 1e-30)[seg][:, None]

    def body(L, _):
        # row = prototype slot: each (k, p) row sums to 1, then /P
        row = _per_class_sum(L)  # (K1, P)
        L = L / jnp.maximum(row[seg], 1e-30) / P
        # col = pixel: each pixel column sums to 1, then /n_k
        col = L.sum(axis=1, keepdims=True)  # (N, 1)
        L = L / jnp.maximum(col, 1e-30)
        L = L / jnp.maximum(cnt, 1.0)[seg][:, None]
        return L, None

    L, _ = jax.lax.scan(body, L, None, length=n_iters)
    L = L * cnt[seg][:, None] * valid[:, None]
    idx = jnp.argmax(L, axis=1).astype(jnp.int32)
    return L, idx


def hard_assignment(
    q: jax.Array,
    rng: Optional[jax.Array] = None,
    tau: float = 0.5,
) -> jax.Array:
    """The reference's final `F.gumbel_softmax(L, tau=0.5, hard=True)`
    (lib/sinkhorn.py:26). With rng=None, deterministic hard argmax one-hot
    (the zero-noise limit — used by tests and by callers that want
    reproducible assignment)."""
    if rng is not None:
        g = -jnp.log(-jnp.log(
            jax.random.uniform(rng, q.shape, jnp.float32, 1e-20, 1.0)
        ) + 1e-20)
        q = (q + g) / tau
    idx = jnp.argmax(q, axis=1)
    return jax.nn.one_hot(idx, q.shape[1], dtype=jnp.float32)


class ProtoLearnResult(NamedTuple):
    proto_logits: jax.Array  # (N, K*P) embedding · all prototype slots
    proto_target: jax.Array  # (N,) assigned slot index (+P*class), else gt
    prototypes: jax.Array  # (K, P, D) momentum-updated slots


def prototype_learning(
    prototypes: jax.Array,  # (K, P, D) unit-norm slots
    emb: jax.Array,  # (N, D) pixel embeddings (network-stride grid, L2-norm)
    gt_seg: jax.Array,  # (N,) unified-class id per pixel (>=K → ignored)
    correct: jax.Array,  # (N,) bool — seg head predicted this pixel right
    update_prototype: bool = True,
    coefficient: float = 0.999,
    rng: Optional[jax.Array] = None,
    sinkhorn_iters: int = 3,
    epsilon: float = 0.05,
) -> ProtoLearnResult:
    """Reference lib/prototype_learning.py:11-77 in one vectorized pass.

    For every pixel: Sinkhorn-balance its similarity to its OWN class's P
    slots (grouped_sinkhorn), take the hard assignment q; correctly-predicted
    pixels' embeddings are mass-weighted-averaged per slot (f = m_qᵀ·c), the
    slot mean is L2-normalised and EMA'd into the prototype
    (momentum_update, lib/momentum_update.py:7 — old*m + new*(1-m)) for slots
    that received mass. `proto_target` is `slot + P*class` for valid pixels
    and the raw gt id elsewhere (reference keeps `gt_seg.clone()` there).
    """
    K, P, D = prototypes.shape
    N = emb.shape[0]
    f32 = jnp.float32
    emb = emb.astype(f32)
    protos = prototypes.astype(f32)

    flat = protos.reshape(K * P, D)
    proto_logits = emb @ flat.T  # (N, K*P) — the reference's cosine_similarity

    valid = gt_seg < K
    gt = jnp.where(valid, gt_seg, 0).astype(jnp.int32)

    # each row's own-class block of the logits = the reference's init_q
    block = gt[:, None] * P + jnp.arange(P)[None, :]
    init_q = jnp.take_along_axis(proto_logits, block, axis=1)

    q_soft, idx = grouped_sinkhorn(
        init_q, gt, K, valid, n_iters=sinkhorn_iters, epsilon=epsilon
    )
    q = hard_assignment(q_soft, rng=rng) * valid[:, None].astype(f32)

    # slot update from correctly-predicted pixels only (reference :44-54)
    w = q * (correct & valid)[:, None].astype(f32)  # m_q (N, P)

    def slot_stats(p, _):
        f_p = jax.ops.segment_sum(emb * w[:, p][:, None], gt, num_segments=K)
        n_p = jax.ops.segment_sum(w[:, p], gt, num_segments=K)
        return p + 1, (f_p, n_p)

    _, (f, n) = jax.lax.scan(slot_stats, 0, None, length=P)
    f = jnp.moveaxis(f, 0, 1)  # (K, P, D)
    n = jnp.moveaxis(n, 0, 1)  # (K, P)

    if update_prototype:
        f_norm = f / jnp.maximum(
            jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-12
        )
        mixed = coefficient * protos + (1.0 - coefficient) * f_norm
        protos = jnp.where((n > 0)[..., None], mixed, protos)

    target = jnp.where(
        valid, idx + P * gt, gt_seg.astype(jnp.int32)
    )
    return ProtoLearnResult(proto_logits, target, protos.astype(prototypes.dtype))
