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


def _phase_taps(f: int):
    """Bilinear ×f (half-pixel, align_corners=False) per output phase p:
    out[f·q + p] = (1−frac)·src[q−1+a] + frac·src[q+a], a ∈ {0, 1}.
    Returns [(a, frac)] — static Python floats, baked into the graph."""
    taps = []
    for p in range(f):
        off = (p + 0.5) / f - 0.5
        if off < 0:
            taps.append((0, 1.0 + off))  # taps src[q−1], src[q]
        else:
            taps.append((1, off))  # taps src[q], src[q+1]
    return taps


def cross_entropy_upsampled(
    logits: jax.Array, labels: jax.Array, factor: int, ignore: int = 255
):
    """Per-pixel CE of bilinearly ×factor-upsampled logits, phase-major.

    Value-identical (as a pixel multiset) to
    `cross_entropy_per_pixel(jax.image.resize(logits, ×factor, 'linear'),
    labels)` — but the full-res class volume NEVER materializes: the resize
    is decomposed into its f² sub-pixel phases, each an elementwise
    slice-blend of the head-resolution logits that XLA fuses straight into
    its logsumexp reduction. jax.image.resize lowers to convolutions, which
    form a fusion barrier; at bs16 512×1024×19 the five BiSeNetV2 head
    volumes are the largest tensors in the train graph. Edge handling:
    clamped taps == edge-padding (for the linear kernel, jax.image.resize's
    boundary renormalization collapses both taps onto the edge texel).

    logits (B, hs, ws, C); labels (B, hs·f, ws·f). Returns (ce, valid) of
    shape (f², B, hs, ws) — phase-major order; OHEM/mean consumers are
    order-free.
    """
    b, hs, ws, c = logits.shape
    f = int(factor)
    assert labels.shape[1] == hs * f and labels.shape[2] == ws * f, (
        logits.shape, labels.shape, f)
    taps = _phase_taps(f)
    fracs = [fr for _, fr in taps]
    n_lo = sum(1 for a, _ in taps if a == 0)  # phases using taps (q−1, q)
    xp = jnp.pad(
        logits.astype(jnp.float32), ((0, 0), (1, 1), (1, 1), (0, 0)),
        mode="edge",
    )
    lab5 = labels.reshape(b, hs, f, ws, f)
    # Phases sharing a tap offset differ only in their scalar blend weight,
    # so all of them vectorize over one broadcast axis: the f² phases
    # collapse into ≤4 (row-group × col-group) blocks — O(1) trace size and
    # four big reduce fusions instead of f² small ones.
    groups = [(0, 0, n_lo), (1, n_lo, f)]
    ces, vals = [], []
    for ra, r_lo, r_hi in groups:
        if r_lo == r_hi:
            continue
        npr = r_hi - r_lo
        frs = jnp.asarray(fracs[r_lo:r_hi], jnp.float32).reshape(
            npr, 1, 1, 1, 1)
        r0 = jax.lax.slice_in_dim(xp, ra, ra + hs, axis=1)[None]
        r1 = jax.lax.slice_in_dim(xp, ra + 1, ra + 1 + hs, axis=1)[None]
        t = (1.0 - frs) * r0 + frs * r1  # (npr, b, hs, ws+2, c)
        for ca, c_lo, c_hi in groups:
            if c_lo == c_hi:
                continue
            npc = c_hi - c_lo
            fcs = jnp.asarray(fracs[c_lo:c_hi], jnp.float32).reshape(
                1, npc, 1, 1, 1, 1)
            c0 = jax.lax.slice_in_dim(t, ca, ca + ws, axis=3)[:, None]
            c1 = jax.lax.slice_in_dim(t, ca + 1, ca + 1 + ws, axis=3)[:, None]
            z = (1.0 - fcs) * c0 + fcs * c1  # (npr, npc, b, hs, ws, c)
            lb_blk = jnp.transpose(
                lab5[:, :, r_lo:r_hi, :, c_lo:c_hi], (2, 4, 0, 1, 3)
            )  # (npr, npc, b, hs, ws)
            ce, valid = cross_entropy_per_pixel(z, lb_blk, ignore)
            ces.append(ce.reshape(npr * npc, b, hs, ws))
            vals.append(valid.reshape(npr * npc, b, hs, ws))
    return jnp.concatenate(ces), jnp.concatenate(vals)


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

    def upsampled(self, logits: jax.Array, labels: jax.Array,
                  factor: int) -> jax.Array:
        """OHEM CE of ×factor-bilinear-upsampled logits without ever
        materializing the upsampled volume (see cross_entropy_upsampled)."""
        if factor == 1:
            return self(logits, labels)
        ce, valid = cross_entropy_upsampled(logits, labels, factor,
                                            self.ignore_lb)
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
