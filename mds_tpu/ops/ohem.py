"""OHEM (online hard example mining) top-k selection, TPU-friendly.

Reference semantics (lib/loss/ohem_ce_loss.py:13-34): per-pixel CE with
ignore=255; keep pixels with loss > −log(thresh); if fewer than
n_min = n_valid // 16 survive, keep the n_min largest instead; mean over kept.

The torch code does a data-dependent `loss.topk(n_min)` over ~10⁷ pixels.
Under XLA we need static shapes, and an exact full sort of B·H·W elements
wastes HBM bandwidth. We use a two-pass histogram quantile instead:

  1. per-pixel losses (f32) are histogrammed into K log-spaced bins (one
     O(n) VPU pass, constant memory);
  2. the threshold is the bin edge where the from-the-top cumulative count
     first reaches n_min (n_min is a traced scalar — fine, it only selects
     a bin edge);
  3. final loss = mean of losses ≥ max(fixed_thresh_adjusted, bin_thresh).

The histogram threshold is exact to within one bin width (default 512 bins
over [0, 32] nats ⇒ 0.0625 nats). `ohem_mean_exact` (full sort) is provided
for tests and small inputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ohem_threshold_hist(
    losses: jax.Array,
    valid: jax.Array,
    n_min: jax.Array,
    thresh: float,
    n_bins: int = 512,  # kept for API compat: bisection depth = log2-ish
    max_loss: float = 32.0,
) -> jax.Array:
    """Return the OHEM keep-threshold.

    losses: (N,) f32 per-pixel loss (0 where invalid). valid: (N,) bool.
    n_min: scalar int — minimum number of kept pixels.
    thresh: the fixed −log(p) threshold.

    The k-th-largest threshold is found by **bisection** over the loss value:
    ~26 fused compare-and-reduce passes. (A scatter-add histogram was 100×
    slower — TPU scatters over 10⁷ elements serialize; a full sort is worse.)
    Resolution after 26 halvings of [0, max_loss] is ~5e-7 nats.
    """
    losses = losses.astype(jnp.float32)
    above = jnp.sum(((losses > thresh) & valid).astype(jnp.int32))
    n_min = jnp.maximum(n_min, 1)

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum(((losses >= mid) & valid).astype(jnp.int32))
        # too many kept → raise the floor; too few → lower it
        return jnp.where(cnt >= n_min, mid, lo), jnp.where(cnt >= n_min, hi, mid)

    lo, hi = jax.lax.fori_loop(
        0, 26, body, (jnp.float32(0.0), jnp.float32(max_loss))
    )
    # lo is the largest tested threshold still keeping ≥ n_min pixels
    return jnp.where(above >= n_min, jnp.float32(thresh), lo)


def ohem_mean(
    losses: jax.Array,
    valid: jax.Array,
    thresh: float,
    n_min_ratio: int = 16,
    n_bins: int = 512,
    max_loss: float = 32.0,
) -> jax.Array:
    """Full OHEM reduction: mean over kept hard pixels.

    Matches OhemCELoss.forward (lib/loss/ohem_ce_loss.py:21-34) with
    n_min = n_valid // n_min_ratio.
    """
    losses = losses.reshape(-1).astype(jnp.float32)
    valid = valid.reshape(-1)
    n_valid = jnp.sum(valid.astype(jnp.int32))
    n_min = n_valid // n_min_ratio
    # the keep-threshold is non-differentiable selection state (torch's topk
    # indices likewise); without stop_gradient, autodiff unrolls the bisection
    # scan and saves ~26 full-size residuals — catastrophic HBM traffic
    sg_losses = jax.lax.stop_gradient(losses)
    t = ohem_threshold_hist(sg_losses, valid, n_min, thresh, n_bins, max_loss)
    keep = valid & ((sg_losses > thresh) | (sg_losses >= t))
    keep_f = keep.astype(jnp.float32)
    total = jnp.sum(losses * keep_f)
    count = jnp.maximum(jnp.sum(keep_f), 1.0)
    return total / count


def ohem_mean_exact(
    losses: jax.Array, valid: jax.Array, thresh: float, n_min_ratio: int = 16
) -> jax.Array:
    """Exact (sort-based) OHEM — reference semantics, for tests/small inputs."""
    losses = losses.reshape(-1).astype(jnp.float32)
    valid = valid.reshape(-1)
    n = losses.shape[0]
    n_valid = jnp.sum(valid.astype(jnp.int32))
    n_min = n_valid // n_min_ratio
    masked = jax.lax.stop_gradient(jnp.where(valid, losses, -jnp.inf))
    sorted_desc = jnp.sort(masked)[::-1]
    # value of the n_min-th largest loss (1-indexed); n_min may be 0
    kth = sorted_desc[jnp.clip(n_min - 1, 0, n - 1)]
    n_above = jnp.sum((masked > thresh).astype(jnp.int32))
    cutoff = jnp.where(n_above >= n_min, jnp.float32(thresh), kth)
    keep = valid & ((losses > thresh) | (losses >= cutoff))
    keep_f = keep.astype(jnp.float32)
    return jnp.sum(losses * keep_f) / jnp.maximum(jnp.sum(keep_f), 1.0)
