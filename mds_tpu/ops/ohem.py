"""OHEM (online hard example mining) top-k selection, TPU-friendly.

Reference semantics (lib/loss/ohem_ce_loss.py:13-34): per-pixel CE with
ignore=255; keep pixels with loss > −log(thresh); if fewer than
n_min = n_valid // 16 survive, keep the n_min largest instead; mean over kept.

The torch code does a data-dependent `loss.topk(n_min)` over ~10⁷ pixels.
Under XLA we need static shapes, and an exact full sort of B·H·W elements
wastes HBM bandwidth. The quantile is found by a conditional 8-way value
bisection (see ohem_threshold_hist): zero extra passes in the common case
where the fixed −log(p) floor already keeps ≥ n_min pixels, and nine fused
count-passes (2.4e-7 nat resolution) otherwise. `ohem_mean_exact` (full
sort) is provided for tests and small inputs.
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

    The k-th-largest threshold is found by **8-way bisection** over the loss
    value: each pass reads the losses ONCE and counts against 7 candidate
    thresholds in one fused multi-reduce; 9 passes give 32/8⁹ ≈ 2.4e-7 nat
    resolution (the old 26-pass binary search's 4.8e-7, at ~⅓ the
    loss-array sweeps). (A scatter-add histogram was 100× slower — TPU scatters over
    10⁷ elements serialize; a full sort is worse.) The whole search sits
    under lax.cond: when the fixed −log(p) floor already keeps ≥ n_min
    pixels — the common case during training — not a single pass runs
    (the old unconditional 26-pass binary search cost ~26 loss-array sweeps
    per head regardless).
    """
    losses = losses.astype(jnp.float32)
    above = jnp.sum(((losses > thresh) & valid).astype(jnp.int32))
    n_min = jnp.maximum(n_min, 1)

    def bisect():
        fr = jnp.arange(1, 8, dtype=jnp.float32) / 8.0  # (7,)

        def body(_, lohi):
            lo, hi = lohi
            mids = lo + (hi - lo) * fr  # (7,) ascending
            cnts = jnp.sum(
                ((losses[:, None] >= mids[None, :]) & valid[:, None]).astype(
                    jnp.int32
                ),
                axis=0,
            )  # (7,) descending in value
            ok = cnts >= n_min  # True for mids low enough to keep ≥ n_min
            # new lo = largest ok mid (or keep lo); new hi = next mid above
            any_ok = jnp.any(ok)
            idx = jnp.where(any_ok, 6 - jnp.argmax(ok[::-1]), 0)
            new_lo = jnp.where(any_ok, mids[idx], lo)
            new_hi = jnp.where(
                any_ok, jnp.where(idx == 6, hi, mids[jnp.minimum(idx + 1, 6)]),
                mids[0],
            )
            return new_lo, new_hi

        lo, _ = jax.lax.fori_loop(
            0, 9, body, (jnp.float32(0.0), jnp.float32(max_loss))
        )
        # lo is the largest tested threshold still keeping ≥ n_min pixels
        return lo

    return jax.lax.cond(
        above >= n_min, lambda: jnp.float32(thresh), bisect
    )


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
