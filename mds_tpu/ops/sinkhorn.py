"""Optimal transport: log-space Sinkhorn and unbalanced Sinkhorn-Knopp.

References:
  * lib/module/sinkhorn.py:6-80 — SuperGlue-style log-space Sinkhorn +
    mutual-max match extraction (`solve_optimal_transport`);
  * POT `ot.unbalanced.sinkhorn_knopp_unbalanced` as called by
    lib/models/graph_attention_network.py:1286-1287 (reg=0.01, reg_m=5) — the
    KL-relaxed-marginals scaling algorithm, reimplemented as a `lax.while_loop`
    (the reference shells out to CPU scipy; ours runs on device).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def log_sinkhorn_iterations(Z: jax.Array, log_mu: jax.Array, log_nu: jax.Array,
                            iters: int) -> jax.Array:
    """Balanced Sinkhorn normalization in log space (sinkhorn.py:6-12)."""

    def body(carry, _):
        u, v = carry
        u = log_mu - jax.nn.logsumexp(Z + v[:, None, :], axis=2)
        v = log_nu - jax.nn.logsumexp(Z + u[:, :, None], axis=1)
        return (u, v), None

    u0 = jnp.zeros_like(log_mu)
    v0 = jnp.zeros_like(log_nu)
    (u, v), _ = jax.lax.scan(body, (u0, v0), None, length=iters)
    return Z + u[:, :, None] + v[:, None, :]


def log_optimal_transport(scores: jax.Array, iters: int) -> jax.Array:
    """Uniform-marginal OT in log space (sinkhorn.py:41-55). scores (b,m,n)."""
    b, m, n = scores.shape
    norm = -jnp.log(float(m + n))
    log_mu = jnp.full((b, m), norm, scores.dtype)
    log_nu = jnp.full((b, n), norm, scores.dtype)
    Z = log_sinkhorn_iterations(scores, log_mu, log_nu, iters)
    return Z - norm


def solve_optimal_transport(scores: jax.Array, iters: int, match_threshold: float):
    """Mutual-max matching over the OT plan (sinkhorn.py:58-80).
    Returns dict with matches0/matches1 (−1 = unmatched) and scores."""
    Z = log_optimal_transport(scores, iters)
    b, m, n = Z.shape
    indices0 = jnp.argmax(Z, axis=2)  # (b, m)
    indices1 = jnp.argmax(Z, axis=1)  # (b, n)
    ar0 = jnp.arange(m)[None, :]
    ar1 = jnp.arange(n)[None, :]
    mutual0 = ar0 == jnp.take_along_axis(indices1, indices0, axis=1)
    mutual1 = ar1 == jnp.take_along_axis(indices0, indices1, axis=1)
    max0 = jnp.max(Z, axis=2)
    mscores0 = jnp.where(mutual0, jnp.exp(max0), 0.0)
    mscores1 = jnp.where(mutual1, jnp.take_along_axis(mscores0, indices1, axis=1), 0.0)
    valid0 = mutual0 & (mscores0 > match_threshold)
    valid1 = mutual1 & jnp.take_along_axis(valid0, indices1, axis=1)
    matches0 = jnp.where(valid0, indices0, -1)
    matches1 = jnp.where(valid1, indices1, -1)
    return {
        "matches0": matches0,
        "matches1": matches1,
        "matching_scores0": mscores0,
        "matching_scores1": mscores1,
    }


def sinkhorn_knopp_unbalanced(
    a: jax.Array,
    b: jax.Array,
    M: jax.Array,
    reg: float,
    reg_m: float,
    num_iter_max: int = 1000,
    stop_thr: float = 1e-6,
) -> jax.Array:
    """POT-parity unbalanced Sinkhorn (KL-relaxed marginals).

    a (dim_a,), b (dim_b,) marginals; M (dim_a, dim_b) cost. Returns the
    transport plan diag(u) K diag(v) with K = exp(−M/reg) and the fixed point
    u = (a / Kv)^fi, v = (b / Kᵀu)^fi, fi = reg_m / (reg_m + reg) — the same
    iteration POT's `sinkhorn_knopp_unbalanced` runs, with its relative-change
    stopping rule.
    """
    a = a.astype(jnp.float64) if jax.config.jax_enable_x64 else a.astype(jnp.float32)
    dtype = a.dtype
    b = b.astype(dtype)
    K = jnp.exp(-M.astype(dtype) / reg)
    fi = reg_m / (reg_m + reg)

    def cond(state):
        i, u, v, err = state
        return (i < num_iter_max) & (err > stop_thr)

    def body(state):
        i, u, v, _ = state
        u_prev, v_prev = u, v
        Kv = K @ v
        u = jnp.power(a / jnp.maximum(Kv, 1e-300 if dtype == jnp.float64 else 1e-38), fi)
        Ktu = K.T @ u
        v = jnp.power(b / jnp.maximum(Ktu, 1e-300 if dtype == jnp.float64 else 1e-38), fi)
        err_u = jnp.max(jnp.abs(u - u_prev)) / jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(u)), jnp.max(jnp.abs(u_prev))), 1.0
        )
        err_v = jnp.max(jnp.abs(v - v_prev)) / jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(v)), jnp.max(jnp.abs(v_prev))), 1.0
        )
        return i + 1, u, v, 0.5 * (err_u + err_v)

    u0 = jnp.ones(a.shape[0], dtype) / a.shape[0]
    v0 = jnp.ones(b.shape[0], dtype) / b.shape[0]
    _, u, v, _ = jax.lax.while_loop(cond, body, (0, u0, v0, jnp.asarray(jnp.inf, dtype)))
    return u[:, None] * K * v[None, :]
