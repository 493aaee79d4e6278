"""K-means in JAX (euclidean / cosine), used for prototype clustering.

Reference: lib/module/kmeans.py:27 (torch kmeans with euclidean, cosine and
soft-DTW distances; the soft-DTW option ran on vendored numba-CUDA kernels,
lib/module/soft_dtw_cuda.py — here soft-DTW is a `lax.scan` over
anti-diagonals, see soft_dtw below). Lloyd iterations under `lax.scan` with
empty-cluster carry-over (keep the old center).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _pairwise(x: jax.Array, centers: jax.Array, distance: str) -> jax.Array:
    if distance == "euclidean":
        return jnp.sum(
            jnp.square(x[:, None, :] - centers[None, :, :]), axis=-1
        )
    if distance == "cosine":
        xn = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        cn = centers / jnp.maximum(
            jnp.linalg.norm(centers, axis=-1, keepdims=True), 1e-12
        )
        return 1.0 - xn @ cn.T
    raise ValueError(distance)


@functools.partial(jax.jit, static_argnames=("n_clusters", "n_iter", "distance"))
def kmeans(
    x: jax.Array, n_clusters: int, rng: jax.Array, n_iter: int = 20,
    distance: str = "euclidean",
) -> Tuple[jax.Array, jax.Array]:
    """→ (centers (K,D), assignment (N,))."""
    n = x.shape[0]
    idx = jax.random.choice(rng, n, (n_clusters,), replace=False)
    centers0 = x[idx]

    def step(centers, _):
        d = _pairwise(x, centers, distance)
        assign = jnp.argmin(d, axis=1)
        onehot = jax.nn.one_hot(assign, n_clusters, dtype=x.dtype)
        counts = onehot.sum(axis=0)
        sums = onehot.T @ x
        new = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), centers
        )
        return new, None

    centers, _ = jax.lax.scan(step, centers0, None, length=n_iter)
    assign = jnp.argmin(_pairwise(x, centers, distance), axis=1)
    return centers, assign


@functools.partial(jax.jit, static_argnames=("gamma",))
def soft_dtw(D: jax.Array, gamma: float = 1.0) -> jax.Array:
    """Soft-DTW value from a (N,M) pairwise-cost matrix.

    Reference: lib/module/soft_dtw_cuda.py (Maghoumi's numba-CUDA kernels,
    anti-diagonal wavefront). Here the same recurrence runs as a `lax.scan`
    over rows with soft-min R[i,j] = D[i,j] + softmin(R[i-1,j], R[i,j-1],
    R[i-1,j-1]).
    """
    n, m = D.shape
    inf = jnp.float32(1e30)

    def softmin(a, b, c):
        z = -jnp.stack([a, b, c]) / gamma
        return -gamma * jax.nn.logsumexp(z, axis=0)

    # initialize row 0 manually: R[0,j] = cumsum(D[0,:j])
    row0 = jnp.cumsum(D[0])
    if n == 1:
        return row0[-1]
    # diag for row 1's first col is R[0,-1] ≡ 0 only at origin; emulate the
    # standard init by treating R[-1,-1]=0: row0 as computed already includes it
    rows = D[1:]

    def outer(prev_row, d_row):
        r_diag_row = jnp.concatenate([jnp.array([inf]), prev_row[:-1]])
        # R[i,0] = D[i,0] + softmin(R[i-1,0], inf, R[i-1,-1]=inf) = D[i,0]+R[i-1,0]

        def col_step(r_left, inputs):
            d, r_up, r_diag = inputs
            r = d + softmin(r_up, r_left, r_diag)
            return r, r

        _, row = jax.lax.scan(col_step, inf, (d_row, prev_row, r_diag_row))
        return row, None

    final, _ = jax.lax.scan(outer, row0, rows)
    return final[-1]


def pairwise_soft_dtw(x: jax.Array, centers: jax.Array, gamma: float = 1.0):
    """Soft-DTW distance matrix between sequence sets (N,L,D) × (K,L,D)."""

    def one(a, b):
        D = jnp.sum(jnp.square(a[:, None, :] - b[None, :, :]), axis=-1)
        return soft_dtw(D, gamma)

    return jax.vmap(lambda a: jax.vmap(lambda b: one(a, b))(centers))(x)
