"""Discrete bipartite matching from a learned affinity block via UOT.

Reference: lib/models/graph_attention_network.py:1261-1350
(`sep_bipartite_graphs_by_uot`) — per dataset:
  1. cost = (1 − affinity + 1e−8)/2, transposed to (M_unified, n_cats);
  2. UOT plan Q = sinkhorn_knopp_unbalanced(unif(M), β_i, cost, reg=0.01,
     reg_m=5), normalized to sum 1;
  3. hard assignment: each unified column goes to its argmax dataset class;
  4. repair pass A — every dataset class must keep ≥1 unified column: an
     empty row steals the lowest-confidence column from a row that has >1;
  5. repair pass B — over-mapped rows drop columns with confidence below
     uot_ratio/(M·n_cats), always keeping their best column;
  6. β_i ← 0.7·β_i + 0.3·column-sums(Q) (EMA of the matched marginal).

The UOT solve runs on device (jax); the repair passes are inherently
sequential small-n host logic (run once per GNN→SEG switch, off the hot
path) and live here in numpy with explicit β state instead of the
reference's module attribute.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from mds_tpu.ops.sinkhorn import sinkhorn_knopp_unbalanced


def uot_bipartite_match(
    affinity: np.ndarray,
    beta: np.ndarray,
    uot_ratio: float = 1.0,
    reg: float = 0.01,
    reg_m: float = 5.0,
    mu: float = 0.7,
) -> Tuple[np.ndarray, np.ndarray]:
    """One dataset's (n_cats, M) affinity block → (0/1 graph, new β)."""
    n_cats, M = affinity.shape
    cost = ((-affinity + 1.0 + 1e-8) / 2.0).T  # (M, n_cats)
    alpha = np.full(M, 1.0 / M)
    Q = np.asarray(
        sinkhorn_knopp_unbalanced(alpha, np.asarray(beta), cost, reg, reg_m)
    ).astype(np.float64)
    Q_bar = Q / Q.sum()

    out = np.zeros((n_cats, M), np.float32)
    pseudo_label = Q_bar.argmax(axis=1)  # (M,) best dataset class per column
    out[pseudo_label, np.arange(M)] = 1.0

    # repair A: guarantee every dataset class keeps ≥1 column
    for row in range(n_cats):
        if out[row].sum() == 0:
            order = np.argsort(Q_bar.T[row])  # ascending confidence
            for col in order:
                owner = int(np.flatnonzero(out[:, col] == 1)[0])
                if out[owner].sum() > 1:
                    out[row, col] = 1.0
                    out[owner, col] = 0.0
                    break

    # repair B: prune over-mapped rows below the confidence floor
    floor = uot_ratio / (Q_bar.shape[0] * Q_bar.shape[1])
    for row in range(n_cats):
        if out[row].sum() > 1:
            cols = np.flatnonzero(out[row] == 1)
            best = cols[np.argmax(Q_bar[cols, row])]
            for col in cols:
                if Q_bar[col, row] < floor:
                    out[row, col] = 0.0
            if out[row].sum() == 0:
                out[row, best] = 1.0

    new_beta = mu * np.asarray(beta) + (1 - mu) * Q_bar.sum(axis=0)
    return out, new_beta


def sep_bipartite_graphs_by_uot(
    adj: np.ndarray,
    dataset_cats: Sequence[int],
    betas: List[np.ndarray],
    uot_ratio: float = 1.0,
) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """Full multi-dataset matching over the (total_cats, M) affinity block.
    Returns (graphs, updated betas)."""
    graphs, new_betas = [], []
    cur = 0
    for i, c in enumerate(dataset_cats):
        block = np.asarray(adj[cur : cur + c], np.float64)
        g, nb = uot_bipartite_match(block, betas[i], uot_ratio)
        graphs.append(g)
        new_betas.append(nb)
        cur += c
    return graphs, new_betas


def km_bipartite_match(affinity: np.ndarray) -> np.ndarray:
    """KM/Munkres discrete matching for one dataset's (n_cats, M) affinity
    block (reference sep_bipartite_graphs_by_km with use_km=True,
    graph_attention_network.py:1220-1244): Hungarian assignment maximizing
    total affinity (munkres on −affinity ≡ scipy linear_sum_assignment with
    maximize), then every unified column the assignment left uncovered goes
    to its argmax dataset class — so each dataset class keeps exactly the
    column the assignment gave it, and no column is orphaned."""
    from scipy.optimize import linear_sum_assignment

    n_cats, M = affinity.shape
    rows, cols = linear_sum_assignment(-np.asarray(affinity, np.float64))
    out = np.zeros((n_cats, M), np.float32)
    covered = np.zeros(M, bool)
    for r, c in zip(rows, cols):
        out[r, c] = 1.0
        covered[c] = True
    for j in np.flatnonzero(~covered):
        out[int(np.argmax(affinity[:, j])), j] = 1.0
    return out


def sep_bipartite_graphs_by_km(
    adj: np.ndarray, dataset_cats: Sequence[int]
) -> List[np.ndarray]:
    """Multi-dataset KM matching over the (total_cats, M) affinity block —
    the discrete alternative to UOT (GNN.use_km)."""
    graphs, cur = [], 0
    for c in dataset_cats:
        graphs.append(km_bipartite_match(np.asarray(adj[cur : cur + c])))
        cur += c
    return graphs


def pretrain_bipartite_graphs(dataset_cats: Sequence[int], M: int) -> List[np.ndarray]:
    """Identity block-diagonal init graphs
    (graph_attention_network.py:1091-1104)."""
    out = []
    cur = 0
    for c in dataset_cats:
        g = np.zeros((c, M), np.float32)
        for j in range(c):
            # unify_ratio < 1 makes M < total_cats: later classes fold onto
            # column (cur+j) mod M instead of indexing out of range (the
            # reference's identity init crashes there)
            g[j, (cur + j) % M] = 1.0
        out.append(g)
        cur += c
    return out
