"""Target bipartite graphs for the `_tg` (target-graph) training variants.

Reference: lib/module/get_pretrain_bipart_graph.py (416 LoC) builds initial
bipartite targets from manually-curated cross-dataset mapping CSVs
(ade_bdd/ade_coco/bdd_coco); the `_tg` trainers feed them to the loss's
adj-target MSE term (loss_cross_datasets.py:1028-1041), with 255 marking
"no constraint" entries.

Here the targets come from the same information the configs already carry —
the `class_remap{i}` multimaps — so no CSV sidecar files are needed:
  target[i][k, u] = 1 where class k of dataset i may map to unified class u,
                    0 where it must not, 255 (no-constraint) elsewhere.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


def target_graphs_from_remap(configer, max_num_unify_class: Optional[int] = None,
                             constrain_negatives: bool = True) -> List[np.ndarray]:
    from mds_tpu.data.class_remap import ClassRemap

    remap = ClassRemap(configer)
    M = max_num_unify_class or remap.num_unify_classes
    out = []
    for i in range(configer.n_datasets):
        n_cats = configer.n_cats(i)
        if constrain_negatives:
            g = np.zeros((n_cats, M), np.float32)
        else:
            g = np.full((n_cats, M), 255.0, np.float32)
        for k, v in remap.remapList[i].items():
            if k >= n_cats:
                continue
            for u in v:
                if u < M:
                    g[k, u] = 1.0
        out.append(g)
    return out


def target_graphs_from_pairs(
    dataset_cats: Sequence[int], M: int,
    pairs_per_dataset: Sequence[Sequence],
) -> List[np.ndarray]:
    """Build targets from explicit (class, unified) pair lists — the direct
    equivalent of the reference's CSV-driven path; unlisted entries are 255
    (unconstrained)."""
    out = []
    for n_cats, pairs in zip(dataset_cats, pairs_per_dataset):
        g = np.full((n_cats, M), 255.0, np.float32)
        for k, u in pairs:
            g[k, u] = 1.0
        out.append(g)
    return out
