#!/usr/bin/env python
"""Flagship (snp_rn18 + BGNN) train-step throughput on the real chip.

The reference's headline workload is the alternating SEG/GNN trainer
(tools/train_ltbgnn_all_datasets_snp.py hot loop :711-965). This bench
times BOTH jitted stage steps of our AlternatingTrainer under the shipped
3-dataset recipe (configs/ltbgnn_3_datasets_snp.json: crop 768×768,
ims_per_gpu 4 per dataset → global batch 12, AdamW) in bf16, with the
pinned chained+fetched median-of-3 methodology of bench.py — synthetic
data + synthetic node features, so no datasets are required.

  python tools/bench_flagship_train.py [--iters 8] [--tiny]

Prints one JSON line per stage:
  {"metric": "flagship_seg_imgs_per_sec", ...}   # SEG stage (200k of 260k iters)
  {"metric": "flagship_gnn_steps_per_sec", ...}  # GNN stage (fwd-only seg + GNN bwd)
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def run(config: str = "configs/ltbgnn_3_datasets_snp.json",
        iters: int = 8, tiny: bool = False, seg_only: bool = False,
        metric_prefix: str = "flagship"):
    """Build + time both flagship stage steps; returns the metric dicts.
    Importable (bench.py reuses it for the driver-tracked record)."""
    from mds_tpu.config import Configer
    from mds_tpu.engine.gnn_trainer import AlternatingTrainer

    configer = Configer(config_file=config)
    if tiny:
        configer.update(("train", "cropsize"), [64, 64])
        for i in range(configer.n_datasets):
            configer.update((f"dataset{i + 1}", "ims_per_gpu"), 1)

    n = configer.n_datasets
    crop = configer.get("train", "cropsize")
    cats = [configer.n_cats(i) for i in range(n)]
    bs = [int(configer.dataset_cfg(i).get("ims_per_gpu", 4)) for i in range(n)]
    nfeat = int(configer.get("GNN", "nfeat"))
    rng = np.random.default_rng(0)
    node_feats = rng.normal(size=(sum(cats), nfeat)).astype(np.float32)

    t = AlternatingTrainer(
        configer, compute_dtype=jnp.bfloat16, node_features=node_feats
    )

    ims = [
        jnp.asarray(rng.integers(0, 256, (b, crop[0], crop[1], 3)), jnp.uint8)
        for b in bs
    ]
    lbs = []
    for b, c in zip(bs, cats):
        lb4 = rng.integers(0, c, (b, crop[0] // 4, crop[1] // 4))
        lbs.append(jnp.asarray(np.repeat(np.repeat(lb4, 4, 1), 4, 2), jnp.uint8))

    n_iters = iters
    key = jax.random.PRNGKey(0)

    def fetch(tree):  # force a device→host read (tunnel-honest timing)
        return float(jax.tree_util.tree_leaves(tree)[0].reshape(-1)[0])

    def timed(loop_fn, state):
        fetch(loop_fn(state))  # compile + warmup
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fetch(loop_fn(state))
            runs.append(n_iters / (time.perf_counter() - t0))
        return sorted(runs)[1], runs

    # --- SEG stage step (backbone+prototype-head backward, AdamW) ---------
    # ims/lbs enter as ARGUMENTS, not closure constants: XLA embeds closed-
    # over images as constant literals in the consumer's lane-padded layout
    # (bf16[4,768,768,3] → 42.7× expansion, 576 MB each — measured in the
    # 7-dataset OOM report), arguments stay in their natural layout.
    @functools.partial(jax.jit, donate_argnums=())
    def seg_loop(state, ims, lbs):
        def body(i, st):
            st, _ = t._seg_step(st, t.seg_buffers, ims, lbs)
            return st

        return jax.lax.fori_loop(0, n_iters, body, state).params

    sps, runs = timed(lambda st: seg_loop(st, ims, lbs), t.seg_state)
    records = [{
        "metric": f"{metric_prefix}_seg_imgs_per_sec",
        "value": round(sps * sum(bs), 2),
        "unit": "imgs/s/chip",
        "steps_per_sec": round(sps, 3),
        "global_batch": sum(bs),
        "runs": [round(r * sum(bs), 2) for r in runs],
    }]

    if seg_only:
        return records

    # --- GNN stage step (frozen-seg features fwd + GNN backward) ----------
    @functools.partial(jax.jit, donate_argnums=())
    def gnn_loop(state, ims, lbs):
        def body(i, st):
            st, _ = t._gnn_step(
                st, t.seg_state, t.seg_buffers, t.node_features, ims, lbs,
                jax.random.fold_in(key, i), jnp.float32(0.5), jnp.float32(1.0),
                jnp.float32(1.0),
            )
            return st

        return jax.lax.fori_loop(0, n_iters, body, state).params

    gps, runs = timed(lambda st: gnn_loop(st, ims, lbs), t.gnn_state)
    records.append({
        "metric": f"{metric_prefix}_gnn_steps_per_sec",
        "value": round(gps, 3),
        "unit": "steps/s/chip",
        "global_batch": sum(bs),
        "runs": [round(r, 3) for r in runs],
    })
    return records


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/ltbgnn_3_datasets_snp.json")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument(
        "--tiny", action="store_true",
        help="64×64 crop, bs1 — CPU smoke test of the bench itself",
    )
    ap.add_argument(
        "--seg-only", action="store_true",
        help="time only the SEG-stage step (the 7-dataset recipe's GNN "
        "stage is identical in kind to the 3-dataset one)",
    )
    ap.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (sitecustomize pins the tunnel TPU "
        "platform; the env var alone does not override it)",
    )
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    for rec in run(config=args.config, iters=args.iters, tiny=args.tiny,
                   seg_only=args.seg_only):
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
