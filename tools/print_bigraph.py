#!/usr/bin/env python
"""Inspect learned bipartite graphs: which unified class each dataset class
maps to (reference: tools/get_bipartile.py print_bipartite :123,
tools/print_bigraph.py).

  python tools/print_bigraph.py --config cfg.json --ckpt res/ckpt [--dataset 0]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def print_bipartite(graphs, class_names=None, unified_names=None):
    for i, g in enumerate(graphs):
        g = np.asarray(g)
        print(f"== dataset {i} ({g.shape[0]} classes → {g.shape[1]} unified) ==")
        for row in range(g.shape[0]):
            cols = np.flatnonzero(g[row] > 0)
            name = class_names[i][row] if class_names else str(row)
            uni = ", ".join(
                unified_names[c] if unified_names else str(int(c)) for c in cols
            )
            print(f"  {name:>24s} -> [{uni}]")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", default=None,
                    help="AlternatingTrainer checkpoint dir (tools/train.py "
                    "--gnn writes work_dir/ckpt_gnn); without it the graphs "
                    "come from a fresh init")
    ap.add_argument("--dataset", type=int, default=None,
                    help="print only this dataset's graph")
    args = ap.parse_args()

    from mds_tpu.config import Configer
    from mds_tpu.data.labels import get_spec
    from mds_tpu.engine.gnn_trainer import AlternatingTrainer

    configer = Configer(config_file=args.config)
    t = AlternatingTrainer(configer)
    if args.ckpt:
        t.restore(args.ckpt)
    proto, graphs = t.optimal_matching()
    names = []
    for i in range(configer.n_datasets):
        spec = configer.dataset_cfg(i).get("spec")
        names.append(get_spec(spec).class_names if spec
                     else [str(j) for j in range(configer.n_cats(i))])
    if args.dataset is not None:
        print(f"(dataset {args.dataset})")
        graphs = [graphs[args.dataset]]
        names = [names[args.dataset]]
    print_bipartite(list(graphs), names)


if __name__ == "__main__":
    main()
