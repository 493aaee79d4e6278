#!/usr/bin/env python
"""Unified-label usage audit CLI (reference: evaluate.py find_unuse_label
:1688-1786 + eval_find_use_and_unuse_label :1788-1931).

  python tools/find_unuse.py --config cfg.json --ckpt res/ckpt \
      [--out target_bipart.npz] [key.path value ...]

Prints, per dataset and per class, the unified-label slots the model
actually uses (>10% of the class's predicted mass), and writes the
use/unuse target bipartite matrices that supervise the reference's
`_find_unuse` trainer variant (train_ltbgnn_all_datasets_snp_find_unuse.py).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--work-dir", default="./res")
    ap.add_argument("--out", default=None, help="write target_bipart .npz here")
    # NOTE: the reference audits on train-stage-2 loaders
    # (evaluate.py:1800); our train loader is an infinite stream by design,
    # so the audit runs on the (finite) eval loaders instead — same model,
    # same statistics, bounded runtime.
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    import jax
    import numpy as np

    from mds_tpu.config import Configer
    from mds_tpu.data.loader import get_data_loader
    from mds_tpu.engine.trainer import dataset_stats
    from mds_tpu.evaluation.drivers import (
        build_eval_bundle,
        eval_find_use_and_unuse_label,
        find_unuse_label,
    )
    from mds_tpu.parallel.mesh import maybe_initialize_distributed

    maybe_initialize_distributed()
    configer = Configer(config_file=args.config, args_parser=args.overrides)
    model, variables, _ = build_eval_bundle(
        configer, ckpt=args.ckpt, work_dir=args.work_dir
    )
    loaders = get_data_loader(
        configer, "eval", rank=jax.process_index(), world=jax.process_count()
    )
    means, stds = dataset_stats(configer)
    for i, loader in enumerate(loaders):
        buckets = find_unuse_label(
            configer, model, variables, loader, configer.n_cats(i), i,
            mean=means[i], std=stds[i],
        )
        print(f"dataset{i + 1} used slots per class:")
        print(json.dumps({str(k): v for k, v in sorted(buckets.items())}))
    loaders = get_data_loader(
        configer, "eval", rank=jax.process_index(), world=jax.process_count()
    )
    _, _, target_bipart = eval_find_use_and_unuse_label(
        configer, model, variables, loaders, means=means, stds=stds
    )
    if args.out:
        np.savez(args.out, **{f"target_bipart_{i}": t
                              for i, t in enumerate(target_bipart)})
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
