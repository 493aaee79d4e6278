#!/usr/bin/env python
"""Evaluation CLI (reference: evaluate.py main :1602, tools/evaluate_city.py).

  python tools/evaluate.py --config cfg.json --ckpt res/ckpt [--mode ss|msf]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", default=None, help="orbax checkpoint dir")
    ap.add_argument("--mode", default="ss", choices=["ss", "msf", "contrast"])
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mds_tpu.config import Configer
    from mds_tpu.data.loader import get_data_loader
    from mds_tpu.engine.optim import build_optimizer
    from mds_tpu.engine.lr_schedule import warmup_poly_lr
    from mds_tpu.engine.trainer import Trainer, build_model
    from mds_tpu.evaluation.evaluator import eval_model
    from mds_tpu.parallel.mesh import maybe_initialize_distributed

    maybe_initialize_distributed()
    configer = Configer(config_file=args.config, args_parser=args.overrides)
    trainer = Trainer(configer, compute_dtype=jnp.bfloat16)
    if args.ckpt:
        trainer.ckpt.directory = os.path.abspath(args.ckpt)
    trainer.restore_if_available()
    variables = {
        "params": trainer.state.params,
        "batch_stats": trainer.state.batch_stats,
    }
    loaders = get_data_loader(
        configer, "eval", rank=jax.process_index(), world=jax.process_count()
    )
    mious = eval_model(configer, trainer.model, variables, loaders, mode=args.mode)
    for i, miou in enumerate(mious):
        print(f"dataset{i + 1} mIoU ({args.mode}): {miou:.4f}")


if __name__ == "__main__":
    main()
