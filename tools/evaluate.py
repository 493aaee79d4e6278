#!/usr/bin/env python
"""Evaluation CLI (reference: evaluate.py main :1602, tools/evaluate_city.py).

  python tools/evaluate.py --config cfg.json --ckpt res/ckpt [--mode MODE]

Modes (reference drivers in evaluate.py):
  ss / ssc / msf / mscf  — the README protocol columns (:907 + MscEvalCrop)
  contrast               — GNN-era label-downsample protocol (:1107)
  uni / unseen / clip    — unified-label-space drivers (:1425/:1346/:1386)
  label_link / emb / aux — :1464 / :1560 / :1528

The checkpoint layout is chosen by the config's train.mode, matching what
tools/train.py writes (AlternatingTrainer / ContrastTrainer / Trainer).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from mds_tpu.evaluation.evaluator import EVAL_MODES

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", default=None, help="orbax checkpoint dir")
    ap.add_argument("--mode", default="ss", choices=list(EVAL_MODES))
    ap.add_argument("--work-dir", default="./res")
    ap.add_argument(
        "--precise-bn", type=int, default=0, metavar="N",
        help="recompute BN running stats over N train batches before eval "
             "(reference train_bn.py / lib/precise_bn.py, CamVidPreciseBN.md)",
    )
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    from mds_tpu.config import Configer
    from mds_tpu.evaluation.drivers import run_evaluation
    from mds_tpu.parallel.mesh import maybe_initialize_distributed

    maybe_initialize_distributed()
    configer = Configer(config_file=args.config, args_parser=args.overrides)
    mious = run_evaluation(
        configer, mode=args.mode, ckpt=args.ckpt, work_dir=args.work_dir,
        precise_bn=args.precise_bn,
    )
    for i, miou in enumerate(mious):
        print(f"dataset{i + 1} mIoU ({args.mode}): {miou:.4f}")


if __name__ == "__main__":
    main()
