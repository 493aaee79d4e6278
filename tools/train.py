#!/usr/bin/env python
"""Training CLI — one entry point replacing the reference's ~30 train scripts.

Usage (reference parity: README.md:119-141, tools/train_amp.py:306):
  python tools/train.py --config configs/bisenetv2_city.json [--work-dir res]
      [--max-iter N] [--gnn] [key.path value ...]

--gnn selects the alternating SEG/GNN stage machine
(tools/train_ltbgnn_all_datasets_snp.py); otherwise the supervised seg
trainer (tools/train_amp.py skeleton). Multi-host: just run under
`jax.distributed` — no torch.distributed.launch equivalent needed.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--work-dir", default="./res")
    ap.add_argument("--max-iter", type=int, default=None)
    ap.add_argument("--gnn", action="store_true", help="alternating SEG/GNN training")
    ap.add_argument("--finetune-from", default=None)
    ap.add_argument("overrides", nargs="*", help="dotted-key config overrides")
    args = ap.parse_args()

    from mds_tpu.config import Configer
    from mds_tpu.parallel.mesh import maybe_initialize_distributed

    maybe_initialize_distributed()
    configer = Configer(config_file=args.config, args_parser=args.overrides)
    if args.max_iter is not None:
        configer.update(["lr", "max_iter"], args.max_iter)

    mode = configer.get("train", "mode", default=None)
    if mode == "contrast":
        import jax

        from mds_tpu.data.loader import get_data_loader
        from mds_tpu.engine.contrast_trainer import ContrastTrainer
        from mds_tpu.utils.logger import setup_logger
        from mds_tpu.utils.meters import AvgMeter, TimeMeter

        logger = setup_logger("mds_tpu_contrast", args.work_dir)
        trainer = ContrastTrainer(configer, work_dir=args.work_dir)
        if args.finetune_from:
            trainer.finetune_from(args.finetune_from)
            logger.info(f"finetuning from {args.finetune_from}")
        if trainer.ckpt.latest_step() is not None:
            trainer.restore()
            logger.info(f"restored contrast ckpt at step {int(trainer.state.step)}")
        # ims_per_gpu is per device (reference per-GPU batch); this process
        # feeds every local device of the trainer's mesh (engine/trainer.py
        # does the same for the plain seg path)
        loader = get_data_loader(
            configer, "train", rank=jax.process_index(), world=jax.process_count(),
            batch_multiplier=trainer.mesh.devices.size // jax.process_count(),
        )
        tm, lm = TimeMeter(trainer.max_iter), AvgMeter()
        try:
            for it in range(int(trainer.state.step), trainer.max_iter):
                metrics = trainer.step(next(loader))
                tm.update()
                lm.update(metrics["loss"])
                if (it + 1) % 100 == 0:
                    t, eta = tm.get()
                    logger.info(
                        f"iter {it + 1}/{trainer.max_iter} "
                        f"loss={lm.get()[0]:.4f} "
                        f"contrast={float(metrics['contrast_loss']):.4f} "
                        f"time={t:.2f} eta={eta}"
                    )
                trainer.maybe_save()
        finally:
            loader.close()
        trainer.save()
    elif args.gnn or mode in ("alternate", "gnn", "clip"):
        import jax
        import numpy as np

        from mds_tpu.data.loader import get_data_loader
        from mds_tpu.engine.gnn_trainer import AlternatingTrainer
        from mds_tpu.utils.logger import setup_logger
        from mds_tpu.utils.meters import AvgMeter, TimeMeter

        from mds_tpu.parallel.mesh import make_mesh

        logger = setup_logger("mds_tpu_gnn", args.work_dir)
        # DP mesh over all devices: the reference DDP-wraps BOTH nets
        # (train_ltbgnn_all_datasets_snp.py:268-299); here both param trees
        # are replicated and the per-dataset batches shard on `data`
        mesh = make_mesh()
        trainer = AlternatingTrainer(configer, mesh=mesh)
        # persistence + periodic eval (reference saves every 10k iters and
        # evals at stage switches, train_ltbgnn_all_datasets_snp.py:530-569)
        ckpt_dir = os.path.join(args.work_dir, "ckpt_gnn")
        ckpt_interval = int(
            configer.get("train", "ckpt_interval", default=10000)
        )
        eval_at_switch = bool(
            configer.get("train", "eval_at_switch", default=False)
        )
        if args.finetune_from:
            trainer.finetune_from(args.finetune_from)
            logger.info(f"finetuning from {args.finetune_from}")
        if trainer.latest_step(ckpt_dir) is not None:
            trainer.restore(ckpt_dir)
            logger.info(
                f"restored alternating ckpt at iter {trainer.total_iter} "
                f"(stage={trainer.stage}, alter_iter={trainer.alter_iter})"
            )
        # scale each dataset's ims_per_gpu by the local device count — the
        # same global-batch accounting as the seg Trainer
        # (engine/trainer.py:292-296)
        loader = get_data_loader(
            configer, "train", rank=jax.process_index(), world=jax.process_count(),
            batch_multiplier=mesh.devices.size // jax.process_count(),
        )
        max_iter = trainer.max_iter
        tm, lm = TimeMeter(max_iter), AvgMeter()

        def eval_now(tag):
            """Stage-switch eval (reference :548-569, eval_model_contrast on
            the live model). Dataset trouble must not kill a flagship run."""
            try:
                from mds_tpu.data.loader import get_data_loader as gdl
                from mds_tpu.evaluation.evaluator import eval_model

                variables = {
                    "params": trainer.seg_state.params,
                    "batch_stats": trainer.seg_state.batch_stats,
                    "buffers": trainer.seg_buffers,
                }
                loaders = gdl(configer, "eval", rank=jax.process_index(),
                              world=jax.process_count())
                mious = eval_model(
                    configer, trainer.seg_model, variables, loaders,
                    mode="contrast",
                )
                logger.info(f"[eval @{tag}] mIoUs: "
                            + " ".join(f"{m:.4f}" for m in mious))
            except Exception as e:  # missing datasets etc.
                logger.warning(f"stage-switch eval failed: {e}")

        try:
            for it in range(trainer.total_iter, max_iter):
                prev_stage = trainer.stage
                metrics = trainer.step(next(loader))
                tm.update()
                lm.update(metrics["loss"])
                if (it + 1) % 100 == 0:
                    t, eta = tm.get()
                    logger.info(
                        f"iter {it + 1}/{max_iter} stage={trainer.stage} "
                        f"loss={lm.get()[0]:.4f} time={t:.2f} eta={eta}"
                    )
                if (it + 1) % ckpt_interval == 0:
                    trainer.save(ckpt_dir)
                if eval_at_switch and trainer.stage != prev_stage:
                    eval_now(f"iter{it + 1}:{prev_stage}->{trainer.stage}")
        finally:
            loader.close()
            trainer.save(ckpt_dir)
            logger.info(f"saved alternating ckpt at iter {trainer.total_iter}")
    else:
        from mds_tpu.engine.trainer import Trainer

        trainer = Trainer(configer, work_dir=args.work_dir)
        if args.finetune_from:
            trainer.finetune_from(args.finetune_from)
        trainer.restore_if_available()
        trainer.train()


if __name__ == "__main__":
    main()
