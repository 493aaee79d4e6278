"""Config-driven trainer: one stage machine replacing ~30 reference scripts.

Reference trainers (tools/train.py, train_amp.py, train_ltbgnn_*.py, …) all
share the same skeleton: set_model / set_optimizer / set_lr_scheduler /
set_meters then an iteration loop with interleaved per-dataset batches,
periodic logging, checkpointing and eval (SURVEY.md §2.5). Here that skeleton
is one Trainer whose stages are config:

  stage 'seg'  — supervised seg training (BiSeNetV1/V2 heads or SemsegModel
                 prototypes), OHEM CE, SGD warmup-poly;
  stage 'gnn'  — (GNN-era) alternating graph-network optimization; wired in
                 mds_tpu.engine.gnn_trainer.

Data parallelism: batches sharded over the mesh's `data` axis; params
replicated; XLA inserts the gradient all-reduce (= DDP).
"""

from __future__ import annotations

import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mds_tpu.config import Configer
from mds_tpu.data.labels import get_spec
from mds_tpu.data.loader import get_data_loader
from mds_tpu.engine.checkpoints import CheckpointManager
from mds_tpu.engine.lr_schedule import warmup_poly_lr
from mds_tpu.engine.optim import build_optimizer
from mds_tpu.engine.train_step import init_train_state, make_seg_train_step
from mds_tpu.engine.train_state import TrainState
from mds_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from mds_tpu.registry import MODELS
from mds_tpu.utils.logger import print_log_msg, setup_logger
from mds_tpu.utils.meters import AvgMeter, TimeMeter


def build_model(configer: Configer, dtype=jnp.bfloat16):
    import mds_tpu.models  # noqa: F401 — populate the MODELS registry

    name = configer.get("model_name", default="bisenetv2")
    n = configer.n_datasets
    n_classes = tuple(configer.n_cats(i) for i in range(n))
    cls = MODELS[name]
    kwargs = dict(configer.get("model_kwargs", default={}) or {})
    if name in ("bisenetv2", "bisenetv1"):
        return cls(n_classes=n_classes, n_bn=n, dtype=dtype, **kwargs)
    return cls(configer=configer, dtype=dtype, **kwargs)


def dataset_stats(configer: Configer):
    """Per-dataset (mean, std) for on-device normalization."""
    means, stds = [], []
    for i in range(configer.n_datasets):
        spec_name = configer.dataset_cfg(i).get("spec")
        if spec_name:
            spec = get_spec(spec_name)
            means.append(spec.mean)
            stds.append(spec.std)
        else:
            means.append(np.zeros(3, np.float32))
            stds.append(np.ones(3, np.float32))
    return means, stds


class Trainer:
    def __init__(self, configer: Configer, work_dir: str = "./res",
                 compute_dtype=jnp.bfloat16, mesh=None):
        self.configer = configer
        self.logger = setup_logger("mds_tpu", work_dir)
        self.mesh = mesh if mesh is not None else make_mesh()
        self.compute_dtype = compute_dtype
        self.work_dir = work_dir

        self.max_iter = int(configer.get("lr", "max_iter", default=1000))
        lr_start = float(configer.get("lr", "lr_start", default=5e-3))
        self.schedule = warmup_poly_lr(
            lr_start,
            float(configer.get("lr", "lr_power", default=0.9)),
            self.max_iter,
            warmup_iter=int(configer.get("lr", "warmup_iters", default=500)),
            warmup_ratio=float(configer.get("lr", "warmup_ratio", default=0.1)),
            warmup=configer.get("lr", "warmup", default="exp"),
        )
        self.tx = build_optimizer(configer, self.schedule)
        # SegmentHead dropout masks from the TPU hardware PRNG (+1 img/s at
        # bs16 512×1024, measured 2026-08-18); train.hw_dropout=false opts
        # back into the portable threefry masks.
        from mds_tpu.models.layers import auto_dropout_impl, set_dropout_impl

        if bool(configer.get("train", "hw_dropout", default=True)):
            set_dropout_impl(auto_dropout_impl())
        self.model = build_model(configer, dtype=compute_dtype)

        crop = configer.get("train", "cropsize", default=[512, 512])
        n = configer.n_datasets
        sample = [
            np.zeros((1, crop[0], crop[1], 3), np.float32) for _ in range(n)
        ]
        self.state, self.buffers = init_train_state(
            self.model, self.tx, sample, with_buffers=True
        )
        self.state = replicate(self.state, self.mesh)
        # flax 'buffers' collection (bipartite graphs for prototype models;
        # requires_grad=False ParameterLists in the reference, semseg.py:288);
        # overwritten by finetune_from on snp checkpoints and persisted in
        # the checkpoint extras
        if self.buffers:
            self.buffers = replicate(self.buffers, self.mesh)

        means, stds = dataset_stats(configer)
        # use_sync_bn=False (the reference's default, configs/bisenetv2_city
        # .py) selects per-device local BN moments via shard_map; our default
        # is True (global-batch SyncBN — free under a sharded batch)
        sync_bn = configer.get("use_sync_bn", default=True)
        # train.fused_up_loss: phase-decomposed upsample+OHEM (exact; skips
        # the full-res head volumes — BiSeNetV2-family models only)
        fused_up = bool(configer.get("train", "fused_up_loss", default=False))
        self.step_fn = make_seg_train_step(
            self.model, self.tx, means, stds,
            ohem_thresh=float(configer.get("loss", "ohem_thresh", default=0.7)),
            compute_dtype=compute_dtype,
            mesh=self.mesh,
            local_bn=not sync_bn,
            fused_up_loss=fused_up,
        )
        self.ckpt = CheckpointManager(
            f"{work_dir}/ckpt",
            save_interval=int(configer.get("train", "ckpt_interval", default=1000)),
        )

    def _ckpt_extras(self) -> Optional[Dict[str, Any]]:
        return {"buffers": self.buffers} if self.buffers else None

    def restore_if_available(self):
        if self.ckpt.latest_step() is None:
            return
        try:
            self.state, extras = self.ckpt.restore(
                self.state, abstract_extras=self._ckpt_extras()
            )
        except Exception:
            # pre-r3 checkpoints lack the buffers extras — restore state only
            self.state, extras = self.ckpt.restore(self.state)
            self.logger.warning(
                "checkpoint has no 'buffers' extras; bipartite graphs keep "
                "their init values"
            )
        if extras and extras.get("buffers"):
            self.buffers = extras["buffers"]
        self.logger.info(f"restored checkpoint at step {int(self.state.step)}")

    def variables(self) -> Dict[str, Any]:
        """Full eval-ready variables dict (params + batch_stats + buffers)."""
        v = {"params": self.state.params, "batch_stats": self.state.batch_stats}
        if self.buffers:
            v["buffers"] = self.buffers
        return v

    def finetune_from(self, path: str):
        """Load weights only (reference `--finetune_from`,
        tools/train_amp.py:48,127-129). `.pth` files go through the torch
        layout remap (deploy/torch_import.py); anything else is an orbax
        checkpoint directory."""
        if path.endswith((".pth", ".pt")):
            import torch

            from mds_tpu.deploy import torch_import as ti

            sd = torch.load(path, map_location="cpu")
            if isinstance(sd, dict) and "model_state_dict" in sd:
                sd = sd["model_state_dict"]
            layout = ti.detect_torch_layout(sd)
            if layout == "semseg":
                # reference SemsegModel / snp_rn18 checkpoint — keep the
                # learned bipartite graphs too (flax 'buffers' collection;
                # consumers like AlternatingTrainer/apply read self.buffers)
                params, stats, buffers = ti.semseg_from_torch(sd)
                self.state = self.state.replace(
                    params=jax.tree_util.tree_map(jnp.asarray, params),
                    batch_stats=jax.tree_util.tree_map(jnp.asarray, stats),
                )
                self.buffers = jax.tree_util.tree_map(jnp.asarray, buffers)
            elif layout in ("hrnet_ref", "hrnet_imagenet"):
                # HRNet layout: ImageNet classification ckpt
                # (transition1.{i}.0.weight) or the reference's multi-dataset
                # layout (conv1.conv.weight + per-dataset bn lists)
                if layout == "hrnet_ref":
                    tp, ts = ti.hrnet_ref_from_torch(
                        sd, n_bn=int(self.configer.get("n_bn", default=1))
                    )
                else:
                    tp, ts = ti.hrnet_backbone_from_torch(
                        sd, n_bn=int(self.configer.get("n_bn", default=1))
                    )
                v = {"params": dict(self.state.params),
                     "batch_stats": dict(self.state.batch_stats)}
                sub = "backbone" if "backbone" in v["params"] else None
                v = ti.merge_subtree(
                    v, tp, *(("params", sub) if sub else ("params",))
                )
                v = ti.merge_subtree(
                    v, ts, *(("batch_stats", sub) if sub else ("batch_stats",))
                )
                self.state = self.state.replace(
                    params=jax.tree_util.tree_map(jnp.asarray, v["params"]),
                    batch_stats=jax.tree_util.tree_map(
                        jnp.asarray, v["batch_stats"]
                    ),
                )
            elif layout == "resnet18":
                # torchvision ImageNet ResNet18 → trunk graft: BiSeNetV1's
                # ContextPath resnet (cp/resnet) or SwiftNet's backbone
                v = {"params": dict(self.state.params),
                     "batch_stats": dict(self.state.batch_stats)}
                if "cp" in v["params"] and "resnet" in v["params"]["cp"]:
                    tp, ts = ti.resnet18_torchvision_to_resnet(sd)
                    v = ti.merge_subtree(v, tp, "params", "cp", "resnet")
                    v = ti.merge_subtree(v, ts, "batch_stats", "cp", "resnet")
                    self.state = self.state.replace(
                        params=jax.tree_util.tree_map(
                            jnp.asarray, v["params"]
                        ),
                        batch_stats=jax.tree_util.tree_map(
                            jnp.asarray, v["batch_stats"]
                        ),
                    )
                    self.logger.info(f"finetuning from {path}")
                    return
                tp, ts = ti.resnet18_torchvision_to_swiftnet(sd)
                sub = "backbone" if "backbone" in v["params"] else None
                v = ti.merge_subtree(
                    v, tp, *( ("params", sub) if sub else ("params",))
                )
                v = ti.merge_subtree(
                    v, ts, *( ("batch_stats", sub) if sub else ("batch_stats",))
                )
                self.state = self.state.replace(
                    params=jax.tree_util.tree_map(jnp.asarray, v["params"]),
                    batch_stats=jax.tree_util.tree_map(
                        jnp.asarray, v["batch_stats"]
                    ),
                )
            elif layout == "bisenetv1":
                params, stats = ti.bisenetv1_from_torch(
                    sd, aux="conv_out16.conv.conv.weight" in sd
                )
                self.state = self.state.replace(
                    params=jax.tree_util.tree_map(jnp.asarray, params),
                    batch_stats=jax.tree_util.tree_map(jnp.asarray, stats),
                )
            elif layout == "swin":
                # Swin backbone ckpt → graft into the model's swin subtree
                v = {"params": dict(self.state.params),
                     "batch_stats": dict(self.state.batch_stats)}
                tp = ti.swin_from_torch(sd)
                sub = "swin" if "swin" in v["params"] else None
                v = ti.merge_subtree(
                    v, tp, *(("params", sub) if sub else ("params",))
                )
                self.state = self.state.replace(
                    params=jax.tree_util.tree_map(jnp.asarray, v["params"]),
                )
            else:
                params, stats = ti.bisenetv2_from_torch(
                    sd, n_bn=self.configer.n_datasets
                )
                self.state = self.state.replace(
                    params=jax.tree_util.tree_map(jnp.asarray, params),
                    batch_stats=jax.tree_util.tree_map(jnp.asarray, stats),
                )
        else:
            restored, _ = CheckpointManager(path).restore(self.state)
            self.state = self.state.replace(
                params=restored.params, batch_stats=restored.batch_stats
            )
        self.logger.info(f"finetuning from {path}")

    def train(self, loader=None, log_interval: int | None = None):
        configer = self.configer
        if log_interval is None:
            # reference msg_iter (train_amp.py:100): config-driven cadence
            log_interval = int(
                configer.get("train", "log_interval", default=100)
            )
        if loader is None:
            # ims_per_gpu is per device (reference per-GPU batch); this
            # process feeds all local devices of the mesh
            loader = get_data_loader(
                configer, "train",
                rank=jax.process_index(), world=jax.process_count(),
                batch_multiplier=self.mesh.devices.size // jax.process_count(),
            )
        from mds_tpu.utils.metrics_writer import MetricsWriter

        metrics_writer = MetricsWriter(f"{self.work_dir}/runs")
        time_meter = TimeMeter(self.max_iter)
        loss_meters: Dict[str, AvgMeter] = {"loss": AvgMeter()}
        rng = jax.random.PRNGKey(int(configer.get("seed", default=0) or 0))
        start = int(self.state.step)
        it = start
        try:
            for it in range(start, self.max_iter):
                batch = next(loader)
                dev_batch = shard_batch(
                    {"ims": list(batch["ims"]), "lbs": list(batch["lbs"])}, self.mesh
                )
                self.state, metrics = self.step_fn(
                    self.state, dev_batch["ims"], dev_batch["lbs"], rng
                )
                time_meter.update()
                # device scalar — AvgMeter resolves at the log interval (no
                # per-step sync; keeps dispatch asynchronous through the
                # tunnel)
                loss_meters["loss"].update(metrics["loss"])
                if (it + 1) % log_interval == 0:
                    lr = float(self.schedule(it))
                    print_log_msg(
                        self.logger, it, self.max_iter, lr, time_meter, loss_meters
                    )
                    metrics_writer.write(
                        it + 1, {"seg": float(metrics["loss"]), "lr": lr},
                        group="loss",
                    )
                self.ckpt.maybe_save(self.state, extras=self._ckpt_extras())
        finally:
            metrics_writer.close()
            if hasattr(loader, "close"):
                loader.close()
        self.ckpt.maybe_save(self.state, extras=self._ckpt_extras(), force=True)
        self.ckpt.wait()
        return self.state


def train_from_config(config_path: str, overrides: Optional[List[str]] = None,
                      work_dir: str = "./res", max_iter: Optional[int] = None):
    configer = Configer(config_file=config_path, args_parser=overrides or [])
    if max_iter is not None:
        configer.update(["lr", "max_iter"], max_iter)
    t = Trainer(configer, work_dir=work_dir)
    t.restore_if_available()
    return t.train()
