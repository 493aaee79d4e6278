"""Pixel-contrast pre-training stage (memory bank + EMA teacher).

Reference: tools/train_amp_contrast_single.py (638 LoC) — the published
contrast workload: BiSeNetV2_Contrast over a pre-unified label space
(ClassRemap), ContrastCELoss = seg OHEM CE + loss_weight × PixelContrastLoss
against per-class memory-bank queues (lib/loss/loss_contrast_mem.py:198-301),
per-step memory-bank enqueue (lib/module/memory_bank_helper.py,
dequeue_and_enqueue :203-282), EMA teacher (set_ema_model :110-122, keys for
the queues come from the teacher), and a contrast warmup schedule — the
contrast term is off while iter < lr.warmup_iters (with_embed gate :478-482).

TPU-native shape: one jitted step carries (TrainState, MemoryBank, teacher
tree) functionally; the contrast weight enters as a traced scalar so the
warmup gate doesn't recompile; the bank enqueue uses the teacher's (or
stop-gradded student's) embeddings.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mds_tpu.config import Configer
from mds_tpu.data.class_remap import ClassRemap
from mds_tpu.engine.checkpoints import CheckpointManager
from mds_tpu.engine.ema import ema_update
from mds_tpu.engine.lr_schedule import warmup_poly_lr
from mds_tpu.engine.optim import build_optimizer
from mds_tpu.engine.train_state import TrainState
from mds_tpu.engine.train_step import init_train_state, normalize_images
from mds_tpu.engine.trainer import dataset_stats
from mds_tpu.losses.contrast import (
    MemoryBank,
    PixelContrastLoss,
    memory_bank_push,
)
from mds_tpu.losses.ohem_ce import OhemCELoss
from mds_tpu.models.bisenetv2_contrast import BiSeNetV2Contrast


class ContrastTrainer:
    """train.mode == 'contrast' stage (reference train_amp_contrast_single)."""

    def __init__(self, configer: Configer, work_dir: str = "./res",
                 compute_dtype=jnp.bfloat16, mesh=None):
        self.configer = configer
        self.work_dir = work_dir
        g = lambda *k, d=None: configer.get(*k, default=d)
        self.n = configer.n_datasets
        self.max_iter = int(g("lr", "max_iter", d=1000))
        self.warmup_iters = int(g("lr", "warmup_iters", d=10))
        self.loss_weight = float(g("contrast", "loss_weight", d=0.1))
        self.use_ema = bool(g("use_ema", d=False))
        self.ema_momentum = float(g("contrast", "ema_momentum", d=0.999))

        self.model = BiSeNetV2Contrast.from_configer(configer, dtype=compute_dtype)
        self.remap = ClassRemap(configer)
        U = self.model.num_unify_classes
        D = self.model.proj_dim
        mem = int(g("contrast", "memory_bank_size", d=64))
        self.bank = MemoryBank.create(U, mem, D)

        schedule = warmup_poly_lr(
            float(g("lr", "lr_start", d=5e-3)),
            float(g("lr", "lr_power", d=0.9)),
            self.max_iter,
            warmup_iter=self.warmup_iters,
            warmup_ratio=float(g("lr", "warmup_ratio", d=0.1)),
        )
        self.tx = build_optimizer(configer, schedule)

        from mds_tpu.parallel.mesh import make_mesh, replicate

        self.mesh = mesh if mesh is not None else make_mesh()
        crop = g("train", "cropsize", d=[64, 64])
        sample = [np.zeros((1, crop[0], crop[1], 3), np.float32)] * self.n
        self.state = init_train_state(self.model, self.tx, sample)
        self.state = replicate(self.state, self.mesh)
        self.bank = replicate(self.bank, self.mesh)
        # teacher owns COPIES of the student buffers: the jitted step donates
        # the student state, and XLA rejects donated-and-used aliasing
        self.teacher = (
            jax.tree_util.tree_map(
                jnp.array,
                {"params": self.state.params,
                 "batch_stats": self.state.batch_stats},
            )
            if self.use_ema else None
        )

        self.criteria = OhemCELoss(float(g("loss", "ohem_thresh", d=0.7)))
        self.contrast_criterion = PixelContrastLoss(configer)
        means, stds = dataset_stats(configer)
        self._build_step(compute_dtype, means, stds)
        self.ckpt = CheckpointManager(
            f"{work_dir}/ckpt_contrast",
            save_interval=int(g("train", "ckpt_interval", d=1000)),
        )

    # ------------------------------------------------------------------ step
    def _build_step(self, compute_dtype, means, stds):
        model, criteria, contrast = self.model, self.criteria, self.contrast_criterion
        means = [jnp.asarray(m) for m in means]
        stds = [jnp.asarray(s) for s in stds]
        # unified-space label LUTs (SingleSegRemapping — unique mappings; the
        # reference remaps via ClassRemap before its CE, :220-242)
        luts = [jnp.asarray(self.remap._single_luts[i]) for i in range(self.n)]
        use_ema, ema_m = self.use_ema, self.ema_momentum
        aux_weight = 1.0

        def loss_fn(params, batch_stats, bank, ims, lbs, rng, cw):
            xs = normalize_images(ims, means, stds, dtype=compute_dtype)
            out, mut = model.apply(
                {"params": params, "batch_stats": batch_stats},
                xs, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            total = 0.0
            metrics: Dict[str, jax.Array] = {}
            c_total = 0.0
            rngs = jax.random.split(rng, self.n)
            embeds = []
            lb_unis = []
            for i in range(self.n):
                seg = out["seg"][i]  # (B,H,W,U) full res
                lb_uni = luts[i][lbs[i].astype(jnp.int32)]
                total = total + criteria(seg, lb_uni)
                for aux_set in out.get("aux", []):
                    if aux_set[i] is not None:
                        total = total + aux_weight * criteria(aux_set[i], lb_uni)
                embed = out["embed"][i]  # (B,h,w,D) at 1/8
                f = seg.shape[1] // embed.shape[1]
                lb_small = lb_uni[:, ::f, ::f]
                pred_small = jax.lax.stop_gradient(
                    jnp.argmax(seg[:, ::f, ::f], axis=-1)
                )
                c_total = c_total + contrast(
                    embed.astype(jnp.float32), lb_small, pred_small,
                    bank, rngs[i],
                )
                embeds.append(embed)
                lb_unis.append(lb_small)
            metrics["seg_loss"] = total
            metrics["contrast_loss"] = c_total
            total = total + cw * c_total
            metrics["loss"] = total
            return total, (mut["batch_stats"], metrics, embeds, lb_unis)

        def step_fn(state: TrainState, bank: MemoryBank, teacher, ims, lbs,
                    rng, cw):
            rng = jax.random.fold_in(rng, state.step)
            # the queues are read-only negatives for the loss
            frozen_bank = jax.lax.stop_gradient(bank)
            grads, (new_stats, metrics, embeds, lb_unis) = jax.grad(
                loss_fn, has_aux=True
            )(state.params, state.batch_stats, frozen_bank, ims, lbs, rng, cw)
            updates, opt_state = self.tx.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            new_state = TrainState(
                params=params, batch_stats=new_stats,
                opt_state=opt_state, step=state.step + 1,
            )
            # teacher EMA + bank enqueue (keys from the teacher when enabled,
            # reference :462-474; stop-gradded student otherwise)
            if use_ema:
                teacher = ema_update(
                    teacher, {"params": params, "batch_stats": new_stats},
                    ema_m,
                )
                t_out = model.apply(
                    {"params": teacher["params"],
                     "batch_stats": teacher["batch_stats"]},
                    normalize_images(ims, means, stds, dtype=compute_dtype),
                    train=False,
                )
                keys = t_out["embed"]
            else:
                keys = [jax.lax.stop_gradient(e) for e in embeds]
            push_rng = jax.random.fold_in(rng, 1)
            for i in range(self.n):
                D = keys[i].shape[-1]
                bank = memory_bank_push(
                    bank, keys[i].astype(jnp.float32).reshape(-1, D),
                    lb_unis[i].reshape(-1), push_rng,
                )
            return new_state, bank, teacher, metrics

        # teacher is NOT donated: at init it aliases state.params (same
        # buffers) and double-donation is an XLA error
        self._step = jax.jit(step_fn, donate_argnums=(0, 1))

    def step(self, batch, it: Optional[int] = None) -> Dict[str, float]:
        from mds_tpu.parallel.mesh import shard_batch

        it = int(self.state.step) if it is None else it
        # contrast warmup gate (reference is_warmup, :478-482)
        cw = jnp.float32(self.loss_weight if it >= self.warmup_iters else 0.0)
        rng = jax.random.PRNGKey(0)
        n_dev = int(self.mesh.devices.size)
        if all(np.shape(x)[0] % n_dev == 0 for x in batch["ims"]):
            dev = shard_batch(
                {"ims": list(batch["ims"]), "lbs": list(batch["lbs"])},
                self.mesh,
            )
            ims, lbs = dev["ims"], dev["lbs"]
        else:  # tiny per-dataset batches (tests): single-device fallback
            ims = [jnp.asarray(x) for x in batch["ims"]]
            lbs = [jnp.asarray(x) for x in batch["lbs"]]
        self.state, self.bank, self.teacher, metrics = self._step(
            self.state, self.bank, self.teacher, ims, lbs, rng, cw
        )
        # device scalars: callers float() at their log interval (see
        # utils.meters.AvgMeter — no per-step device sync)
        return dict(metrics)

    # ------------------------------------------------------------ persistence
    def _extras(self):
        extras = {"bank_feats": self.bank.feats, "bank_ptr": self.bank.ptr,
                  "bank_count": self.bank.count}
        if self.teacher is not None:
            extras["teacher"] = self.teacher
        return extras

    def maybe_save(self) -> bool:
        """Periodic checkpoint at train.ckpt_interval (the reference saves
        every 10k iters, train_amp_contrast_single.py)."""
        return self.ckpt.maybe_save(self.state, extras=self._extras())

    def save(self, step: Optional[int] = None, force: bool = True):
        extras = self._extras()
        self.ckpt.maybe_save(self.state, extras=extras, force=force)
        self.ckpt.wait()

    def restore(self):
        extras = self._extras()
        self.state, extras = self.ckpt.restore(
            self.state, abstract_extras=extras
        )
        self.bank = MemoryBank(
            feats=extras["bank_feats"], ptr=extras["bank_ptr"],
            count=extras["bank_count"],
        )
        if self.teacher is not None:
            self.teacher = extras["teacher"]
