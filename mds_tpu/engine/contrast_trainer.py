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

        # num_prototype > 1: per-pixel sinkhorn prototype assignment
        # (reference lib/loss/loss_cross_datasets.py:135-193 via
        # lib/prototype_learning.py; P slots per unified class)
        self.P = int(g("contrast", "num_prototype", d=1))
        self.coefficient = float(g("contrast", "coefficient", d=0.999))
        self.temperature = float(g("contrast", "temperature", d=0.07))
        self.prototypes = None
        if self.P > 1:
            from mds_tpu.data.class_remap import ClassRemapOneHotLabel

            self.remap_onehot = ClassRemapOneHotLabel(configer)
            # trunc-normal slots, L2-normalized (the reference model's
            # `prototypes` buffer init, lib/models/bisenetv2_contrast.py)
            protos = 0.02 * jax.random.truncated_normal(
                jax.random.PRNGKey(42), -2.0, 2.0, (U, self.P, D), jnp.float32
            )
            self.prototypes = protos / jnp.maximum(
                jnp.linalg.norm(protos, axis=-1, keepdims=True), 1e-12
            )

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
        if self.prototypes is not None:
            self.prototypes = replicate(self.prototypes, self.mesh)
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

        P = self.P
        U = self.model.num_unify_classes
        coeff, temp = self.coefficient, self.temperature

        def loss_fn(params, batch_stats, bank, protos, ims, lbs, rng, cw,
                    cur_iter):
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
            preds_small = []
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
                if P == 1:
                    c_total = c_total + contrast(
                        embed.astype(jnp.float32), lb_small, pred_small,
                        bank, rngs[i],
                    )
                embeds.append(embed)
                lb_unis.append(lb_small)
                preds_small.append(pred_small)

            new_protos = protos
            if P > 1:
                # sinkhorn prototype assignment over the WHOLE multi-dataset
                # batch at once (reference runs prototype_learning on the
                # concatenated batch, loss_cross_datasets.py:133-135)
                from mds_tpu.losses.helpers import (
                    multi_label_cross_entropy,
                    weighted_nll_plus_loss,
                )
                from mds_tpu.ops.prototype_learning import prototype_learning

                D = embeds[0].shape[-1]
                emb_all = jnp.concatenate(
                    [e.astype(jnp.float32).reshape(-1, D) for e in embeds])
                gt_all = jnp.concatenate(
                    [l.reshape(-1) for l in lb_unis]).astype(jnp.int32)
                correct_all = jnp.concatenate([
                    (p == l.astype(p.dtype)).reshape(-1)
                    for p, l in zip(preds_small, lb_unis)
                ])
                res = prototype_learning(
                    jax.lax.stop_gradient(protos), emb_all, gt_all,
                    correct_all, update_prototype=True, coefficient=coeff,
                    rng=jax.random.fold_in(rng, 17),
                )
                new_protos = jax.lax.stop_gradient(res.prototypes)
                target_1h = jax.nn.one_hot(
                    res.proto_target, U * P, dtype=jnp.bool_
                ) & (gt_all < U)[:, None]

                # per-dataset multi-proto remap + multi-label contrast CE
                # (AdaptiveMultiProtoRemapping + PixelContrastLossMulProto,
                # loss_cross_datasets.py:184-205) and the multi-hot seg
                # supervision (seg_mask_mul → WeightedNLLPlusLoss role)
                seg_mul_total = 0.0
                off = 0
                for i in range(self.n):
                    e = embeds[i]
                    B, h, w = e.shape[0], e.shape[1], e.shape[2]
                    n_i = B * h * w
                    sim_i = res.proto_logits[off:off + n_i]
                    t1h_i = target_1h[off:off + n_i]
                    off += n_i
                    cm, seg_mask = self.remap_onehot.ContrastRemapping(
                        lbs[i], None, None, i, cur_iter=cur_iter,
                        sim=sim_i.reshape(B, h, w, U * P),
                    )
                    pos = cm.reshape(-1, U * P) | t1h_i
                    c_total = c_total + multi_label_cross_entropy(
                        sim_i / temp, pos
                    )
                    # multi-hot seg supervision at full res; up-sample the
                    # 1/8 seg logits' label mask is already full-res
                    seg_mul_total = seg_mul_total + weighted_nll_plus_loss(
                        out["seg"][i], seg_mask.astype(jnp.float32)
                    )
                # warmup keeps the single-label OHEM path (is_warmup branch,
                # loss_cross_datasets.py:160-176); after warmup the
                # remap-driven multi-hot seg loss takes over
                is_warm = (cw == 0.0).astype(jnp.float32)
                total = is_warm * total + (1.0 - is_warm) * seg_mul_total
                metrics["seg_mul_loss"] = seg_mul_total

            metrics["seg_loss"] = total
            metrics["contrast_loss"] = c_total
            total = total + cw * c_total
            metrics["loss"] = total
            return total, (
                mut["batch_stats"], metrics, embeds, lb_unis, new_protos)

        def step_fn(state: TrainState, bank: MemoryBank, teacher, protos,
                    ims, lbs, rng, cw, cur_iter):
            rng = jax.random.fold_in(rng, state.step)
            # the queues are read-only negatives for the loss
            frozen_bank = jax.lax.stop_gradient(bank)
            grads, (new_stats, metrics, embeds, lb_unis, protos) = jax.grad(
                loss_fn, has_aux=True
            )(state.params, state.batch_stats, frozen_bank, protos, ims, lbs,
              rng, cw, cur_iter)
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
            return new_state, bank, teacher, protos, metrics

        # teacher is NOT donated: at init it aliases state.params (same
        # buffers) and double-donation is an XLA error
        self._step = jax.jit(step_fn, donate_argnums=(0, 1))

        # P == 1 has no prototype state: keep a zero-size placeholder so the
        # jitted signature stays uniform
        self._proto_placeholder = (
            jnp.zeros((0,), jnp.float32) if self.P == 1 else None
        )

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
        protos = (self.prototypes if self.prototypes is not None
                  else self._proto_placeholder)
        (self.state, self.bank, self.teacher, protos,
         metrics) = self._step(
            self.state, self.bank, self.teacher, protos, ims, lbs, rng, cw,
            jnp.float32(it),
        )
        if self.prototypes is not None:
            self.prototypes = protos
        # device scalars: callers float() at their log interval (see
        # utils.meters.AvgMeter — no per-step device sync)
        return dict(metrics)

    def finetune_from(self, path: str):
        """Load weights (and the prototype buffer) from a reference contrast
        checkpoint (`--finetune_from`, tools/train_amp_contrast_single.py) or
        an orbax directory. Optimizer state is NOT restored — finetune
        semantics."""
        from mds_tpu.parallel.mesh import replicate

        if path.endswith((".pth", ".pt")):
            import torch

            from mds_tpu.deploy import torch_import as ti

            sd = torch.load(path, map_location="cpu")
            if isinstance(sd, dict) and "model_state_dict" in sd:
                sd = sd["model_state_dict"]
            layout = ti.detect_torch_layout(sd)
            if layout != "bisenetv2_contrast":
                raise ValueError(
                    f"mode=contrast finetune expects a contrast-layout "
                    f"checkpoint, got {layout!r}"
                )
            params, stats, extras = ti.bisenetv2_contrast_from_torch(
                sd, n_bn=int(self.configer.get("n_bn", default=self.n)),
            )
            v = {"params": dict(self.state.params),
                 "batch_stats": dict(self.state.batch_stats)}
            v = ti.merge_subtree(v, params, "params")
            v = ti.merge_subtree(v, stats, "batch_stats")
            self.state = self.state.replace(
                params=replicate(
                    jax.tree_util.tree_map(jnp.asarray, v["params"]),
                    self.mesh),
                batch_stats=replicate(
                    jax.tree_util.tree_map(jnp.asarray, v["batch_stats"]),
                    self.mesh),
            )
            if self.prototypes is not None and "prototypes" in extras:
                want = tuple(self.prototypes.shape)
                got = tuple(extras["prototypes"].shape)
                if want == got:
                    self.prototypes = replicate(
                        jnp.asarray(extras["prototypes"]), self.mesh)
            if self.teacher is not None:
                self.teacher = jax.tree_util.tree_map(
                    jnp.array,
                    {"params": self.state.params,
                     "batch_stats": self.state.batch_stats},
                )
        else:
            self.state, _ = self.ckpt.restore(self.state)

    # ------------------------------------------------------------ persistence
    def _extras(self):
        extras = {"bank_feats": self.bank.feats, "bank_ptr": self.bank.ptr,
                  "bank_count": self.bank.count}
        if self.teacher is not None:
            extras["teacher"] = self.teacher
        if self.prototypes is not None:
            extras["prototypes"] = self.prototypes
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
        if self.prototypes is not None:
            self.prototypes = extras["prototypes"]
