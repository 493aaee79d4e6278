"""KMeans-era cross-datasets loss (pre-GNN prototype learning).

Reference: lib/loss/loss_cross_datasets.py:349-660
(`CrossDatasetsCELoss_KMeans`) — the contrast-era workload that learns the
unified prototypes directly from pixel embeddings:
  * warmup: multi-hot NLL over every admissible unified class per pixel
    (AdaptiveSegRemapping → NLLPlus, :430-446);
  * main phase: per-class memory-bank enqueue — single-mapped embeddings
    directly (:414-417), multi-mapped pixels under their prototype-assigned
    class (AdaptiveKMeansProtoLearning's constrained assignment, :579-660);
    prototype refresh = per-class EMA toward the normalized bank mean,
    gated on that class's bank holding real features (IsInitMemoryBank role,
    :414-424 + coefficient mix); temperature-scaled prototype logits
    supervise both the multi-proto contrast term (ContrastRemapping-
    sharpened + single one-hot labels, :448-457, loss_contrast_mem.py:
    376-423 divides by contrast.temperature) and the seg head through the
    sharpened seg mask (:458-476) — aux heads included (:465-476).

TPU-native shape: per-dataset list inputs (no dataset_ids gather), the
memory bank and prototypes travel functionally through the step, and every
remap is a ClassRemapOneHotLabel LUT/argmax (static shapes).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from mds_tpu.data.class_remap import ClassRemapOneHotLabel
from mds_tpu.losses.contrast import MemoryBank, memory_bank_push


def multi_hot_nll(logits: jax.Array, mask: jax.Array) -> jax.Array:
    """−log of the MEAN admissible softmax probability over pixels with a
    non-empty mask — the NLLPlus reduction (loss_helper.py:606-628 computes
    one log of the batch-mean probability, not a per-pixel mean of logs).
    logits (B,H,W,C) or (N,C); mask same shape bool."""
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    tot = jnp.sum(p * mask.astype(jnp.float32), axis=-1)
    valid = jnp.any(mask, axis=-1)
    mean_p = jnp.sum(jnp.where(valid, tot, 0.0)) / jnp.maximum(
        jnp.sum(valid.astype(jnp.float32)), 1.0
    )
    return -jnp.log(jnp.maximum(mean_p, 1e-12))


def update_prototypes(bank: MemoryBank, prototypes: jax.Array,
                      coefficient: float) -> jax.Array:
    """Per-class refresh: normalize(coef·old + (1−coef)·normalize(mean of
    the REAL bank entries)); classes whose queue holds no real features keep
    their old prototype (IsInitMemoryBank gate, reference :414-424). The
    mean masks the placeholder init slots via bank.count."""
    C, M, D = bank.feats.shape
    written = (
        jnp.arange(M)[None, :] < bank.count[:, None]
    ).astype(jnp.float32)  # (C, M)
    mean = jnp.sum(bank.feats * written[..., None], axis=1) / jnp.maximum(
        bank.count[:, None].astype(jnp.float32), 1.0
    )
    mean = mean / jnp.maximum(
        jnp.linalg.norm(mean, axis=-1, keepdims=True), 1e-12
    )
    mixed = coefficient * prototypes + (1.0 - coefficient) * mean
    mixed = mixed / jnp.maximum(
        jnp.linalg.norm(mixed, axis=-1, keepdims=True), 1e-12
    )
    initialized = bank.count > 0
    return jnp.where(initialized[:, None], mixed, prototypes)


def _match_hw(mask: jax.Array, hw) -> jax.Array:
    """Nearest-resize a (B,H,W,C) bool mask to spatial size hw (robust to
    non-multiple sizes; strided slicing only when exact)."""
    if mask.shape[1:3] == tuple(hw):
        return mask
    if (
        mask.shape[1] % hw[0] == 0 and mask.shape[2] % hw[1] == 0
        and mask.shape[1] >= hw[0]
    ):
        f1, f2 = mask.shape[1] // hw[0], mask.shape[2] // hw[1]
        return mask[:, ::f1, ::f2]
    return jax.image.resize(
        mask.astype(jnp.float32),
        (mask.shape[0], hw[0], hw[1], mask.shape[-1]),
        method="nearest",
    ) > 0.5


class CrossDatasetsCELossKMeans:
    """Functional port of CrossDatasetsCELoss_KMeans. Call with per-dataset
    lists; returns (loss, metrics, new_bank, new_prototypes)."""

    def __init__(self, configer):
        g = lambda *k, d=None: configer.get(*k, default=d)
        self.remapper = ClassRemapOneHotLabel(configer)
        self.n = configer.n_datasets
        self.U = int(g("num_unify_classes"))
        self.P = int(g("contrast", "num_prototype", d=1))
        self.coefficient = float(g("contrast", "coefficient", d=0.9))
        self.loss_weight = float(g("contrast", "loss_weight", d=1.0))
        self.aux_weight = float(g("loss", "aux_weight", d=1.0))
        self.stride = int(g("network", "stride", d=8))
        self.use_contrast = bool(g("contrast", "use_contrast", d=True))
        self.temperature = float(g("contrast", "temperature", d=0.07))

    def __call__(
        self,
        preds: Dict,
        lbs: Sequence[Optional[jax.Array]],
        bank: MemoryBank,
        prototypes: jax.Array,  # (U·P, D) unit-norm
        is_warmup: bool = False,
        cur_iter: int = 0,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, Dict, MemoryBank, jax.Array]:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        seg_list = preds["seg"]
        embeds = preds.get("embed")
        total_seg = 0.0
        total_contrast = 0.0
        contrast_on = self.use_contrast and not is_warmup

        for i in range(self.n):
            logits, lb = seg_list[i], lbs[i]
            if logits is None or lb is None:
                continue
            lb = jnp.asarray(lb, jnp.int32)
            if self.use_contrast and embeds is not None and embeds[i] is not None:
                # the bank fills from step 0, warmup included (ref :412-417 —
                # the push sits before the is_warmup branch)
                embed = jax.lax.stop_gradient(embeds[i].astype(jnp.float32))
                lb_small = lb[:, :: self.stride, :: self.stride]
                uni = self.remapper.SingleSegRemapping(lb_small, i)
                D = embed.shape[-1]
                bank = memory_bank_push(
                    bank, embed.reshape(-1, D), uni.reshape(-1),
                    jax.random.fold_in(rng, i),
                )
            if not contrast_on:
                mask = self.remapper.SegRemappingOneHot(lb, i)
                total_seg = total_seg + multi_hot_nll(
                    logits, _match_hw(mask, logits.shape[1:3])
                )
                seg_mask = mask
            else:
                # one similarity pass, reused by the loss AND the sharpening
                # (the reference passes proto_logits into
                # AdaptiveMultiProtoRemapping, :449-455)
                sim = jnp.einsum(
                    "bhwd,ud->bhwu",
                    embeds[i].astype(jnp.float32), prototypes,
                )
                cm, seg_mask = self.remapper.ContrastRemapping(
                    lb, embed, prototypes, i, cur_iter=cur_iter,
                    sim=jax.lax.stop_gradient(sim),
                )
                # constrained-kmeans assignment push: multi-mapped pixels go
                # into the bank under their sharpened one-hot class
                # (AdaptiveKMeansProtoLearning role, :579-660)
                cnt = jnp.sum(cm.astype(jnp.int32), axis=-1)
                assigned = jnp.where(
                    (cnt == 1) & (uni == self.remapper.ignore_index),
                    jnp.argmax(cm, axis=-1) // self.P,
                    self.remapper.ignore_index,
                )
                bank = memory_bank_push(
                    bank, embed.reshape(-1, D), assigned.reshape(-1),
                    jax.random.fold_in(rng, self.n + i),
                )
                one_hot = self.remapper.SingleSegRemappingOneHot(lb_small, i)
                if self.P > 1:
                    one_hot = jnp.repeat(one_hot, self.P, axis=-1)
                # temperature-scaled contrast (loss_contrast_mem.py:376-423)
                total_contrast = total_contrast + multi_hot_nll(
                    sim / self.temperature, cm | one_hot
                )
                total_seg = total_seg + multi_hot_nll(
                    logits, _match_hw(seg_mask, logits.shape[1:3])
                )
            # aux heads share the PHASE's mask (ref :465-476 applies the
            # sharpened seg_mask_mul to the aux losses in the main phase)
            for aux_set in preds.get("aux", []) or []:
                if aux_set[i] is None:
                    continue
                total_seg = total_seg + self.aux_weight * multi_hot_nll(
                    aux_set[i], _match_hw(seg_mask, aux_set[i].shape[1:3])
                )

        if contrast_on:
            prototypes = jax.lax.stop_gradient(
                update_prototypes(bank, prototypes, self.coefficient)
            )

        loss = total_seg + self.loss_weight * total_contrast
        metrics = {
            "loss": loss,
            "seg_loss": total_seg,
            "contrast_loss": total_contrast,
        }
        return loss, metrics, bank, prototypes
