"""KMeans-era cross-datasets loss (pre-GNN prototype learning).

Reference: lib/loss/loss_cross_datasets.py:349-660
(`CrossDatasetsCELoss_KMeans`) — the contrast-era workload that learns the
unified prototypes directly from pixel embeddings:
  * warmup: multi-hot NLL over every admissible unified class per pixel
    (AdaptiveSegRemapping → NLLPlus, :430-446);
  * main phase: per-class memory-bank enqueue of single-mapped embeddings
    (:414-417), prototype refresh = EMA mix of normalized bank means
    (AdaptiveKMeansProtoLearning + coefficient mix, :418-424), prototype
    similarity logits supervise both a multi-proto contrast term
    (ContrastRemapping-sharpened + single one-hot labels, :448-457) and the
    seg head through the sharpened seg mask (:458-476).

TPU-native shape: per-dataset list inputs (no dataset_ids gather), the
memory bank and prototypes travel functionally through the step, and every
remap is a ClassRemapOneHotLabel LUT/argmax (static shapes).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from mds_tpu.data.class_remap import ClassRemapOneHotLabel
from mds_tpu.losses.contrast import MemoryBank, memory_bank_push


def multi_hot_nll(logits: jax.Array, mask: jax.Array) -> jax.Array:
    """−log Σ_{c∈mask} softmax(logits)_c, mean over pixels with a non-empty
    mask (the NLLPlus semantics on bool masks; loss_helper.py:606-628).
    logits (B,H,W,C) or (N,C); mask same shape bool."""
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    tot = jnp.sum(p * mask.astype(jnp.float32), axis=-1)
    valid = jnp.any(mask, axis=-1)
    nll = -jnp.log(jnp.maximum(tot, 1e-12))
    return jnp.sum(jnp.where(valid, nll, 0.0)) / jnp.maximum(
        jnp.sum(valid.astype(jnp.float32)), 1.0
    )


def update_prototypes(bank: MemoryBank, prototypes: jax.Array,
                      coefficient: float) -> jax.Array:
    """Prototype refresh: normalize(coef·old + (1−coef)·normalize(bank
    mean)) (reference :418-424 after AdaptiveKMeansProtoLearning)."""
    mean = jnp.mean(bank.feats, axis=1)
    mean = mean / jnp.maximum(
        jnp.linalg.norm(mean, axis=-1, keepdims=True), 1e-12
    )
    mixed = coefficient * prototypes + (1.0 - coefficient) * mean
    return mixed / jnp.maximum(
        jnp.linalg.norm(mixed, axis=-1, keepdims=True), 1e-12
    )


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

        if self.use_contrast:
            # bank enqueue under single-mapped unified labels (ref :414-417)
            for i in range(self.n):
                if embeds is None or embeds[i] is None or lbs[i] is None:
                    continue
                lb_small = jnp.asarray(lbs[i], jnp.int32)[
                    :, :: self.stride, :: self.stride
                ]
                uni = self.remapper.SingleSegRemapping(lb_small, i)
                D = embeds[i].shape[-1]
                bank = memory_bank_push(
                    bank,
                    jax.lax.stop_gradient(
                        embeds[i].astype(jnp.float32)
                    ).reshape(-1, D),
                    uni.reshape(-1),
                    jax.random.fold_in(rng, i),
                )
            prototypes = jax.lax.stop_gradient(
                update_prototypes(bank, prototypes, self.coefficient)
            )

        for i in range(self.n):
            logits, lb = seg_list[i], lbs[i]
            if logits is None or lb is None:
                continue
            lb = jnp.asarray(lb, jnp.int32)
            if is_warmup or not self.use_contrast:
                mask = self.remapper.SegRemappingOneHot(lb, i)
                if mask.shape[1] != logits.shape[1]:
                    f = mask.shape[1] // logits.shape[1]
                    mask = mask[:, ::f, ::f]
                total_seg = total_seg + multi_hot_nll(logits, mask)
            else:
                embed = embeds[i].astype(jnp.float32)
                cm, seg_mask = self.remapper.ContrastRemapping(
                    lb, embed, prototypes, i, cur_iter=cur_iter
                )
                one_hot = self.remapper.SingleSegRemappingOneHot(
                    lb[:, :: self.stride, :: self.stride], i
                )
                if self.P > 1:
                    one_hot = jnp.repeat(one_hot, self.P, axis=-1)
                proto_logits = jnp.einsum(
                    "bhwd,ud->bhwu", embed, prototypes
                )
                total_contrast = total_contrast + multi_hot_nll(
                    proto_logits, cm | one_hot
                )
                if seg_mask.shape[1] != logits.shape[1]:
                    f = seg_mask.shape[1] // logits.shape[1]
                    seg_mask = seg_mask[:, ::f, ::f]
                total_seg = total_seg + multi_hot_nll(logits, seg_mask)
            for aux_set in preds.get("aux", []) or []:
                if aux_set[i] is None:
                    continue
                amask = self.remapper.SegRemappingOneHot(lb, i)
                if amask.shape[1] != aux_set[i].shape[1]:
                    f = amask.shape[1] // aux_set[i].shape[1]
                    amask = amask[:, ::f, ::f]
                total_seg = total_seg + self.aux_weight * multi_hot_nll(
                    aux_set[i], amask
                )

        loss = total_seg + self.loss_weight * total_contrast
        metrics = {
            "loss": loss,
            "seg_loss": total_seg,
            "contrast_loss": total_contrast,
        }
        return loss, metrics, bank, prototypes
