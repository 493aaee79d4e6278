"""BiSeNetV2 + pixel-contrast heads (unified-label-space era, pre-GNN).

Reference: lib/models/bisenetv2_contrast.py (982 LoC; `_WN` weight-norm and
`_BN` classifier variants in bisenetv2_contrast_wn.py / _bn.py). On top of
the BiSeNetV2 trunk:
  * one unified SegmentHead over `num_unify_classes` (:396-493) instead of
    per-dataset heads — the label spaces are pre-unified by ClassRemap;
  * an embedding projection from the head's mid features (ConvNorm /
    convmlp proj, :339-394) feeding the pixel-contrast loss + memory bank;
  * optional per-dataset aux heads (dataset_aux*, :424-437);
  * optional domain-classifier heads (lib/module/domain_classifier_head.py);
  * weight-normed classifier (`_WN`): 1×1 conv whose kernel is L2-normalized
    per output class (cosine classifier).

The EMA-teacher variant (BiSeNetV2_Contrast_Teacher) is the same module with
a second parameter tree updated by mds_tpu.engine.ema.ema_update.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mds_tpu.models.bisenetv2 import BGALayer, DetailBranch, SegmentBranch
from mds_tpu.models.layers import ConvBNReLU, MultiX, SegmentHead, as_multi, lmap
from mds_tpu.registry import MODELS

Dtype = Any


class ProjHead(nn.Module):
    """convmlp projection: conv3×3-BN-ReLU → 1×1 (reference proj 'convmlp' /
    ConvNorm paths, bisenetv2_contrast.py:339-394)."""

    proj_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        (x,) = ConvBNReLU(x.shape[-1], 3, dtype=self.dtype, name="conv1")(
            [x], train=train
        )
        x = nn.Conv(self.proj_dim, (1, 1), use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_out")(x)
        # embeddings are L2-normalized for the InfoNCE losses
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


class WNClassifier(nn.Module):
    """Weight-normalized (cosine) 1×1 classifier — the `_WN` variant
    (bisenetv2_contrast_wn.py:337)."""

    n_classes: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "kernel", nn.initializers.lecun_normal(), (x.shape[-1], self.n_classes),
            jnp.float32,
        )
        w = w / jnp.maximum(jnp.linalg.norm(w, axis=0, keepdims=True), 1e-12)
        return jnp.einsum(
            "bhwc,cn->bhwn", x, w.astype(x.dtype),
            preferred_element_type=jnp.float32,
        )


class BiSeNetV2Contrast(nn.Module):
    """Unified-head BiSeNetV2 with embedding/aux/domain outputs.

    num_unify_classes: unified label-space size (config `num_unify_classes`).
    datasets_cats: per-dataset class counts for the aux heads.
    """

    num_unify_classes: int
    datasets_cats: Sequence[int] = ()
    n_bn: int = 1
    proj_dim: int = 256
    aux: bool = True
    with_dataset_aux_heads: bool = False
    wn_classifier: bool = False
    dtype: Dtype = jnp.float32

    @classmethod
    def from_configer(cls, configer, dtype=jnp.float32, **kw):
        n = configer.n_datasets
        return cls(
            num_unify_classes=int(configer.get("num_unify_classes")),
            datasets_cats=tuple(configer.n_cats(i) for i in range(n)),
            n_bn=int(configer.get("n_bn", default=n)),
            proj_dim=int(configer.get("contrast", "proj_dim", default=256)),
            with_dataset_aux_heads=bool(
                configer.get("dataset_aux_head", default=False)
            ),
            dtype=dtype,
            **kw,
        )

    def setup(self):
        cfg = dict(n_bn=self.n_bn, dtype=self.dtype)
        self.detail = DetailBranch(**cfg)
        self.segment = SegmentBranch(**cfg)
        self.bga = BGALayer(**cfg)
        n = self.num_unify_classes
        self.head = SegmentHead(1024, n, up_factor=8, aux=False, dtype=self.dtype)
        if self.aux:
            self.aux2 = SegmentHead(128, n, up_factor=4, dtype=self.dtype)
            self.aux3 = SegmentHead(128, n, up_factor=8, dtype=self.dtype)
            self.aux4 = SegmentHead(128, n, up_factor=16, dtype=self.dtype)
            self.aux5_4 = SegmentHead(128, n, up_factor=32, dtype=self.dtype)
        self.proj_head = ProjHead(self.proj_dim, self.dtype)
        if self.wn_classifier:
            self.wn_cls = WNClassifier(n, self.dtype)
        if self.with_dataset_aux_heads:
            self.dataset_aux_head = [
                SegmentHead(1024, c, up_factor=8, aux=False, dtype=self.dtype)
                for c in self.datasets_cats
            ]

    def backbone(self, xs: MultiX, *, train: bool):
        xs = lmap(lambda x: x.astype(self.dtype), xs)
        feat_d = self.detail(xs, train=train)
        feat2, feat3, feat4, feat5_4, feat_s = self.segment(xs, train=train)
        feat_head = self.bga(feat_d, feat_s, train=train)
        return feat_head, (feat2, feat3, feat4, feat5_4)

    def __call__(self, xs: MultiX, *, train: bool = True):
        """aux_mode='train' (ref :494-545): unified logits (+aux) for the
        stacked multi-dataset batch, plus contrast embeddings at 1/8."""
        feat_head, feats_aux = self.backbone(xs, train=train)
        out = {
            "seg": lmap(lambda f: self.head(f, train=train), feat_head),
            "embed": lmap(lambda f: self.proj_head(f, train=train), feat_head),
        }
        if self.aux and train:
            heads = [self.aux2, self.aux3, self.aux4, self.aux5_4]
            out["aux"] = [
                lmap(lambda f, h=h: h(f, train=train), feat)
                for h, feat in zip(heads, feats_aux)
            ]
        if self.with_dataset_aux_heads:
            out["dataset_aux"] = [
                None if f is None else self.dataset_aux_head[i](f, train=train)
                for i, f in enumerate(feat_head)
            ]
        return out

    def eval_logits(self, x, dataset: int = 0):
        feat_head, _ = self.backbone(
            as_multi(x, dataset, self.n_bn), train=False
        )
        return self.head(feat_head[dataset], train=False)

    def pred(self, x, dataset: int = 0):
        return jnp.argmax(self.eval_logits(x, dataset), axis=-1)

    def emb_logits(self, x, dataset: int = 0, *, prototypes=None):
        """aux_mode='pred_by_emb' (bisenetv2_contrast.py:589-617): similarity
        of the projection embedding to (U, K, D) contrast prototypes; the
        per-class max over the K prototypes makes argmax equal the
        reference's `(MaxSimIndex / num_prototype).long()`. `prototypes`
        come from the trainer's memory-bank class means (our bank replaces
        the reference's in-module prototype buffer)."""
        feat_head, _ = self.backbone(
            as_multi(x, dataset, self.n_bn), train=False
        )
        emb = self.proj_head(feat_head[dataset], train=False)
        sim = jnp.einsum(
            "bhwc,ukc->bhwuk", emb, jnp.asarray(prototypes, emb.dtype),
            preferred_element_type=jnp.float32,
        )
        return jnp.max(sim, axis=-1)


@MODELS.register("bisenetv2_contrast")
def bisenetv2_contrast(configer=None, **kw):
    return BiSeNetV2Contrast.from_configer(configer, **kw)


@MODELS.register("bisenetv2_contrast_wn")
def bisenetv2_contrast_wn(configer=None, **kw):
    """Weight-normed (cosine) classifier variant
    (lib/models/bisenetv2_contrast_wn.py)."""
    kw.setdefault("wn_classifier", True)
    return BiSeNetV2Contrast.from_configer(configer, **kw)


@MODELS.register("bisenetv2_contrast_bn")
def bisenetv2_contrast_bn(configer=None, **kw):
    """_BN classifier variant (lib/models/bisenetv2_contrast_bn.py) — the
    BN-normalized classifier folds into the plain head under our DatasetNorm
    design; same module."""
    return BiSeNetV2Contrast.from_configer(configer, **kw)


@MODELS.register("bisenetv2_contrast_ema")
def bisenetv2_contrast_ema(configer=None, **kw):
    """EMA-teacher variant (BiSeNetV2_Contrast_Teacher): the same module —
    the teacher is a second parameter tree updated by engine.ema.ema_update
    (see ContrastTrainer.use_ema)."""
    return BiSeNetV2Contrast.from_configer(configer, **kw)
