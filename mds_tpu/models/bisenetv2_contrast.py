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

from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mds_tpu.models.bisenetv2 import BGALayer, DetailBranch, SegmentBranch
from mds_tpu.models.layers import (
    ConvBNReLU,
    FastDropout,
    MultiX,
    as_multi,
    lmap,
    resize_bilinear_ac,
    upsample,
)
from mds_tpu.registry import MODELS

Dtype = Any


class ProjHead(nn.Module):
    """convmlp projection: conv3×3-BN-ReLU (2× width) → 1×1 → L2-normalize
    (lib/module/projection.py:8-58 — per-dataset BN slots inside the
    ConvBNReLU, normalization in-module per :51)."""

    proj_dim: int
    n_bn: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: MultiX, *, train: bool) -> List[Optional[jax.Array]]:
        dim_in = next(x.shape[-1] for x in xs if x is not None)
        xs = ConvBNReLU(2 * dim_in, 3, n_bn=self.n_bn, dtype=self.dtype,
                        name="conv1")(xs, train=train)
        conv_out = nn.Conv(self.proj_dim, (1, 1), use_bias=True,
                           dtype=self.dtype, param_dtype=jnp.float32,
                           name="conv_out")
        # embeddings are L2-normalized for the InfoNCE losses
        return lmap(
            lambda x: (lambda y: y / jnp.maximum(
                jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-12
            ))(conv_out(x)),
            xs,
        )


class UnifiedSegmentHead(nn.Module):
    """ONE head over the unified label space with PER-DATASET BN slots
    (reference bisenetv2_contrast.py:339-394 SegmentHead(n_bn=n_bn) — unlike
    the per-dataset heads of the multi-dataset BiSeNetV2, where each head
    owns a single BN). conv3×3-BN-ReLU → dropout → [aux: up×2 →
    conv3×3-BN-ReLU] → 1×1 (the reference's ConvNorm cosine normalisation is
    folded out — a forward-time rescale the OHEM softmax is invariant to up
    to temperature) → bilinear up."""

    mid_chan: int
    n_classes: int
    up_factor: int = 8
    aux: bool = True
    n_bn: int = 1
    conv_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: MultiX, *, train: bool) -> List[Optional[jax.Array]]:
        xs = ConvBNReLU(self.mid_chan, 3, n_bn=self.n_bn, dtype=self.dtype,
                        name="conv")(xs, train=train)
        drop = FastDropout(0.1)
        xs = lmap(lambda x: drop(x, deterministic=not train), xs)
        factor = self.up_factor
        if self.aux:
            xs = lmap(lambda x: upsample(x, 2, "nearest"), xs)
            xs = ConvBNReLU(self.up_factor * self.up_factor, 3,
                            n_bn=self.n_bn, dtype=self.dtype,
                            name="conv1")(xs, train=train)
            factor = factor // 2
        if self.conv_norm:
            # ConvNorm cosine classifier (lib/module/ConvNorm.py:4-21):
            # logits = (w·x) / (|w_class| · |x_pixel| + 1e-8), no bias.
            # A 1×1 conv is an einsum — declared under 'conv_out/kernel' so
            # the torch importer path is identical either way.
            c_in = next(x.shape[-1] for x in xs if x is not None)
            w = self.param(
                "conv_out",
                lambda key: {"kernel": nn.initializers.lecun_normal()(
                    key, (1, 1, c_in, self.n_classes), jnp.float32)},
            )["kernel"]
            norm_w = jnp.linalg.norm(
                w.reshape(c_in, self.n_classes).astype(jnp.float32), axis=0
            )

            def classify(x):
                feat = jnp.einsum(
                    "bhwc,co->bhwo", x,
                    w.reshape(c_in, self.n_classes).astype(x.dtype),
                    preferred_element_type=jnp.float32,
                )
                norm_x = jnp.linalg.norm(
                    x.astype(jnp.float32), axis=-1, keepdims=True
                )
                return (feat / (norm_x * norm_w + 1e-8)).astype(self.dtype)

            xs = lmap(classify, xs)
        else:
            conv_out = nn.Conv(self.n_classes, (1, 1), use_bias=True,
                               dtype=self.dtype, param_dtype=jnp.float32,
                               name="conv_out")
            xs = lmap(conv_out, xs)
        if factor > 1:
            # the contrast-era head upsamples align_corners=True
            # (bisenetv2_contrast.py:372 up_sample2), unlike the base model
            xs = lmap(
                lambda x: resize_bilinear_ac(
                    x, (x.shape[1] * factor, x.shape[2] * factor)
                ).astype(self.dtype),
                xs,
            )
        return xs


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
        hk = dict(n_bn=self.n_bn, dtype=self.dtype)
        self.head = UnifiedSegmentHead(1024, n, up_factor=8, aux=False, **hk)
        if self.aux:
            self.aux2 = UnifiedSegmentHead(128, n, up_factor=4, **hk)
            self.aux3 = UnifiedSegmentHead(128, n, up_factor=8, **hk)
            self.aux4 = UnifiedSegmentHead(128, n, up_factor=16, **hk)
            self.aux5_4 = UnifiedSegmentHead(128, n, up_factor=32, **hk)
        self.proj_head = ProjHead(self.proj_dim, self.n_bn, self.dtype)
        if self.wn_classifier:
            self.wn_cls = WNClassifier(n, self.dtype)
        if self.with_dataset_aux_heads:
            self.dataset_aux_head = [
                UnifiedSegmentHead(1024, c, up_factor=8, aux=False, **hk)
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
            "seg": self.head(feat_head, train=train),
            "embed": self.proj_head(feat_head, train=train),
        }
        if self.aux and train:
            heads = [self.aux2, self.aux3, self.aux4, self.aux5_4]
            out["aux"] = [
                h(feat, train=train) for h, feat in zip(heads, feats_aux)
            ]
        if self.with_dataset_aux_heads:
            out["dataset_aux"] = [
                None if f is None else self.dataset_aux_head[i](
                    as_multi(f, i, self.n_bn), train=train)[i]
                for i, f in enumerate(feat_head)
            ]
        return out

    def eval_logits(self, x, dataset: int = 0):
        feat_head, _ = self.backbone(
            as_multi(x, dataset, self.n_bn), train=False
        )
        return self.head(feat_head, train=False)[dataset]

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
        emb = self.proj_head(feat_head, train=False)[dataset]
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
