"""BiSeNetV2 in Flax — multi-dataset, NHWC, bf16-ready.

Reference: lib/models/bisenetv2.py (853 LoC). Topology (paper + reference):
  * DetailBranch — 3 conv stages at ×2/×4/×8 downsample (ref :156-189);
  * SegmentBranch — StemBlock (:192-229), GELayerS1/S2 inverted bottlenecks
    with depthwise 3×3 (:271-371), CEBlock global-context (:229-268);
  * BGALayer bilateral guided aggregation (:410-491);
  * SegmentHead ×(1 main + 4 aux) per dataset (:493-539, heads ModuleList
    :551-567).

Multi-dataset-ness: every ConvBNReLU/ConvBN holds per-dataset BN stats with a
shared affine pair (see mds_tpu.models.layers.DatasetNorm). Train mode takes a
stacked batch + static per-dataset `splits`; eval takes a static `dataset`
index. `aux_mode` is replaced by method entry points: `__call__` (train →
main+aux logits per dataset), `eval_logits` (main logits for one dataset) and
`pred` (argmax map), mirroring aux_mode ∈ {train, eval, pred}
(ref :599-640).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mds_tpu.models.layers import (
    BatchPlan,
    ConvBN,
    ConvBNReLU,
    DatasetNorm,
    SegmentHead,
    avg_pool_3x3_s2,
    max_pool_3x3_s2,
    split_batch,
    upsample,
)
from mds_tpu.registry import MODELS

Dtype = Any


class DetailBranch(nn.Module):
    """High-resolution detail path (reference: lib/models/bisenetv2.py:156-189)."""

    n_bn: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train, splits=None, dataset=0):
        kw = dict(train=train, splits=splits, dataset=dataset)
        cfg = dict(n_bn=self.n_bn, dtype=self.dtype)
        x = ConvBNReLU(64, 3, stride=2, name="S1_1", **cfg)(x, **kw)
        x = ConvBNReLU(64, 3, name="S1_2", **cfg)(x, **kw)
        x = ConvBNReLU(64, 3, stride=2, name="S2_1", **cfg)(x, **kw)
        x = ConvBNReLU(64, 3, name="S2_2", **cfg)(x, **kw)
        x = ConvBNReLU(64, 3, name="S2_3", **cfg)(x, **kw)
        x = ConvBNReLU(128, 3, stride=2, name="S3_1", **cfg)(x, **kw)
        x = ConvBNReLU(128, 3, name="S3_2", **cfg)(x, **kw)
        x = ConvBNReLU(128, 3, name="S3_3", **cfg)(x, **kw)
        return x


class StemBlock(nn.Module):
    """Stem: conv ×2↓ then parallel conv-path / maxpool, fuse
    (reference: lib/models/bisenetv2.py:192-229)."""

    n_bn: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train, splits=None, dataset=0):
        kw = dict(train=train, splits=splits, dataset=dataset)
        cfg = dict(n_bn=self.n_bn, dtype=self.dtype)
        x = ConvBNReLU(16, 3, stride=2, name="conv", **cfg)(x, **kw)
        left = ConvBNReLU(8, 1, name="left_1", **cfg)(x, **kw)
        left = ConvBNReLU(16, 3, stride=2, name="left_2", **cfg)(left, **kw)
        right = max_pool_3x3_s2(x)
        x = jnp.concatenate([left, right], axis=-1)
        x = ConvBNReLU(16, 3, name="fuse", **cfg)(x, **kw)
        return x


class CEBlock(nn.Module):
    """Context embedding: GAP → per-dataset BN (own affine) → 1×1 conv →
    broadcast-add → 3×3 conv (reference: lib/models/bisenetv2.py:229-268).
    Note: this BN is affine=True per dataset (no shared affine)."""

    n_bn: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train, splits=None, dataset=0):
        kw = dict(train=train, splits=splits, dataset=dataset)
        cfg = dict(n_bn=self.n_bn, dtype=self.dtype)
        gap = jnp.mean(x, axis=(1, 2), keepdims=True)
        gap = DatasetNorm(
            128, n_bn=self.n_bn, shared_affine=False, dtype=self.dtype, name="bn"
        )(gap, **kw)
        gap = ConvBNReLU(128, 1, name="conv_gap", **cfg)(gap, **kw)
        x = x + gap  # broadcast over H,W = F.interpolate of 1×1 map
        x = ConvBNReLU(128, 3, name="conv_last", **cfg)(x, **kw)
        return x


class GELayerS1(nn.Module):
    """Gather-expand layer, stride 1 (reference: lib/models/bisenetv2.py:271-309)."""

    in_chan: int
    out_chan: int
    exp_ratio: int = 6
    n_bn: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train, splits=None, dataset=0):
        kw = dict(train=train, splits=splits, dataset=dataset)
        cfg = dict(n_bn=self.n_bn, dtype=self.dtype)
        mid = self.in_chan * self.exp_ratio
        f = ConvBNReLU(self.in_chan, 3, name="conv1", **cfg)(x, **kw)
        f = ConvBNReLU(mid, 3, groups=self.in_chan, name="dwconv", **cfg)(f, **kw)
        f = ConvBN(self.out_chan, 1, name="conv2", **cfg)(f, **kw)
        return nn.relu(f + x)


class GELayerS2(nn.Module):
    """Gather-expand layer, stride 2, with depthwise shortcut
    (reference: lib/models/bisenetv2.py:312-371)."""

    in_chan: int
    out_chan: int
    exp_ratio: int = 6
    n_bn: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train, splits=None, dataset=0):
        kw = dict(train=train, splits=splits, dataset=dataset)
        cfg = dict(n_bn=self.n_bn, dtype=self.dtype)
        mid = self.in_chan * self.exp_ratio
        f = ConvBNReLU(self.in_chan, 3, name="conv1", **cfg)(x, **kw)
        f = ConvBN(mid, 3, stride=2, groups=self.in_chan, name="dwconv1", **cfg)(f, **kw)
        f = ConvBN(mid, 3, groups=mid, name="dwconv2", **cfg)(f, **kw)
        f = ConvBN(self.out_chan, 1, name="conv2", **cfg)(f, **kw)
        s = ConvBN(self.in_chan, 3, stride=2, groups=self.in_chan, name="shortcut_1", **cfg)(x, **kw)
        s = ConvBN(self.out_chan, 1, name="shortcut_2", **cfg)(s, **kw)
        return nn.relu(f + s)


class SegmentBranch(nn.Module):
    """Semantic path: stem + GE stages + context embedding
    (reference: lib/models/bisenetv2.py:373-407)."""

    n_bn: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train, splits=None, dataset=0):
        kw = dict(train=train, splits=splits, dataset=dataset)
        cfg = dict(n_bn=self.n_bn, dtype=self.dtype)
        feat2 = StemBlock(name="S1S2", **cfg)(x, **kw)
        feat3 = GELayerS2(16, 32, name="S3_1", **cfg)(feat2, **kw)
        feat3 = GELayerS1(32, 32, name="S3_2", **cfg)(feat3, **kw)
        feat4 = GELayerS2(32, 64, name="S4_1", **cfg)(feat3, **kw)
        feat4 = GELayerS1(64, 64, name="S4_2", **cfg)(feat4, **kw)
        feat5 = GELayerS2(64, 128, name="S5_4_1", **cfg)(feat4, **kw)
        feat5 = GELayerS1(128, 128, name="S5_4_2", **cfg)(feat5, **kw)
        feat5 = GELayerS1(128, 128, name="S5_4_3", **cfg)(feat5, **kw)
        feat5 = GELayerS1(128, 128, name="S5_4_4", **cfg)(feat5, **kw)
        feat5_5 = CEBlock(name="S5_5", **cfg)(feat5, **kw)
        return feat2, feat3, feat4, feat5, feat5_5


class BGALayer(nn.Module):
    """Bilateral guided aggregation (reference: lib/models/bisenetv2.py:410-491)."""

    n_bn: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_d, x_s, *, train, splits=None, dataset=0):
        kw = dict(train=train, splits=splits, dataset=dataset)
        cfg = dict(n_bn=self.n_bn, dtype=self.dtype)
        left1 = ConvBN(128, 3, groups=128, name="left1_convbn", **cfg)(x_d, **kw)
        left1 = nn.Conv(128, (1, 1), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="left1_conv")(left1)
        left2 = ConvBN(128, 3, stride=2, name="left2_convbn", **cfg)(x_d, **kw)
        left2 = avg_pool_3x3_s2(left2)
        right1 = ConvBN(128, 3, name="right1", **cfg)(x_s, **kw)
        right2 = ConvBN(128, 3, groups=128, name="right2_convbn", **cfg)(x_s, **kw)
        right2 = nn.Conv(128, (1, 1), use_bias=False, dtype=self.dtype,
                         param_dtype=jnp.float32, name="right2_conv")(right2)
        right1 = upsample(right1, 4, "nearest")
        left = left1 * jax.nn.sigmoid(right1)
        right = left2 * jax.nn.sigmoid(right2)
        right = upsample(right, 4, "nearest")
        out = ConvBNReLU(128, 3, name="conv", **cfg)(left + right, **kw)
        return out


@MODELS.register("bisenetv2")
class BiSeNetV2(nn.Module):
    """Multi-dataset BiSeNetV2 (reference: lib/models/bisenetv2.py:541-782).

    n_classes: per-dataset class counts (length = n_datasets = n_bn).
    Train call returns per-dataset lists of [main, aux2, aux3, aux4, aux5_4]
    logits at input resolution (float32), matching the reference head set
    (:551-567, :628-631).
    """

    n_classes: Sequence[int]
    n_bn: int = 1
    aux: bool = True
    shared_affine: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = dict(n_bn=self.n_bn, dtype=self.dtype)
        self.detail = DetailBranch(**cfg)
        self.segment = SegmentBranch(**cfg)
        self.bga = BGALayer(**cfg)
        self.head = [
            SegmentHead(1024, n, up_factor=8, aux=False, dtype=self.dtype)
            for n in self.n_classes
        ]
        if self.aux:
            self.aux2 = [
                SegmentHead(128, n, up_factor=4, dtype=self.dtype)
                for n in self.n_classes
            ]
            self.aux3 = [
                SegmentHead(128, n, up_factor=8, dtype=self.dtype)
                for n in self.n_classes
            ]
            self.aux4 = [
                SegmentHead(128, n, up_factor=16, dtype=self.dtype)
                for n in self.n_classes
            ]
            self.aux5_4 = [
                SegmentHead(128, n, up_factor=32, dtype=self.dtype)
                for n in self.n_classes
            ]

    def backbone(self, x, *, train, splits=None, dataset=0):
        kw = dict(train=train, splits=splits, dataset=dataset)
        x = x.astype(self.dtype)
        feat_d = self.detail(x, **kw)
        feat2, feat3, feat4, feat5_4, feat_s = self.segment(x, **kw)
        feat_head = self.bga(feat_d, feat_s, **kw)
        return feat_head, (feat2, feat3, feat4, feat5_4)

    def __call__(self, x, *, train: bool = True,
                 splits: Optional[BatchPlan] = None, dataset: int = 0):
        """Train forward: per-dataset logits lists.

        Returns dict(logits=[per-dataset main logits], aux=[per-dataset
        [aux2, aux3, aux4, aux5_4] lists]) — shapes (b_i, H, W, n_classes_i).
        """
        if splits is None:
            splits = tuple(
                x.shape[0] if i == dataset else 0 for i in range(self.n_bn)
            )
        feat_head, feats_aux = self.backbone(x, train=train, splits=splits)
        head_parts = split_batch(feat_head, splits)
        logits = [
            self.head[i](p, train=train) if p is not None else None
            for i, p in enumerate(head_parts)
        ]
        out = {"logits": logits}
        if self.aux and train:
            aux_heads = [self.aux2, self.aux3, self.aux4, self.aux5_4]
            aux_out = []
            for heads, feat in zip(aux_heads, feats_aux):
                parts = split_batch(feat, splits)
                aux_out.append(
                    [
                        heads[i](p, train=train) if p is not None else None
                        for i, p in enumerate(parts)
                    ]
                )
            out["aux"] = aux_out
        return out

    def eval_logits(self, x, dataset: int = 0):
        """aux_mode='eval' path: main logits for one dataset (ref :632-635)."""
        feat_head, _ = self.backbone(x, train=False, dataset=dataset)
        return self.head[dataset](feat_head, train=False)

    def pred(self, x, dataset: int = 0):
        """aux_mode='pred': argmax label map (ref :636-639)."""
        return jnp.argmax(self.eval_logits(x, dataset), axis=-1)
