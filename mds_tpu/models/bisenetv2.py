"""BiSeNetV2 in Flax — multi-dataset, NHWC, bf16-ready.

Reference: lib/models/bisenetv2.py (853 LoC). Topology:
  * DetailBranch — 3 conv stages at ×2/×4/×8 downsample (ref :156-189);
  * SegmentBranch — StemBlock (:192-229), GELayerS1/S2 inverted bottlenecks
    with depthwise 3×3 (:271-371), CEBlock global-context (:229-268);
  * BGALayer bilateral guided aggregation (:410-491);
  * SegmentHead ×(1 main + 4 aux) per dataset (:493-539, ModuleLists :551-567).

Multi-dataset activations flow as per-dataset lists (see
mds_tpu.models.layers); every ConvBNReLU/ConvBN holds per-dataset BN stats
with a shared affine pair. `aux_mode` ∈ {train, eval, pred} (ref :599-640) is
replaced by `__call__` / `eval_logits` / `pred` entry points.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mds_tpu.models.layers import (
    ConvBN,
    ConvBNReLU,
    DatasetNorm,
    MultiX,
    SegmentHead,
    as_multi,
    avg_pool_3x3_s2,
    lmap,
    lmap2,
    max_pool_3x3_s2,
    upsample,
)
from mds_tpu.registry import MODELS

Dtype = Any


class DetailBranch(nn.Module):
    """High-resolution detail path (reference: lib/models/bisenetv2.py:156-189)."""

    n_bn: int = 1
    shared_affine: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: MultiX, *, train: bool):
        from mds_tpu.models.layers import get_detail_fuse

        cfg = dict(n_bn=self.n_bn, shared_affine=self.shared_affine, dtype=self.dtype)
        s1_1 = ConvBNReLU(64, 3, stride=2, name="S1_1", **cfg)
        s1_2 = ConvBNReLU(64, 3, name="S1_2", **cfg)
        s2_1 = ConvBNReLU(64, 3, stride=2, name="S2_1", **cfg)
        from mds_tpu.ops.pallas.stem import get_stem_th

        fuse = (
            not train and get_detail_fuse() and self.dtype == jnp.bfloat16
            and all(
                x is None
                or (x.shape[-1] == 3 and x.shape[1] % (2 * get_stem_th()) == 0
                    and x.shape[2] % 4 == 0)
                for x in xs
            )
        )
        if fuse:
            # deploy path: S1_1+S1_2+S2_1 as one Pallas kernel — the S1
            # activations never reach HBM (see layers.set_detail_fuse)
            from mds_tpu.ops.pallas.stem import detail_s1s2_fused, get_stem_th

            k1, cf1 = s1_1(xs, train=False, emit="folded")
            k2, cf2 = s1_2(xs, train=False, emit="folded", emit_c_in=64)
            k3, cf3 = s2_1(xs, train=False, emit="folded", emit_c_in=64)
            interp = jax.default_backend() != "tpu"
            xs = [
                None if x is None else detail_s1s2_fused(
                    x.astype(self.dtype), k1, cf1[i][0], cf1[i][1],
                    k2, cf2[i][0], cf2[i][1], k3, cf3[i][0], cf3[i][1],
                    th=get_stem_th(), interpret=interp,
                )
                for i, x in enumerate(xs)
            ]
        else:
            xs = s1_1(xs, train=train)
            xs = s1_2(xs, train=train)
            xs = s2_1(xs, train=train)
        s2_2 = ConvBNReLU(64, 3, name="S2_2", **cfg)
        s2_3 = ConvBNReLU(64, 3, name="S2_3", **cfg)
        s3_1 = ConvBNReLU(128, 3, stride=2, name="S3_1", **cfg)
        s3_2 = ConvBNReLU(128, 3, name="S3_2", **cfg)
        s3_3 = ConvBNReLU(128, 3, name="S3_3", **cfg)
        # deploy path, level 2: the whole remaining branch (S2_2 → S3_3) as
        # one more Pallas kernel — the /4-res intermediates and all the
        # Pallas↔XLA-conv layout copies disappear (ops/pallas/stem.py
        # detail_tail_fused). xs here are the /4-res 64-ch fused outputs.
        from mds_tpu.models.layers import get_detail_tail

        tail = fuse and get_detail_tail() and all(
            x is None or (x.shape[1] % 16 == 0 and x.shape[2] % 2 == 0)
            for x in xs
        )
        if tail:
            from mds_tpu.ops.pallas.stem import detail_tail_fused

            k4, cf4 = s2_2(xs, train=False, emit="folded", emit_c_in=64)
            k5, cf5 = s2_3(xs, train=False, emit="folded", emit_c_in=64)
            k6, cf6 = s3_1(xs, train=False, emit="folded", emit_c_in=64)
            k7, cf7 = s3_2(xs, train=False, emit="folded", emit_c_in=128)
            k8, cf8 = s3_3(xs, train=False, emit="folded", emit_c_in=128)
            return [
                None if x is None else detail_tail_fused(
                    x, k4, cf4[i][0], cf4[i][1], k5, cf5[i][0], cf5[i][1],
                    k6, cf6[i][0], cf6[i][1], k7, cf7[i][0], cf7[i][1],
                    k8, cf8[i][0], cf8[i][1], interpret=interp,
                )
                for i, x in enumerate(xs)
            ]
        xs = s2_2(xs, train=train)
        xs = s2_3(xs, train=train)
        xs = s3_1(xs, train=train)
        xs = s3_2(xs, train=train)
        xs = s3_3(xs, train=train)
        return xs


class StemBlock(nn.Module):
    """Stem: conv ×2↓ then parallel conv-path / maxpool, fuse
    (reference: lib/models/bisenetv2.py:192-229)."""

    n_bn: int = 1
    shared_affine: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: MultiX, *, train: bool):
        from mds_tpu.models.layers import get_detail_fuse

        cfg = dict(n_bn=self.n_bn, shared_affine=self.shared_affine, dtype=self.dtype)
        conv = ConvBNReLU(16, 3, stride=2, name="conv", **cfg)
        left_1 = ConvBNReLU(8, 1, name="left_1", **cfg)
        left_2 = ConvBNReLU(16, 3, stride=2, name="left_2", **cfg)
        fuse_conv = ConvBNReLU(16, 3, name="fuse", **cfg)
        from mds_tpu.ops.pallas.stem import get_stem_th

        fuse = (
            not train and get_detail_fuse() and self.dtype == jnp.bfloat16
            and all(
                x is None
                or (x.shape[-1] == 3 and x.shape[1] % (2 * get_stem_th()) == 0
                    and x.shape[2] % 4 == 0)
                for x in xs
            )
        )
        if fuse:
            # deploy path: the whole StemBlock as ONE Pallas kernel — stem,
            # left path, maxpool and fuse conv never leave VMEM
            # (ops/pallas/stem.py stemblock_fused)
            from mds_tpu.ops.pallas.stem import get_stem_th, stemblock_fused

            k_s, cf_s = conv(xs, train=False, emit="folded")
            k_l1, cf_l1 = left_1(xs, train=False, emit="folded", emit_c_in=16)
            k_l2, cf_l2 = left_2(xs, train=False, emit="folded", emit_c_in=8)
            k_f, cf_f = fuse_conv(xs, train=False, emit="folded", emit_c_in=32)
            interp = jax.default_backend() != "tpu"
            return [
                None if x is None else stemblock_fused(
                    x.astype(self.dtype),
                    k_s, cf_s[i][0], cf_s[i][1],
                    k_l1, cf_l1[i][0], cf_l1[i][1],
                    k_l2, cf_l2[i][0], cf_l2[i][1],
                    k_f, cf_f[i][0], cf_f[i][1],
                    th=get_stem_th(), interpret=interp,
                )
                for i, x in enumerate(xs)
            ]
        xs = conv(xs, train=train)
        left = left_1(xs, train=train)
        left = left_2(left, train=train)
        right = lmap(max_pool_3x3_s2, xs)
        xs = lmap2(lambda l, r: jnp.concatenate([l, r], axis=-1), left, right)
        xs = fuse_conv(xs, train=train)
        return xs


class CEBlock(nn.Module):
    """Context embedding: GAP → per-dataset BN (own affine) → 1×1 conv →
    broadcast-add → 3×3 conv (reference: lib/models/bisenetv2.py:229-268).
    This BN is affine=True per dataset (plain BatchNorm2d, no shared affine)."""

    n_bn: int = 1
    shared_affine: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: MultiX, *, train: bool):
        cfg = dict(n_bn=self.n_bn, shared_affine=self.shared_affine, dtype=self.dtype)
        gap = lmap(lambda x: jnp.mean(x, axis=(1, 2), keepdims=True), xs)
        gap = DatasetNorm(
            128, n_bn=self.n_bn, shared_affine=False, dtype=self.dtype, name="bn"
        )(gap, train=train)
        gap = ConvBNReLU(128, 1, name="conv_gap", **cfg)(gap, train=train)
        xs = lmap2(lambda x, g: x + g, xs, gap)  # broadcast = interpolate of 1×1
        xs = ConvBNReLU(128, 3, name="conv_last", **cfg)(xs, train=train)
        return xs


class GELayerS1(nn.Module):
    """Gather-expand layer, stride 1 (reference: lib/models/bisenetv2.py:271-309)."""

    in_chan: int
    out_chan: int
    exp_ratio: int = 6
    n_bn: int = 1
    shared_affine: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: MultiX, *, train: bool):
        cfg = dict(n_bn=self.n_bn, shared_affine=self.shared_affine, dtype=self.dtype)
        mid = self.in_chan * self.exp_ratio
        f = ConvBNReLU(self.in_chan, 3, name="conv1", **cfg)(xs, train=train)
        f = ConvBNReLU(mid, 3, groups=self.in_chan, name="dwconv", **cfg)(f, train=train)
        f = ConvBN(self.out_chan, 1, name="conv2", **cfg)(f, train=train)
        return lmap2(lambda a, b: nn.relu(a + b), f, xs)


class GELayerS2(nn.Module):
    """Gather-expand layer, stride 2, depthwise shortcut
    (reference: lib/models/bisenetv2.py:312-371)."""

    in_chan: int
    out_chan: int
    exp_ratio: int = 6
    n_bn: int = 1
    shared_affine: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: MultiX, *, train: bool):
        cfg = dict(n_bn=self.n_bn, shared_affine=self.shared_affine, dtype=self.dtype)
        mid = self.in_chan * self.exp_ratio
        f = ConvBNReLU(self.in_chan, 3, name="conv1", **cfg)(xs, train=train)
        f = ConvBN(mid, 3, stride=2, groups=self.in_chan, name="dwconv1", **cfg)(f, train=train)
        f = ConvBN(mid, 3, groups=mid, name="dwconv2", **cfg)(f, train=train)
        f = ConvBN(self.out_chan, 1, name="conv2", **cfg)(f, train=train)
        s = ConvBN(self.in_chan, 3, stride=2, groups=self.in_chan, name="shortcut_1", **cfg)(xs, train=train)
        s = ConvBN(self.out_chan, 1, name="shortcut_2", **cfg)(s, train=train)
        return lmap2(lambda a, b: nn.relu(a + b), f, s)


class SegmentBranch(nn.Module):
    """Semantic path: stem + GE stages + context embedding
    (reference: lib/models/bisenetv2.py:373-407)."""

    n_bn: int = 1
    shared_affine: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: MultiX, *, train: bool):
        cfg = dict(n_bn=self.n_bn, shared_affine=self.shared_affine, dtype=self.dtype)
        feat2 = StemBlock(name="S1S2", **cfg)(xs, train=train)
        feat3 = GELayerS2(16, 32, name="S3_1", **cfg)(feat2, train=train)
        feat3 = GELayerS1(32, 32, name="S3_2", **cfg)(feat3, train=train)
        feat4 = GELayerS2(32, 64, name="S4_1", **cfg)(feat3, train=train)
        feat4 = GELayerS1(64, 64, name="S4_2", **cfg)(feat4, train=train)
        feat5 = GELayerS2(64, 128, name="S5_4_1", **cfg)(feat4, train=train)
        feat5 = GELayerS1(128, 128, name="S5_4_2", **cfg)(feat5, train=train)
        feat5 = GELayerS1(128, 128, name="S5_4_3", **cfg)(feat5, train=train)
        feat5 = GELayerS1(128, 128, name="S5_4_4", **cfg)(feat5, train=train)
        feat5_5 = CEBlock(name="S5_5", **cfg)(feat5, train=train)
        return feat2, feat3, feat4, feat5, feat5_5


class BGALayer(nn.Module):
    """Bilateral guided aggregation (reference: lib/models/bisenetv2.py:410-491)."""

    n_bn: int = 1
    shared_affine: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_d: MultiX, x_s: MultiX, *, train: bool):
        cfg = dict(n_bn=self.n_bn, shared_affine=self.shared_affine, dtype=self.dtype)
        conv1x1_l = nn.Conv(128, (1, 1), use_bias=False, dtype=self.dtype,
                            param_dtype=jnp.float32, name="left1_conv")
        conv1x1_r = nn.Conv(128, (1, 1), use_bias=False, dtype=self.dtype,
                            param_dtype=jnp.float32, name="right2_conv")
        left1 = ConvBN(128, 3, groups=128, name="left1_convbn", **cfg)(x_d, train=train)
        left1 = lmap(conv1x1_l, left1)
        left2 = ConvBN(128, 3, stride=2, name="left2_convbn", **cfg)(x_d, train=train)
        left2 = lmap(avg_pool_3x3_s2, left2)
        right1 = ConvBN(128, 3, name="right1", **cfg)(x_s, train=train)
        right2 = ConvBN(128, 3, groups=128, name="right2_convbn", **cfg)(x_s, train=train)
        right2 = lmap(conv1x1_r, right2)
        right1 = lmap(lambda x: upsample(x, 4, "nearest"), right1)
        left = lmap2(lambda a, b: a * jax.nn.sigmoid(b), left1, right1)
        right = lmap2(lambda a, b: a * jax.nn.sigmoid(b), left2, right2)
        right = lmap(lambda x: upsample(x, 4, "nearest"), right)
        out = ConvBNReLU(128, 3, name="conv", **cfg)(
            lmap2(lambda a, b: a + b, left, right), train=train
        )
        return out


@MODELS.register("bisenetv2")
class BiSeNetV2(nn.Module):
    """Multi-dataset BiSeNetV2 (reference: lib/models/bisenetv2.py:541-782).

    n_classes: per-dataset class counts (length = n_datasets = n_bn).
    Train call takes per-dataset input list and returns per-dataset lists of
    main + aux logits at input resolution (float32), matching the reference
    head set (:551-567, :628-631).
    """

    n_classes: Sequence[int]
    n_bn: int = 1
    aux: bool = True
    shared_affine: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = dict(n_bn=self.n_bn, shared_affine=self.shared_affine, dtype=self.dtype)
        self.detail = DetailBranch(**cfg)
        self.segment = SegmentBranch(**cfg)
        self.bga = BGALayer(**cfg)
        self.head = [
            SegmentHead(1024, n, up_factor=8, aux=False, dtype=self.dtype)
            for n in self.n_classes
        ]
        if self.aux:
            self.aux2 = [SegmentHead(128, n, up_factor=4, dtype=self.dtype) for n in self.n_classes]
            self.aux3 = [SegmentHead(128, n, up_factor=8, dtype=self.dtype) for n in self.n_classes]
            self.aux4 = [SegmentHead(128, n, up_factor=16, dtype=self.dtype) for n in self.n_classes]
            self.aux5_4 = [SegmentHead(128, n, up_factor=32, dtype=self.dtype) for n in self.n_classes]

    def backbone(self, xs: MultiX, *, train: bool):
        xs = lmap(lambda x: x.astype(self.dtype), xs)
        feat_d = self.detail(xs, train=train)
        feat2, feat3, feat4, feat5_4, feat_s = self.segment(xs, train=train)
        feat_head = self.bga(feat_d, feat_s, train=train)
        return feat_head, (feat2, feat3, feat4, feat5_4)

    def __call__(self, xs: MultiX, *, train: bool = True, up: bool = True):
        """Train forward. Returns dict(logits=[per-dataset main logits],
        aux=[4 per-dataset aux-logit lists]) — (b_i, H, W, n_classes_i).

        up=False leaves every head's logits at head resolution and adds
        'up_factors' = (main_factor, [aux factors]) so the loss can run the
        fused phase-decomposed upsample+CE (losses/ohem_ce.py
        cross_entropy_upsampled) — the full-res class volumes are the
        largest tensors in the train graph and never need to exist."""
        feat_head, feats_aux = self.backbone(xs, train=train)
        logits = [
            self.head[i](p, train=train, up=up) if p is not None else None
            for i, p in enumerate(feat_head)
        ]
        out = {"logits": logits}
        if not up:
            out["up_factors"] = (
                self.head[0].residual_factor,
                [self.aux2[0].residual_factor, self.aux3[0].residual_factor,
                 self.aux4[0].residual_factor, self.aux5_4[0].residual_factor]
                if self.aux else [],
            )
        if self.aux and train:
            aux_heads = [self.aux2, self.aux3, self.aux4, self.aux5_4]
            out["aux"] = [
                [
                    heads[i](p, train=train, up=up) if p is not None else None
                    for i, p in enumerate(feat)
                ]
                for heads, feat in zip(aux_heads, feats_aux)
            ]
        return out

    def eval_logits(self, x: jax.Array, dataset: int = 0):
        """aux_mode='eval' path: main logits for one dataset (ref :632-635)."""
        xs = as_multi(x, dataset, self.n_bn)
        feat_head, _ = self.backbone(xs, train=False)
        return self.head[dataset](feat_head[dataset], train=False)

    def pred(self, x: jax.Array, dataset: int = 0):
        """aux_mode='pred': argmax label map (ref :636-639). With
        set_pred_impl('fused') the final ×8 bilinear + argmax run as one
        Pallas pass that never writes the full-res class volume to HBM
        (ops/pallas/upsample_argmax.py)."""
        from mds_tpu.models.layers import get_pred_impl

        if get_pred_impl() == "fused":
            from mds_tpu.ops.pallas.upsample_argmax import upsample_argmax_pallas

            xs = as_multi(x, dataset, self.n_bn)
            feat_head, _ = self.backbone(xs, train=False)
            head = self.head[dataset]
            logits = head(feat_head[dataset], train=False, up=False)
            return upsample_argmax_pallas(logits, head.residual_factor)
        return jnp.argmax(self.eval_logits(x, dataset), axis=-1)


@MODELS.register("bisenetv2_origin")
def bisenetv2_origin(n_classes, n_bn=1, dtype=jnp.float32, **kw):
    """Pre-shared-affine variant: per-dataset BN with its own affine
    (reference: lib/models/bisenetv2_origin.py:22 — ModuleList of
    BatchNorm2d(affine=True))."""
    return BiSeNetV2(n_classes=n_classes, n_bn=n_bn, shared_affine=False,
                     dtype=dtype, **kw)
