"""BiSeNetV1 in Flax (single-dataset, NHWC).

Reference: lib/models/bisenetv1.py (336 LoC): ResNet18 ContextPath with ARM
attention (:96-123, :125-160), SpatialPath (:179-211), FeatureFusionModule
(:213-262), BiSeNetOutput heads — 1 main (×8 up) + 2 aux (×8/×16)
(:60-94, :274-305). aux_mode ∈ {train, eval, pred} → `__call__` /
`eval_logits` / `pred`.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mds_tpu.models.layers import conv_init, upsample
from mds_tpu.models.resnet import Resnet18
from mds_tpu.registry import MODELS

Dtype = Any


class ConvBNReLU1(nn.Module):
    """Single-BN conv block (lib/models/bisenetv1.py:15-39)."""

    out_chan: int
    ks: int = 3
    stride: int = 1
    padding: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        from mds_tpu.models.layers import (
            _STEM_IMPL,
            BNFold,
            _ConvKernelHolder,
        )

        if (
            not train and _STEM_IMPL == "pallas" and self.ks == 7
            and self.stride == 2 and self.padding == 3
            and self.dtype == jnp.bfloat16 and x.shape[-1] == 3
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
        ):
            # deploy path: the SpatialPath 7×7/s2 RGB stem is as
            # lane-starved under XLA as the ResNet conv1 (see
            # models/resnet.py) — same fused Pallas kernel, bn folded
            from mds_tpu.ops.pallas.stem import stem7_conv_bn_relu_s2

            k = _ConvKernelHolder((7, 7, 3, self.out_chan), name="conv")()
            s, b = BNFold(self.out_chan, name="bn")()
            return stem7_conv_bn_relu_s2(
                x.astype(jnp.bfloat16), k, s, b,
                interpret=jax.default_backend() != "tpu",
            )
        x = nn.Conv(self.out_chan, (self.ks, self.ks), strides=self.stride,
                    padding=[(self.padding,) * 2] * 2, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=conv_init(), name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=self.dtype, param_dtype=jnp.float32, name="bn")(x)
        return nn.relu(x)


class AttentionRefinementModule(nn.Module):
    """conv3x3 → GAP → 1×1 conv-BN → sigmoid gate (ref :96-123)."""

    out_chan: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        feat = ConvBNReLU1(self.out_chan, 3, dtype=self.dtype, name="conv")(
            x, train=train
        )
        atten = jnp.mean(feat, axis=(1, 2), keepdims=True)
        atten = nn.Conv(self.out_chan, (1, 1), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="conv_atten")(atten)
        atten = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, param_dtype=jnp.float32,
                             name="bn_atten")(atten)
        return feat * jax.nn.sigmoid(atten)


class ContextPath(nn.Module):
    """ResNet18 + ARM pyramid (ref :125-160). Returns (x8, x16) features."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        feat8, feat16, feat32 = Resnet18(dtype=self.dtype, name="resnet")(
            x, train=train
        )
        avg = jnp.mean(feat32, axis=(1, 2), keepdims=True)
        avg = ConvBNReLU1(128, 1, padding=0, dtype=self.dtype, name="conv_avg")(
            avg, train=train
        )
        feat32_arm = AttentionRefinementModule(128, self.dtype, name="arm32")(
            feat32, train=train
        )
        feat32_sum = feat32_arm + avg
        feat32_up = upsample(feat32_sum, 2, "nearest")
        feat32_up = ConvBNReLU1(128, 3, dtype=self.dtype, name="conv_head32")(
            feat32_up, train=train
        )
        feat16_arm = AttentionRefinementModule(128, self.dtype, name="arm16")(
            feat16, train=train
        )
        feat16_sum = feat16_arm + feat32_up
        feat16_up = upsample(feat16_sum, 2, "nearest")
        feat16_up = ConvBNReLU1(128, 3, dtype=self.dtype, name="conv_head16")(
            feat16_up, train=train
        )
        return feat16_up, feat32_up  # x8, x16


class SpatialPath(nn.Module):
    """3-conv ×8 downsample path (ref :179-211)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        x = ConvBNReLU1(64, 7, 2, 3, self.dtype, name="conv1")(x, train=train)
        x = ConvBNReLU1(64, 3, 2, 1, self.dtype, name="conv2")(x, train=train)
        x = ConvBNReLU1(64, 3, 2, 1, self.dtype, name="conv3")(x, train=train)
        return ConvBNReLU1(128, 1, 1, 0, self.dtype, name="conv_out")(x, train=train)


class FeatureFusionModule(nn.Module):
    """concat → 1×1 conv → GAP-gated residual (ref :213-262)."""

    out_chan: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, fsp, fcp, *, train: bool):
        fcat = jnp.concatenate([fsp, fcp], axis=-1)
        feat = ConvBNReLU1(self.out_chan, 1, 1, 0, self.dtype, name="convblk")(
            fcat, train=train
        )
        atten = jnp.mean(feat, axis=(1, 2), keepdims=True)
        atten = nn.Conv(self.out_chan, (1, 1), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="conv")(atten)
        atten = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, param_dtype=jnp.float32,
                             name="bn")(atten)
        atten = jax.nn.sigmoid(atten)
        return feat * atten + feat


class BiSeNetOutput(nn.Module):
    """conv3x3-BN-ReLU → 1×1 conv → bilinear up (ref :60-94)."""

    mid_chan: int
    n_classes: int
    up_factor: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool, up: bool = True):
        x = ConvBNReLU1(self.mid_chan, 3, dtype=self.dtype, name="conv")(
            x, train=train
        )
        x = nn.Conv(self.n_classes, (1, 1), use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_out")(x)
        if not up:
            return x
        b, h, w, c = x.shape
        x = jax.image.resize(
            x.astype(jnp.float32),
            (b, h * self.up_factor, w * self.up_factor, c), method="linear",
        )
        return x


@MODELS.register("bisenetv1")
class BiSeNetV1(nn.Module):
    """Reference: lib/models/bisenetv1.py:274-324. Single-dataset (the
    reference has no multi-BN V1); `n_classes` accepts a 1-tuple for factory
    parity with BiSeNetV2."""

    n_classes: Sequence[int] = (19,)
    n_bn: int = 1
    aux: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        assert self.n_bn == 1 and len(self.n_classes) == 1, (
            "BiSeNetV1 is single-dataset in the reference"
        )
        n = self.n_classes[0]
        self.cp = ContextPath(self.dtype)
        self.sp = SpatialPath(self.dtype)
        self.ffm = FeatureFusionModule(256, self.dtype)
        self.conv_out = BiSeNetOutput(256, n, up_factor=8, dtype=self.dtype)
        if self.aux:
            self.conv_out16 = BiSeNetOutput(64, n, up_factor=8, dtype=self.dtype)
            self.conv_out32 = BiSeNetOutput(64, n, up_factor=16, dtype=self.dtype)

    def _forward(self, x, *, train: bool):
        x = x.astype(self.dtype)
        feat_cp8, feat_cp16 = self.cp(x, train=train)
        feat_sp = self.sp(x, train=train)
        feat_fuse = self.ffm(feat_sp, feat_cp8, train=train)
        return feat_fuse, feat_cp8, feat_cp16

    def __call__(self, xs, *, train: bool = True, up: bool = True):
        """List-form entry matching the multi-dataset API: xs = [x].

        up=False leaves logits at head resolution and reports 'up_factors'
        for the fused phase-decomposed upsample+OHEM loss (train_step
        fused_up_loss; see models/bisenetv2.py)."""
        x = xs[0] if isinstance(xs, (list, tuple)) else xs
        feat_fuse, feat_cp8, feat_cp16 = self._forward(x, train=train)
        out = {"logits": [self.conv_out(feat_fuse, train=train, up=up)]}
        if not up:
            out["up_factors"] = (
                self.conv_out.up_factor,
                [self.conv_out16.up_factor, self.conv_out32.up_factor]
                if self.aux else [],
            )
        if self.aux and train:
            out["aux"] = [
                [self.conv_out16(feat_cp8, train=train, up=up)],
                [self.conv_out32(feat_cp16, train=train, up=up)],
            ]
        return out

    def eval_logits(self, x, dataset: int = 0):
        feat_fuse, _, _ = self._forward(x, train=False)
        return self.conv_out(feat_fuse, train=False)

    def pred(self, x, dataset: int = 0):
        return jnp.argmax(self.eval_logits(x, dataset), axis=-1)
