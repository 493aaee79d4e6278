"""Core Flax building blocks: per-dataset BatchNorm and fused conv blocks.

TPU-native redesign of the reference's multi-dataset ConvBNReLU/ConvBN
(lib/models/bisenetv2.py:12-127): the reference concatenates per-dataset
sub-batches for the conv and then runs a python loop of per-dataset
`nn.BatchNorm2d(affine=False)` + one shared affine pair. Here the batch plan
(per-dataset sub-batch sizes) is **static**, so the split is a static slice
under jit: XLA sees one big conv (MXU-friendly) and n small normalization
fusions — no ragged control flow, no dynamic shapes.

Conventions:
  * layout NHWC (TPU conv layout), params float32, compute dtype configurable
    (bfloat16 for training/inference on TPU);
  * BN statistics always computed in float32;
  * under pjit with a data-sharded batch, BN moments are global-batch moments
    (= SyncBatchNorm semantics; the reference's optional
    nn.SyncBatchNorm.convert_sync_batchnorm, tools/train_amp.py:130).

A "batch plan" is `splits: Tuple[int, ...]` of per-dataset sub-batch sizes in
dataset order (zeros allowed). Eval mode passes a static `dataset` index
instead, selecting that dataset's running stats.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any
BatchPlan = Tuple[int, ...]


def plan_total(splits: BatchPlan) -> int:
    return int(sum(splits))


class DatasetNorm(nn.Module):
    """BatchNorm with per-dataset running statistics.

    Mirrors the reference's `nn.ModuleList([BatchNorm2d(affine=False)]*n_bn)`
    plus shared affine weight/bias (lib/models/bisenetv2.py:22-26,44-48) when
    `shared_affine=True`; the bisenetv2_origin per-dataset-affine variant
    (lib/models/bisenetv2_origin.py:22) when `shared_affine=False`.

    torch parity: running stats update uses momentum 0.1 with the unbiased
    batch variance; normalization uses the biased variance.
    """

    features: int
    n_bn: int = 1
    momentum: float = 0.1
    eps: float = 1e-5
    affine: bool = True
    shared_affine: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        train: bool,
        splits: Optional[BatchPlan] = None,
        dataset: int = 0,
    ) -> jax.Array:
        c = self.features
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.n_bn, c), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.n_bn, c), jnp.float32)
        )
        scale = bias = None
        if self.affine:
            shape = (c,) if self.shared_affine else (self.n_bn, c)
            scale = self.param("scale", nn.initializers.ones, shape, jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, shape, jnp.float32)

        def _affine(i: int, y: jax.Array) -> jax.Array:
            if not self.affine:
                return y
            s = scale if self.shared_affine else scale[i]
            b = bias if self.shared_affine else bias[i]
            return y * s + b

        red_axes = tuple(range(x.ndim - 1))  # all but channel

        if not train:
            m = ra_mean.value[dataset]
            v = ra_var.value[dataset]
            inv = jax.lax.rsqrt(v + self.eps)
            y = (x.astype(jnp.float32) - m) * inv
            return _affine(dataset, y).astype(self.dtype)

        if splits is None:
            splits = tuple(
                x.shape[0] if i == dataset else 0 for i in range(self.n_bn)
            )
        assert len(splits) == self.n_bn, (splits, self.n_bn)
        assert sum(splits) == x.shape[0], (splits, x.shape)

        mutable = self.is_mutable_collection("batch_stats")
        new_mean, new_var = ra_mean.value, ra_var.value
        outs = []
        start = 0
        for i, b in enumerate(splits):
            if b == 0:
                continue
            xi = jax.lax.slice_in_dim(x, start, start + b, axis=0)
            start += b
            xf = xi.astype(jnp.float32)
            m = jnp.mean(xf, axis=red_axes)
            v = jnp.mean(jnp.square(xf - m), axis=red_axes)
            inv = jax.lax.rsqrt(v + self.eps)
            y = (xf - m) * inv
            outs.append(_affine(i, y).astype(self.dtype))
            # unbiased variance for the running stat (torch semantics)
            cnt = 1
            for d in xi.shape[:-1]:
                cnt *= d
            unbiased = v * (cnt / max(cnt - 1, 1))
            new_mean = new_mean.at[i].set(
                (1 - self.momentum) * new_mean[i] + self.momentum * m
            )
            new_var = new_var.at[i].set(
                (1 - self.momentum) * new_var[i] + self.momentum * unbiased
            )
        if mutable and not self.is_initializing():
            ra_mean.value = new_mean
            ra_var.value = new_var
        return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


def conv_init() -> Callable:
    """He/kaiming normal fan-out — the reference's init_weight convention
    (lib/models/bisenetv2.py:654-663 kaiming_normal_, fan_out)."""
    return nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class ConvBNReLU(nn.Module):
    """conv → per-dataset BN → shared affine → ReLU
    (reference: lib/models/bisenetv2.py:12-74)."""

    out_chan: int
    ks: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    n_bn: int = 1
    relu: bool = True
    bias: bool = False
    shared_affine: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        *,
        train: bool,
        splits: Optional[BatchPlan] = None,
        dataset: int = 0,
    ) -> jax.Array:
        x = nn.Conv(
            self.out_chan,
            (self.ks, self.ks),
            strides=self.stride,
            padding=[(self.dilation * (self.ks // 2),) * 2] * 2,
            kernel_dilation=self.dilation,
            feature_group_count=self.groups,
            use_bias=self.bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=conv_init(),
            name="conv",
        )(x)
        x = DatasetNorm(
            self.out_chan,
            n_bn=self.n_bn,
            shared_affine=self.shared_affine,
            dtype=self.dtype,
            name="bn",
        )(x, train=train, splits=splits, dataset=dataset)
        if self.relu:
            x = nn.relu(x)
        return x


class ConvBN(ConvBNReLU):
    """ConvBNReLU without the ReLU (reference: lib/models/bisenetv2.py:76-127)."""

    relu: bool = False


def upsample(x: jax.Array, factor: int, method: str = "nearest") -> jax.Array:
    """Integer-factor spatial upsample, NHWC.

    method='nearest' matches torch nn.Upsample default; method='bilinear'
    matches torch bilinear with align_corners=False (half-pixel convention —
    jax.image.resize 'linear' uses the same)."""
    b, h, w, c = x.shape
    if method == "nearest":
        # exact + cheap: repeat (jax.image 'nearest' matches this for integer factors)
        x = jnp.repeat(x, factor, axis=1)
        return jnp.repeat(x, factor, axis=2)
    out = jax.image.resize(
        x.astype(jnp.float32), (b, h * factor, w * factor, c), method="linear"
    )
    return out.astype(x.dtype)


def resize_bilinear(x: jax.Array, size_hw: Tuple[int, int]) -> jax.Array:
    """Bilinear resize to target size (align_corners=False semantics)."""
    b, _, _, c = x.shape
    out = jax.image.resize(
        x.astype(jnp.float32), (b, size_hw[0], size_hw[1], c), method="linear"
    )
    return out.astype(x.dtype)


def max_pool_3x3_s2(x: jax.Array) -> jax.Array:
    """torch MaxPool2d(3, stride=2, padding=1, ceil_mode=False) equivalent."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])


def avg_pool_3x3_s2(x: jax.Array) -> jax.Array:
    """torch AvgPool2d(3, stride=2, padding=1) with count_include_pad=True."""
    return nn.avg_pool(
        x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)], count_include_pad=True
    )


class SegmentHead(nn.Module):
    """Per-dataset segmentation head (reference: lib/models/bisenetv2.py:493-539).

    conv3x3-BN-ReLU(in→mid) → dropout(0.1) → [aux: up×2 nearest →
    conv3x3-BN-ReLU(mid→up_factor²)] → 1×1 conv → bilinear up.
    Heads are per-dataset modules so their BN is single (n_bn=1).
    """

    mid_chan: int
    n_classes: int
    up_factor: int = 8
    aux: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        x = ConvBNReLU(self.mid_chan, 3, dtype=self.dtype, name="conv")(
            x, train=train
        )
        x = nn.Dropout(0.1, deterministic=not train)(x)
        if self.aux:
            mid2 = self.up_factor * self.up_factor
            up2 = self.up_factor // 2
            x = upsample(x, 2, "nearest")
            x = ConvBNReLU(mid2, 3, dtype=self.dtype, name="conv1")(x, train=train)
            x = nn.Conv(
                self.n_classes, (1, 1), use_bias=True, dtype=self.dtype,
                param_dtype=jnp.float32, name="conv_out",
            )(x)
            factor = up2
        else:
            x = nn.Conv(
                self.n_classes, (1, 1), use_bias=True, dtype=self.dtype,
                param_dtype=jnp.float32, name="conv_out",
            )(x)
            factor = self.up_factor
        if factor > 1:
            b, h, w, c = x.shape
            x = jax.image.resize(
                x.astype(jnp.float32), (b, h * factor, w * factor, c), method="linear"
            )
        return x.astype(jnp.float32)


def split_batch(x: jax.Array, splits: BatchPlan):
    """Static per-dataset slices of a stacked batch."""
    outs = []
    start = 0
    for b in splits:
        outs.append(
            jax.lax.slice_in_dim(x, start, start + b, axis=0) if b else None
        )
        start += b
    return outs
