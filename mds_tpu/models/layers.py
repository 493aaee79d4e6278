"""Core Flax building blocks: per-dataset BatchNorm and conv blocks.

TPU-native redesign of the reference's multi-dataset ConvBNReLU/ConvBN
(lib/models/bisenetv2.py:12-127). The reference concatenates per-dataset
sub-batches for the conv, then loops per-dataset `BatchNorm2d(affine=False)` +
one shared affine pair. Here multi-dataset activations flow as a **list of
per-dataset arrays** (None for absent datasets): under data-parallel pjit each
per-dataset array is independently sharded along its batch axis, so every
slice/BN/conv is device-local and XLA only inserts the collectives that are
semantically required (grad all-reduce + BN global moments = SyncBN).

A stacked-batch design was rejected on purpose: static per-dataset slices of
one concatenated batch straddle shard boundaries (sub-batch sizes aren't
multiples of the per-device chunk), forcing all-to-alls on every BN split.

Conventions: layout NHWC; params float32; compute dtype configurable
(bfloat16 on TPU); BN statistics in float32.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any
MultiX = Sequence[Optional[jax.Array]]  # one entry per dataset, None = absent


def lmap(fn: Callable, xs: MultiX) -> List[Optional[jax.Array]]:
    """Map over a per-dataset list, passing None through."""
    return [None if x is None else fn(x) for x in xs]


def lmap2(fn: Callable, xs: MultiX, ys: MultiX) -> List[Optional[jax.Array]]:
    return [
        None if (x is None or y is None) else fn(x, y) for x, y in zip(xs, ys)
    ]


def as_multi(x: jax.Array, dataset: int, n: int) -> List[Optional[jax.Array]]:
    """Wrap a single-dataset tensor into the list form."""
    return [x if i == dataset else None for i in range(n)]


class DatasetNorm(nn.Module):
    """BatchNorm with per-dataset running statistics.

    Mirrors the reference's `nn.ModuleList([BatchNorm2d(affine=False)]*n_bn)`
    plus shared affine weight/bias (lib/models/bisenetv2.py:22-26,44-48) when
    `shared_affine=True`; the per-dataset-affine variant
    (lib/models/bisenetv2_origin.py:22) when `shared_affine=False`.

    torch parity: running stats update uses momentum 0.1 with the unbiased
    batch variance; normalization uses the biased variance. Under pjit with
    batch-sharded inputs the moments are global-batch moments (SyncBN
    semantics — reference's optional convert_sync_batchnorm,
    tools/train_amp.py:130).
    """

    features: int
    n_bn: int = 1
    momentum: float = 0.1
    eps: float = 1e-5
    affine: bool = True
    shared_affine: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: MultiX, *, train: bool,
                 fold: bool = False) -> List[Optional[Any]]:
        c = self.features
        assert len(xs) == self.n_bn, (len(xs), self.n_bn)
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

        if fold:
            # deploy fold: return per-dataset (scale, bias) so the eval-mode
            # BN collapses into the preceding conv (y = conv(x)·s + b).
            # Entry i is None where xs[i] is None; variable creation order is
            # identical to the normalize path, so param trees match.
            assert not train, "BN folding is eval-only"
            coeffs: List[Optional[Tuple[jax.Array, jax.Array]]] = []
            for i, x in enumerate(xs):
                if x is None:
                    coeffs.append(None)
                    continue
                inv = jax.lax.rsqrt(ra_var.value[i] + self.eps)
                if self.affine:
                    s = scale if self.shared_affine else scale[i]
                    b = bias if self.shared_affine else bias[i]
                else:
                    s, b = 1.0, 0.0
                s_full = inv * s
                coeffs.append((s_full, b - ra_mean.value[i] * s_full))
            return coeffs

        mutable = self.is_mutable_collection("batch_stats")
        new_mean, new_var = ra_mean.value, ra_var.value
        outs: List[Optional[jax.Array]] = []
        for i, x in enumerate(xs):
            if x is None:
                outs.append(None)
                continue
            xf = x.astype(jnp.float32)
            red_axes = tuple(range(x.ndim - 1))
            if train:
                m = jnp.mean(xf, axis=red_axes)
                v = jnp.mean(jnp.square(xf - m), axis=red_axes)
                cnt = 1
                for d in x.shape[:-1]:
                    cnt *= d
                unbiased = v * (cnt / max(cnt - 1, 1))
                new_mean = new_mean.at[i].set(
                    (1 - self.momentum) * new_mean[i] + self.momentum * m
                )
                new_var = new_var.at[i].set(
                    (1 - self.momentum) * new_var[i] + self.momentum * unbiased
                )
            else:
                m = ra_mean.value[i]
                v = ra_var.value[i]
            inv = jax.lax.rsqrt(v + self.eps)
            outs.append(_affine(i, (xf - m) * inv).astype(self.dtype))
        if train and mutable and not self.is_initializing():
            ra_mean.value = new_mean
            ra_var.value = new_var
        return outs


def conv_init() -> Callable:
    """He/kaiming normal fan-out — the reference's init convention
    (lib/models/bisenetv2.py init_weight, kaiming_normal_ fan_out)."""
    return nn.initializers.variance_scaling(2.0, "fan_out", "normal")


# Depthwise-conv path selection, measured on the real v5e chip (chained-loop
# methodology, 2026-08-16): XLA's grouped-conv lowering matches or beats both
# the shift-add decomposition (ops/depthwise.py) and the Pallas row-tile
# kernel at every BiSeNetV2 deploy shape — e.g. (256,512,16,m6,s2):
# XLA 0.73 ms vs shift-add 1.30 ms. The alternative kernels are kept for
# backends where grouped conv lowers badly; select with set_depthwise_impl.
_DEPTHWISE_IMPL = "xla"  # "xla" (hybrid vjp) | "xla_ad" | "shift" | "pallas"


def set_depthwise_impl(impl: str) -> None:
    assert impl in ("xla", "xla_ad", "shift", "pallas"), impl
    global _DEPTHWISE_IMPL
    _DEPTHWISE_IMPL = impl


def use_pallas_depthwise(enable: bool = True) -> None:
    set_depthwise_impl("pallas" if enable else "xla")


# Stem-conv implementation for stride-2 3×3 convs on few-channel (RGB)
# inputs. These convs cost 3.6 ms of a 9.0 ms BiSeNetV2 deploy graph on v5e
# (XLA's emitter keeps C=3 on the 128-lane minor axis). Measured in-graph on
# the real chip: "plain" (XLA conv) 92 FPS end-to-end; "s2d" (space-to-depth)
# 51 FPS; "planes" (im2col matmul — XLA lowers the strided parity slices to
# s32 gather machinery) 13 FPS; "pallas" (ops/pallas/stem.py — bitcast-based
# column deinterleave + 27-row MXU dots) is the fast path for bf16 deploy
# graphs, enabled by bench/export.
_STEM_IMPL = "plain"  # "plain" | "pallas" | "planes" | "s2d"


def set_stem_impl(impl: str) -> None:
    assert impl in ("plain", "pallas", "planes", "s2d"), impl
    global _STEM_IMPL
    _STEM_IMPL = impl


def enable_s2d_stem(enable: bool = True) -> None:
    set_stem_impl("s2d" if enable else "plain")


# Eval-path fused 3×3 s1 conv (ops/pallas/conv3x3.py) for the low-channel
# full-resolution convs whose XLA lowering is dominated by layout copies
# (profiled v5e: detail S1_2 costs 0.62 ms conv + ~0.9 ms relu/layout
# copies at 512×1024×64). MEASURED 2026-08-17 (bench.py end-to-end):
# XLA 123.6 FPS > pallas K-packed row-loop kernel gated to S1_2 only 121.1
# (plain row loop: 117.7; older tap-materializing kernel: 112.0; on all
# c_in≤64 convs: 78.1) — even with dy-pair K=128 packing the kernel trails
# XLA's conv including its layout copies by ~2%. Default stays "xla"; the path is
# kept for backends/shapes where grouped lowering degrades.
_CONV3_EVAL_IMPL = "xla"  # "xla" | "pallas"


def set_conv3_eval_impl(impl: str) -> None:
    assert impl in ("xla", "pallas"), impl
    global _CONV3_EVAL_IMPL
    _CONV3_EVAL_IMPL = impl


# Deploy pred path: "fused" runs the final bilinear-×N-upsample + argmax as
# one Pallas pass (ops/pallas/upsample_argmax.py) that never materializes
# the full-res class volume in HBM (~160 MB at 1024×2048×19). MEASURED
# 2026-08-17 on v5e (bench.py methodology): head+resize+argmax 0.87 ms →
# fused keeps only the head matmul; end-to-end 121.7 → see bench notes.
_PRED_IMPL = "xla"  # "xla" | "fused"


def set_pred_impl(impl: str) -> None:
    assert impl in ("xla", "fused"), impl
    global _PRED_IMPL
    _PRED_IMPL = impl


def get_pred_impl() -> str:
    return _PRED_IMPL


# Deploy detail-branch S1 pair fusion: run S1_1 (stem) + S1_2 as ONE Pallas
# kernel (ops/pallas/stem.py stem_s1_pair_fused) so the S1_1 activation
# never leaves VMEM — kills the custom-call↔conv boundary layout copies
# (~1 ms) and the 134 MB HBM roundtrip the trace showed (2026-08-17).
_DETAIL_FUSE = False


def set_detail_fuse(enable: bool = True) -> None:
    global _DETAIL_FUSE
    _DETAIL_FUSE = enable


def get_detail_fuse() -> bool:
    return _DETAIL_FUSE


# Level-2 detail fusion: S2_2…S3_3 as one more Pallas kernel
# (ops/pallas/stem.py detail_tail_fused). Only consulted when the S1-pair
# fusion above is active. MEASURED NEGATIVE on v5e 2026-08-18 (1024×2048
# bf16 deploy graph, 4×-interleaved A/B, median-of-5): 158.3 FPS off vs
# 156.2 on — the kernel replaces ~0.79 ms of XLA convs + boundary layout
# copies with a 0.73 ms custom call, but the while-loop schedule loses the
# overlap XLA found between those convs and the S1-pair kernel's DMAs. The
# 64-ch convs' N=64 lanes and the ~1.6× row-halo recompute also cap the
# kernel at ~2.4× its dot-bound. Kept selectable for backends where XLA's
# small-channel convs degrade.
_DETAIL_TAIL = False


def set_detail_tail(enable: bool = True) -> None:
    global _DETAIL_TAIL
    _DETAIL_TAIL = enable


def get_detail_tail() -> bool:
    return _DETAIL_TAIL


class DepthwiseConv3x3(nn.Module):
    """Depthwise/grouped 3×3 conv. Default: XLA grouped conv (fastest measured
    on v5e, differentiable). Alternatives via set_depthwise_impl: 'shift' = 9
    shifted multiply-adds (differentiable), 'pallas' = row-tile VPU kernel
    (forward-only). Parameter name/shape match nn.Conv's HWIO grouped layout
    so checkpoints are interchangeable."""

    out_chan: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from mds_tpu.ops.depthwise import kernel_from_hwio

        c_in = x.shape[-1]
        kernel = self.param(
            "kernel", conv_init(), (3, 3, 1, self.out_chan), jnp.float32
        )
        if _DEPTHWISE_IMPL == "pallas":
            from mds_tpu.ops.pallas.depthwise import depthwise3x3_pallas

            w = kernel_from_hwio(kernel.astype(self.dtype), c_in)
            return depthwise3x3_pallas(x.astype(self.dtype), w, self.stride)
        if _DEPTHWISE_IMPL == "shift":
            from mds_tpu.ops.depthwise import depthwise_conv3x3

            w = kernel_from_hwio(kernel.astype(self.dtype), c_in)
            return depthwise_conv3x3(x.astype(self.dtype), w, self.stride)
        if _DEPTHWISE_IMPL == "xla_ad":
            # pure-autodiff escape hatch; no preferred_element_type here:
            # with bf16 operands its f32 output makes the conv VJP see
            # mixed dtypes and fail under jax.grad
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                (self.stride, self.stride), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c_in,
            )
        # "xla": XLA grouped conv forward/input-grad + 9-tap weight-grad —
        # identical forward lowering, ~2× faster backward (measured v5e,
        # see ops/depthwise.py depthwise_conv3x3_hybrid)
        from mds_tpu.ops.depthwise import depthwise_conv3x3_hybrid

        return depthwise_conv3x3_hybrid(
            x.astype(self.dtype), kernel.astype(self.dtype), self.stride
        )


class StemConv3x3S2(nn.Module):
    """Full-resolution stride-2 3×3 stem conv on a few-channel (RGB) input.

    XLA's own emitter keeps the 3-wide channel dim on the 128-lane minor
    axis (2.3% lane utilization) — these two convs cost 3.6 ms of a 9.0 ms
    BiSeNetV2 deploy graph on v5e. The default "planes" path
    (ops/space_to_depth.conv3x3_s2_via_planes) rewrites the conv as a
    27-row-patch matmul with full-lane layouts; it is exact and
    differentiable. Param layout matches nn.Conv HWIO (3,3,C,O); odd
    spatial sizes fall back to the plain conv."""

    out_chan: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, scale: Optional[jax.Array] = None,
                 bias: Optional[jax.Array] = None,
                 relu: bool = False) -> jax.Array:
        """Plain stem conv; with (scale, bias) — folded eval-BN coefficients —
        the whole conv→BN→[ReLU] chain runs fused (bf16 out, no f32
        intermediate) on the Pallas path, with an exact elementwise fallback
        elsewhere."""
        from mds_tpu.ops.space_to_depth import (
            conv3x3_s2_via_planes,
            conv3x3_s2_via_s2d,
        )

        c_in = x.shape[-1]
        kernel = self.param(
            "kernel", conv_init(), (3, 3, c_in, self.out_chan), jnp.float32
        )
        x = x.astype(self.dtype)
        even = x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
        fused = scale is not None
        pallas_ok = (
            even and _STEM_IMPL == "pallas" and x.dtype == jnp.bfloat16
            and c_in == 3
        )
        if fused and pallas_ok:
            from mds_tpu.ops.pallas.stem import stem_conv_bn_relu_s2

            return stem_conv_bn_relu_s2(
                x, kernel.astype(self.dtype), scale, bias, relu=relu
            )
        if pallas_ok:
            from mds_tpu.ops.pallas.stem import stem_conv3x3_s2

            y = stem_conv3x3_s2(x, kernel.astype(self.dtype))
        elif even and _STEM_IMPL == "planes":
            y = conv3x3_s2_via_planes(x, kernel.astype(self.dtype))
        elif even and _STEM_IMPL == "s2d":
            y = conv3x3_s2_via_s2d(x, kernel.astype(self.dtype))
        else:
            y = jax.lax.conv_general_dilated(
                x, kernel.astype(self.dtype), (2, 2), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if fused:
            y = y.astype(jnp.float32) * scale + bias
            if relu:
                y = jnp.maximum(y, 0.0)
            y = y.astype(self.dtype)
        return y


class Conv3x3S1Fusable(nn.Module):
    """3×3 s1 conv whose eval path can run the Pallas fused
    conv-BN-ReLU kernel (ops/pallas/conv3x3.py) — targeted at the
    low-channel full-resolution convs where XLA's lowering spends more on
    layout copies around the conv+ReLU than on the conv itself (profiled
    v5e: detail S1_2 = 0.62 ms conv + ~0.9 ms copies at 512×1024×64).
    Param layout matches nn.Conv (HWIO 'kernel') so trees are identical."""

    out_chan: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, scale: Optional[jax.Array] = None,
                 bias: Optional[jax.Array] = None,
                 relu: bool = False) -> jax.Array:
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel", conv_init(), (3, 3, c_in, self.out_chan), jnp.float32
        )
        x = x.astype(self.dtype)
        fused = scale is not None
        if (
            fused and x.dtype == jnp.bfloat16 and x.shape[1] >= 512
            and jax.default_backend() == "tpu"
        ):
            from mds_tpu.ops.pallas.conv3x3 import conv3x3_bn_relu_pallas

            return conv3x3_bn_relu_pallas(
                x, kernel.astype(self.dtype), scale, bias, relu=relu
            )
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(self.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if fused:
            y = y.astype(jnp.float32) * scale + bias
            if relu:
                y = jnp.maximum(y, 0.0)
            y = y.astype(self.dtype)
        return y


class BNFold(nn.Module):
    """Declares nn.BatchNorm's EXACT variable set (params scale/bias,
    batch_stats mean/var, f32, feature-shaped) and returns the folded
    eval-mode (scale, bias) affine pair — lets a parent fold a plain
    nn.BatchNorm into a fused Pallas kernel (e.g. the ResNet 7×7 stem)
    without changing the param tree or checkpoint layout."""

    feats: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones, (self.feats,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.feats,), jnp.float32
        )
        mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.feats,), jnp.float32),
        )
        var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.feats,), jnp.float32),
        )
        s = scale * jax.lax.rsqrt(var.value + self.eps)
        return s, bias - mean.value * s


class _ConvKernelHolder(nn.Module):
    """Declares the same 'kernel' param an nn.Conv named alike would —
    lets a parent read a conv's raw weights for cross-layer fusion without
    changing the param tree."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self) -> jax.Array:
        return self.param("kernel", conv_init(), self.shape, jnp.float32)


class ConvBNReLU(nn.Module):
    """conv → per-dataset BN → shared affine → ReLU
    (reference: lib/models/bisenetv2.py:12-74). One conv (shared weights)
    applied to each dataset's array. Grouped 3×3 convs with groups == C_in
    take the fast depthwise path; stride-2 3×3 convs on few-channel inputs
    (the RGB stems) take the space-to-depth path."""

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
    def __call__(self, xs: MultiX, *, train: bool,
                 emit: Optional[str] = None,
                 emit_c_in: Optional[int] = None) -> List[Optional[jax.Array]]:
        c_in = emit_c_in or next(x.shape[-1] for x in xs if x is not None)
        if emit == "folded":
            # deploy cross-layer fusion support: hand the caller the RAW
            # conv kernel + per-dataset folded eval-BN (scale, bias) instead
            # of applying — consumed by fused multi-layer Pallas kernels
            # (e.g. the detail-stem pair, ops/pallas/stem.py). The param
            # tree is untouched: the holder declares the same 'conv/kernel'.
            assert not train and self.groups == 1 and not self.bias
            kernel = _ConvKernelHolder(
                (self.ks, self.ks, c_in, self.out_chan), name="conv"
            )()
            coeffs = DatasetNorm(
                self.out_chan, n_bn=self.n_bn,
                shared_affine=self.shared_affine, dtype=self.dtype, name="bn",
            )(xs, train=False, fold=True)
            return kernel, coeffs
        if (
            self.groups == c_in and self.ks == 3 and self.dilation == 1
            and not self.bias
        ):
            conv = DepthwiseConv3x3(
                self.out_chan, self.stride, self.dtype, name="conv"
            )
        elif (
            _STEM_IMPL != "plain" and self.groups == 1 and self.ks == 3
            and self.stride == 2 and self.dilation == 1 and not self.bias
            and c_in <= 4
        ):
            conv = StemConv3x3S2(self.out_chan, self.dtype, name="conv")
        elif (
            _CONV3_EVAL_IMPL == "pallas" and self.groups == 1 and self.ks == 3
            and self.stride == 1 and self.dilation == 1 and not self.bias
            and c_in <= 64
        ):
            conv = Conv3x3S1Fusable(self.out_chan, self.dtype, name="conv")
        else:
            conv = nn.Conv(
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
            )
        bn = DatasetNorm(
            self.out_chan,
            n_bn=self.n_bn,
            shared_affine=self.shared_affine,
            dtype=self.dtype,
            name="bn",
        )
        if isinstance(conv, StemConv3x3S2) and not train:
            # deploy-fused stem: fold the eval-mode BN into the conv and run
            # conv→affine→ReLU in one pass (bf16 out on the Pallas path)
            coeffs = bn(xs, train=False, fold=True)
            return [
                None if x is None else conv(x, cf[0], cf[1], relu=self.relu)
                for x, cf in zip(xs, coeffs)
            ]
        if isinstance(conv, Conv3x3S1Fusable) and not train:
            coeffs = bn(xs, train=False, fold=True)
            return [
                None if x is None else conv(x, cf[0], cf[1], relu=self.relu)
                for x, cf in zip(xs, coeffs)
            ]
        xs = lmap(conv, xs)
        xs = bn(xs, train=train)
        if self.relu:
            xs = lmap(nn.relu, xs)
        return xs


class ConvBN(ConvBNReLU):
    """ConvBNReLU without the ReLU (reference: lib/models/bisenetv2.py:76-127)."""

    relu: bool = False


def resize_bilinear_ac(x: jax.Array, size_hw: Tuple[int, int]) -> jax.Array:
    """Bilinear resize with align_corners=True (torch F.interpolate parity).

    Output grid maps linearly onto [0, H_in-1]: src = i*(H_in-1)/(H_out-1).
    NHWC, static shapes, gather-based.
    """
    b, h_in, w_in, c = x.shape
    h_out, w_out = size_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    x = x.astype(jnp.float32)

    def grid(n_out, n_in):
        if n_out == 1:
            return jnp.zeros((1,), jnp.float32)
        return jnp.arange(n_out, dtype=jnp.float32) * ((n_in - 1) / (n_out - 1))

    ys = grid(h_out, h_in)
    xs = grid(w_out, w_in)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h_in - 1)
    y1 = jnp.clip(y0 + 1, 0, h_in - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w_in - 1)
    x1 = jnp.clip(x0 + 1, 0, w_in - 1)
    wy = (ys - y0.astype(jnp.float32))[None, :, None, None]
    wx = (xs - x0.astype(jnp.float32))[None, None, :, None]
    rows0 = jnp.take(x, y0, axis=1)
    rows1 = jnp.take(x, y1, axis=1)
    top = jnp.take(rows0, x0, axis=2) * (1 - wx) + jnp.take(rows0, x1, axis=2) * wx
    bot = jnp.take(rows1, x0, axis=2) * (1 - wx) + jnp.take(rows1, x1, axis=2) * wx
    return top * (1 - wy) + bot * wy

@functools.lru_cache(maxsize=64)
def _ac_tap_matrix(n_out: int, n_in: int):
    """Dense (n_out, n_in) f32 interpolation matrix for align_corners=True:
    exactly two taps per row (y0, y0+1) with weights (1−w, w)."""
    import numpy as np

    if n_out == 1 or n_in == 1:
        a = np.zeros((n_out, n_in), np.float32)
        a[:, 0] = 1.0
        return a
    # f32 coordinate math, matching resize_bilinear_ac's on-device grid()
    ys = np.arange(n_out, dtype=np.float32) * np.float32(
        (n_in - 1) / (n_out - 1)
    )
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, n_in - 1)
    y1 = np.minimum(y0 + 1, n_in - 1)
    w = (ys - y0.astype(np.float32)).astype(np.float32)
    a = np.zeros((n_out, n_in), np.float32)
    np.add.at(a, (np.arange(n_out), y0), 1.0 - w)
    np.add.at(a, (np.arange(n_out), y1), w)
    return a


def resize_bilinear_ac_mm(x: jax.Array, size_hw: Tuple[int, int]) -> jax.Array:
    """align_corners=True bilinear resize as two dense matmuls (NHWC, f32).

    Numerically ≡ resize_bilinear_ac (each interp matrix row has exactly two
    non-zeros; the other products are exact zeros, so HIGHEST-precision f32
    accumulation reproduces the two-tap blend to f32 rounding) but runs on
    the MXU instead of XLA's dynamic-gather lowering — profiled r5, the
    flagship SEG step spent ~25% of its time in the gather fusions + layout
    copies of the six ×4 loss upsamples (f32[768,4,768,C] volumes)."""
    b, h, w, c = x.shape
    h_out, w_out = size_hw
    if (h, w) == (h_out, w_out):
        return x
    x = x.astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    if h != h_out:
        ah = jnp.asarray(_ac_tap_matrix(h_out, h))
        x = jnp.einsum("oh,bhwc->bowc", ah, x, precision=hi)
    if w != w_out:
        aw = jnp.asarray(_ac_tap_matrix(w_out, w))
        x = jnp.einsum("pw,bowc->bopc", aw, x, precision=hi)
    return x


def upsample(x: jax.Array, factor: int, method: str = "nearest") -> jax.Array:
    """Integer-factor spatial upsample, NHWC.

    'nearest' matches torch nn.Upsample default; 'bilinear' matches torch
    align_corners=False (half-pixel — jax.image 'linear' convention)."""
    b, h, w, c = x.shape
    if method == "nearest":
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
    """torch MaxPool2d(3, stride=2, padding=1, ceil_mode=False) equivalent.

    Measured negative result (v5e, 2026-08-17): a separable strided-slice
    max (3 strided row slices + 3 column slices of elementwise maximum) beat
    reduce-window STANDALONE (0.27 ms saved at (1,512,1024,16)) but cost
    ~17 FPS end-to-end in the deploy graph (121→104) — the six strided
    slices block XLA from fusing the pool with its producers and force
    extra layout copies. reduce-window stays as the FORWARD and XLA's
    SelectAndScatter as the BACKWARD: the mask/dilate custom VJP in
    ops/maxpool.py ("fast") measured 62.8 vs 102.1 img/s in the full bs16
    train step (v5e 2026-08-18 — its nine interior-pad sweeps cost ~8.4 ms
    each in-graph; the standalone microbench had not reproduced the
    in-graph layouts). set_maxpool_impl("fast") keeps it selectable."""
    if _MAXPOOL_IMPL == "fast":
        from mds_tpu.ops.maxpool import max_pool_3x3_s2_fast

        return max_pool_3x3_s2_fast(x)
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])


_MAXPOOL_IMPL = "xla"  # "xla" (SelectAndScatter bwd) | "fast" (mask/pad VJP)


def set_maxpool_impl(impl: str) -> None:
    assert impl in ("fast", "xla"), impl
    global _MAXPOOL_IMPL
    _MAXPOOL_IMPL = impl


def avg_pool_3x3_s2(x: jax.Array) -> jax.Array:
    """torch AvgPool2d(3, stride=2, padding=1) with count_include_pad=True."""
    return nn.avg_pool(
        x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)], count_include_pad=True
    )


# Dropout mask source. "threefry" (default, backend-portable) draws uint8
# keep-masks with jax.random.bits; "pallas" routes through the TPU hardware
# PRNG kernel (ops/pallas/dropout.py) — the threefry mask fusion still cost
# ~2.8 ms/step at bs16 512×1024 (v5e profile 2026-08-18), the HW generator
# makes it ~free and the backward regenerates instead of storing the mask.
_DROPOUT_IMPL = "threefry"  # "threefry" | "pallas"


def set_dropout_impl(impl: str) -> None:
    assert impl in ("threefry", "pallas"), impl
    global _DROPOUT_IMPL
    _DROPOUT_IMPL = impl


def auto_dropout_impl() -> str:
    """Pick the HW-PRNG dropout on TPU backends ('axon' = the remote-tunnel
    TPU platform), the portable threefry path elsewhere."""
    try:
        platform = jax.devices()[0].platform
    except Exception:  # backend init failure — stay portable
        return "threefry"
    return "pallas" if platform in ("tpu", "axon") else "threefry"


class FastDropout(nn.Module):
    """Dropout whose keep-mask comes from uint8 random draws.

    jax.random.bernoulli materializes a float per element (a full 32-bit
    threefry word each); the SegmentHead's mid=1024 dropout at H/8×W/8
    needs ~134M draws per bs16 512×1024 step and the threefry fusions
    showed up as ~4.7 ms/step on v5e. 8-bit draws need 4× fewer threefry
    blocks; the keep probability is quantized to 1/256, which is
    immaterial for dropout regularization. (The rbg-key alternative was
    measured and rejected — see engine/train_step.py RNG note.)
    set_dropout_impl("pallas") swaps in the hardware-PRNG kernel."""

    rate: float = 0.1
    rng_collection: str = "dropout"

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool) -> jax.Array:
        if deterministic or self.rate == 0.0:
            return x
        key = self.make_rng(self.rng_collection)
        if _DROPOUT_IMPL == "pallas":
            from mds_tpu.ops.pallas.dropout import dropout_u8_pallas

            data = jax.random.key_data(key)
            seed = jax.lax.bitcast_convert_type(
                data.reshape(-1)[:2], jnp.int32
            )
            return dropout_u8_pallas(x, seed, self.rate)
        drop = int(round(self.rate * 256))
        bits = jax.random.bits(key, x.shape, jnp.uint8)
        scale = jnp.asarray(256.0 / (256.0 - drop), x.dtype)
        return jnp.where(bits >= jnp.uint8(drop), x * scale, jnp.zeros((), x.dtype))


class SegmentHead(nn.Module):
    """Per-dataset segmentation head (reference: lib/models/bisenetv2.py:493-539).

    conv3x3-BN-ReLU(in→mid) → dropout(0.1) → [aux: up×2 nearest →
    conv3x3-BN-ReLU(mid→up_factor²)] → 1×1 conv → bilinear up. Heads are
    per-dataset modules, so n_bn=1 (single-entry list internally)."""

    mid_chan: int
    n_classes: int
    up_factor: int = 8
    aux: bool = True
    dtype: Dtype = jnp.float32

    @property
    def residual_factor(self) -> int:
        """Upsample factor still owed when called with up=False."""
        return self.up_factor // 2 if self.aux else self.up_factor

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool, up: bool = True) -> jax.Array:
        (x,) = ConvBNReLU(self.mid_chan, 3, dtype=self.dtype, name="conv")(
            [x], train=train
        )
        x = FastDropout(0.1)(x, deterministic=not train)
        if self.aux:
            mid2 = self.up_factor * self.up_factor
            x = upsample(x, 2, "nearest")
            (x,) = ConvBNReLU(mid2, 3, dtype=self.dtype, name="conv1")([x], train=train)
        x = nn.Conv(
            self.n_classes, (1, 1), use_bias=True, dtype=self.dtype,
            param_dtype=jnp.float32, name="conv_out",
        )(x)
        factor = self.residual_factor
        if up and factor > 1:
            # resize in the compute dtype: the full-res class volume is the
            # biggest tensor in the whole graph (1024×2048×19) — keeping it
            # bf16 halves the dominant HBM traffic of the deploy path.
            # (up=False leaves the logits at head resolution — the fused
            # upsample+argmax pred path consumes them directly.)
            b, h, w, c = x.shape
            x = jax.image.resize(
                x, (b, h * factor, w * factor, c), method="linear"
            )
        return x
