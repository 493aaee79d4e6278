"""SwiftNet-pyramid ResNet18 backbone ("snp") in Flax.

Reference: lib/models/resnet_pyramid.py (656 LoC) + lib/module/util.py
(_UpsampleBlend :120-142, _BNReluConv :40-55). Architecture:

  * the ResNet18 trunk runs once per image-pyramid level (1, 1/2, 1/4 —
    bicubic subsample; resnet_pyramid.py:399-410) with **per-level BN sets**
    (BasicBlock bn1/bn2 ModuleLists indexed by level, :169-175);
  * each trunk pass emits 4 skip features (the pre-ReLU residual outputs of
    layer1..4, :183-196) projected to 128-d by 1×1 bottlenecks (:312-319);
  * skips from different pyramid levels land in shifted slots
    (`skips[idx + i] += [s]`, :386-390) and are **summed** per slot;
  * the decoder is a chain of `_UpsampleBlend`s: bilinear-upsample to the
    skip size, add, BN-ReLU-conv3×3 (util.py:133-142), ending at 1/4
    resolution with 128 features (output_stride=4).

Multi-dataset activations flow as per-dataset lists; the snp_rn18 model
shares BN statistics across datasets (only per-level stats — reference
BasicBlock), so the norm here computes joint moments over all list entries
(exactly equal to the reference's stacked-batch BN) while keeping each
dataset's array independently shardable.
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mds_tpu.models.layers import (
    MultiX,
    conv_init,
    lmap,
    lmap2,
    max_pool_3x3_s2,
)

Dtype = Any


class SharedListBN(nn.Module):
    """BatchNorm over the union of a per-dataset list, with n_slots stat sets
    (slot = pyramid level). Moments are the joint moments of all non-None
    entries — identical to BN on the concatenated batch.

    per_dataset=True switches to the `ResNet_mulbn` semantics
    (resnet_pyramid.py:433, MulBNBlock :229-265): each dataset keeps its own
    stats and affine per level (the reference's extra shared-affine pairs are
    dead code — commented out in _mulbn_function_factory :129-130)."""

    features: int
    n_slots: int = 1
    momentum: float = 0.1
    eps: float = 1e-5
    affine: bool = True
    per_dataset: bool = False
    n_datasets: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: MultiX, *, slot: int = 0, train: bool,
                 fold: bool = False) -> List:
        if self.per_dataset:
            assert not fold, "fold is only supported for shared stats"
            return self._per_dataset_call(xs, slot=slot, train=train)
        c = self.features
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.n_slots, c), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.n_slots, c), jnp.float32)
        )
        scale = bias = None
        if self.affine:
            # per-slot affine: the reference's ModuleList BNs own their
            # weight/bias per pyramid level (resnet_pyramid.py:169-175)
            scale = self.param(
                "scale", nn.initializers.ones, (self.n_slots, c), jnp.float32
            )
            bias = self.param(
                "bias", nn.initializers.zeros, (self.n_slots, c), jnp.float32
            )

        if fold:
            # folded eval affine for cross-layer Pallas fusion (the 7×7
            # stem kernel): y = x·s + b per slot
            assert not train and self.affine
            s = scale[slot] * jax.lax.rsqrt(ra_var.value[slot] + self.eps)
            return s, bias[slot] - ra_mean.value[slot] * s
        live = [x for x in xs if x is not None]
        assert live, "SharedListBN needs at least one input"
        if train:
            total = sum(math.prod(x.shape[:-1]) for x in live)
            s1 = sum(
                jnp.sum(x.astype(jnp.float32), axis=tuple(range(x.ndim - 1)))
                for x in live
            )
            s2 = sum(
                jnp.sum(jnp.square(x.astype(jnp.float32)), axis=tuple(range(x.ndim - 1)))
                for x in live
            )
            m = s1 / total
            v = jnp.maximum(s2 / total - jnp.square(m), 0.0)
            if self.is_mutable_collection("batch_stats") and not self.is_initializing():
                unbiased = v * (total / max(total - 1, 1))
                ra_mean.value = ra_mean.value.at[slot].set(
                    (1 - self.momentum) * ra_mean.value[slot] + self.momentum * m
                )
                ra_var.value = ra_var.value.at[slot].set(
                    (1 - self.momentum) * ra_var.value[slot] + self.momentum * unbiased
                )
        else:
            m = ra_mean.value[slot]
            v = ra_var.value[slot]
        inv = jax.lax.rsqrt(v + self.eps)

        def norm(x):
            y = (x.astype(jnp.float32) - m) * inv
            if self.affine:
                y = y * scale[slot] + bias[slot]
            return y.astype(self.dtype)

        return lmap(norm, xs)

    def _per_dataset_call(self, xs: MultiX, *, slot: int, train: bool) -> List:
        c, nd = self.features, self.n_datasets
        assert len(xs) == nd, (len(xs), nd)
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.n_slots, nd, c), jnp.float32),
        )
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.n_slots, nd, c), jnp.float32),
        )
        scale = bias = None
        if self.affine:
            scale = self.param(
                "scale", nn.initializers.ones, (self.n_slots, nd, c), jnp.float32
            )
            bias = self.param(
                "bias", nn.initializers.zeros, (self.n_slots, nd, c), jnp.float32
            )
        mutable = self.is_mutable_collection("batch_stats")
        new_mean, new_var = ra_mean.value, ra_var.value
        outs: List = []
        for i, x in enumerate(xs):
            if x is None:
                outs.append(None)
                continue
            xf = x.astype(jnp.float32)
            red = tuple(range(x.ndim - 1))
            if train:
                m = jnp.mean(xf, axis=red)
                v = jnp.mean(jnp.square(xf - m), axis=red)
                cnt = math.prod(x.shape[:-1])
                new_mean = new_mean.at[slot, i].set(
                    (1 - self.momentum) * new_mean[slot, i] + self.momentum * m
                )
                new_var = new_var.at[slot, i].set(
                    (1 - self.momentum) * new_var[slot, i]
                    + self.momentum * v * (cnt / max(cnt - 1, 1))
                )
            else:
                m, v = ra_mean.value[slot, i], ra_var.value[slot, i]
            y = (xf - m) * jax.lax.rsqrt(v + self.eps)
            if self.affine:
                y = y * scale[slot, i] + bias[slot, i]
            outs.append(y.astype(self.dtype))
        if train and mutable and not self.is_initializing():
            ra_mean.value = new_mean
            ra_var.value = new_var
        return outs


def conv_kxk(out, k=3, stride=1, name=None, dtype=jnp.float32):
    return nn.Conv(
        out, (k, k), strides=stride, padding=[(k // 2,) * 2] * 2, use_bias=False,
        dtype=dtype, param_dtype=jnp.float32, kernel_init=conv_init(), name=name,
    )


class BasicBlock(nn.Module):
    """ResNet BasicBlock with per-level BN; returns (relu_out, pre_relu_skip)
    (reference: resnet_pyramid.py:162-196)."""

    planes: int
    stride: int = 1
    use_downsample: bool = False
    levels: int = 3
    dtype: Dtype = jnp.float32
    remat: bool = False
    mulbn: bool = False
    n_datasets: int = 1

    @nn.compact
    def __call__(self, xs: MultiX, level: int, train: bool):
        conv1 = conv_kxk(self.planes, 3, self.stride, "conv1", self.dtype)
        conv2 = conv_kxk(self.planes, 3, 1, "conv2", self.dtype)
        nkw = dict(per_dataset=self.mulbn, n_datasets=self.n_datasets,
                   dtype=self.dtype)
        bn1 = SharedListBN(self.planes, self.levels, name="bn1", **nkw)
        bn2 = SharedListBN(self.planes, self.levels, name="bn2", **nkw)
        out = bn1(lmap(conv1, xs), slot=level, train=train)
        out = lmap(nn.relu, out)
        out = bn2(lmap(conv2, out), slot=level, train=train)
        residual = xs
        if self.use_downsample:
            # reference quirk kept: the downsample BN is shared across levels
            # (_make_layer builds one Sequential BN; resnet_pyramid.py:266-273)
            dconv = nn.Conv(self.planes, (1, 1), strides=self.stride, use_bias=False,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            kernel_init=conv_init(), name="downsample_conv")
            dbn = SharedListBN(self.planes, 1, name="downsample_bn", **nkw)
            residual = dbn(lmap(dconv, xs), slot=0, train=train)
        skip = lmap2(lambda a, b: a + b, out, residual)
        relu = lmap(nn.relu, skip)
        return relu, skip


def _resize_list(xs: MultiX, size_hw, method: str):
    def rs(x):
        b, h, w, c = x.shape
        out = jax.image.resize(
            x.astype(jnp.float32), (b, size_hw[0], size_hw[1], c), method=method
        )
        return out.astype(x.dtype)

    return lmap(rs, xs)


# torch bicubic (a = −0.75, align_corners=False, no antialias) at an even
# integer downsample factor reduces to a fixed separable 4-tap filter:
# src = f·o + (f−1)/2 puts every sample at fractional offset 0.5 from the two
# central pixels, so the kernel weights are W(1.5), W(0.5), W(0.5), W(1.5).
_BICUBIC_TAPS = (-0.09375, 0.59375, 0.59375, -0.09375)


def _bicubic_down_axis(x: jax.Array, axis: int, f: int) -> jax.Array:
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 2)
    xp = jnp.pad(x, pad, mode="edge")
    out = None
    for t, wgt in enumerate(_BICUBIC_TAPS):
        start = f // 2 - 1 + t
        sl = jax.lax.slice_in_dim(xp, start, start + (n // f - 1) * f + 1, f, axis)
        out = sl * wgt if out is None else out + sl * wgt
    return out


def bicubic_downsample(x: jax.Array, factor: int) -> jax.Array:
    """Exact torch F.interpolate(mode='bicubic', align_corners=False) for an
    even integer 1/factor scale — the reference's pyramid_subsample
    (resnet_pyramid.py:407-410). NHWC."""
    assert factor % 2 == 0, factor
    y = x.astype(jnp.float32)
    y = _bicubic_down_axis(y, 1, factor)
    y = _bicubic_down_axis(y, 2, factor)
    return y.astype(x.dtype)


class UpsampleBlend(nn.Module):
    """upsample→add-skip→BN-ReLU-conv3×3 (reference: util.py:120-142).
    BN/ReLU precede the conv (_BNReluConv order)."""

    num_features: int
    dtype: Dtype = jnp.float32
    mulbn: bool = False
    n_datasets: int = 1

    @nn.compact
    def __call__(self, xs: MultiX, skips: MultiX, *, train: bool):
        size = None
        for s in skips:
            if s is not None:
                size = s.shape[1:3]
                break
        xs = _resize_list(xs, size, "linear")
        xs = lmap2(lambda a, b: a + b, xs, skips)
        xs = SharedListBN(self.num_features, 1, dtype=self.dtype,
                          per_dataset=self.mulbn, n_datasets=self.n_datasets,
                          name="bn")(xs, slot=0, train=train)
        xs = lmap(nn.relu, xs)
        conv = conv_kxk(self.num_features, 3, 1, "conv", self.dtype)
        return lmap(conv, xs)


class SwiftNetPyramid(nn.Module):
    """ResNet18 pyramid encoder-decoder, output stride 4, 128-d features
    (reference: resnet_pyramid.py:267-432 `ResNet` + `resnet18`)."""

    layers: Sequence[int] = (2, 2, 2, 2)
    num_features: int = 128
    pyramid_levels: int = 3
    # stage widths; non-default values are for tiny smoke/dryrun models only
    # (the reference resnet18 trunk is fixed at 64/128/256/512)
    planes: Sequence[int] = (64, 128, 256, 512)
    dtype: Dtype = jnp.float32
    remat: bool = False
    mulbn: bool = False
    n_datasets: int = 1

    @nn.compact
    def __call__(self, xs: MultiX, *, train: bool):
        from mds_tpu.models.layers import _STEM_IMPL, _ConvKernelHolder

        lvls = self.pyramid_levels
        # the image pyramid is built below; every level is RGB and the
        # base dims are even ⇒ the fused-stem guard only needs the base
        fuse7 = (
            not train and _STEM_IMPL == "pallas"
            and self.dtype == jnp.bfloat16 and not self.mulbn
            and self.planes[0] == 64
            and all(
                x is None
                or (x.shape[-1] == 3 and x.shape[1] % 2 ** lvls == 0
                    and x.shape[2] % 2 ** lvls == 0
                    # the DEEPEST pyramid level (W / 2^(lvls-1)) must still
                    # give the kernel ≥ 256 output lanes — Mosaic rejects
                    # its stage dots below that (probed r5: W=384 fails)
                    and x.shape[2] // (2 ** (lvls - 1)) >= 512)
                for x in xs
            )
        )
        if fuse7:
            # deploy path: the per-level 7×7/s2 RGB stem via the Pallas
            # patch-matmul kernel with bn1's slot affine folded in (see
            # models/resnet.py — XLA lane-starves this conv)
            k7 = _ConvKernelHolder((7, 7, 3, 64), name="conv1")()
        else:
            conv1 = nn.Conv(self.planes[0], (7, 7), strides=2,
                            padding=[(3, 3)] * 2,
                            use_bias=False, dtype=self.dtype,
                            param_dtype=jnp.float32, kernel_init=conv_init(),
                            name="conv1")
        bn1 = SharedListBN(self.planes[0], lvls, dtype=self.dtype,
                           per_dataset=self.mulbn, n_datasets=self.n_datasets,
                           name="bn1")
        planes = list(self.planes)
        blocks = []
        block_cls = BasicBlock
        if self.remat:
            # gradient checkpointing per residual block — the reference's
            # `efficient` torch.utils.checkpoint option
            # (resnet_pyramid.py:140 do_efficient_fwd)
            # xs is a pytree of arrays (arg 1); level/train must be static
            block_cls = nn.remat(BasicBlock, static_argnums=(2, 3))
        for li, (p, n) in enumerate(zip(planes, self.layers)):
            stage = []
            for bi in range(n):
                stride = 2 if (bi == 0 and li > 0) else 1
                need_ds = stride != 1 or (li > 0 and bi == 0)
                stage.append(
                    block_cls(
                        p, stride, need_ds, lvls, self.dtype, self.remat,
                        self.mulbn, self.n_datasets,
                        name=f"layer{li + 1}_{bi}",
                    )
                )
            blocks.append(stage)
        bottlenecks = [
            nn.Conv(self.num_features, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, kernel_init=conv_init(),
                    name=f"bneck{j}")
            for j in range(4)
        ]
        # skip slots: pyramid_levels + 3 (output_stride 4 ⇒ none removed)
        n_slots = lvls + 3
        slot_sums: List[Optional[list]] = [None] * n_slots

        # image pyramid (bicubic, reference pyramid_subsample)
        pyramid = [xs]
        base = None
        for x in xs:
            if x is not None:
                base = x.shape[1:3]
                break
        for l in range(1, lvls):
            pyramid.append(lmap(lambda x: bicubic_downsample(x, 2**l), xs))

        for idx, p in enumerate(pyramid):
            if fuse7:
                from mds_tpu.ops.pallas.stem import stem7_conv_bn_relu_s2

                s7, b7 = bn1(p, slot=idx, train=False, fold=True)
                interp = jax.default_backend() != "tpu"
                x = [
                    None if q is None else stem7_conv_bn_relu_s2(
                        q.astype(jnp.bfloat16), k7, s7, b7, interpret=interp
                    )
                    for q in p
                ]
            else:
                x = bn1(lmap(conv1, p), slot=idx, train=train)
                x = lmap(nn.relu, x)
            x = lmap(max_pool_3x3_s2, x)
            feats = []
            for stage in blocks:
                skip = None
                for blk in stage:
                    x, skip = blk(x, idx, train)
                feats.append(skip)
            # bottleneck projections, deepest first (bneck0 ↔ layer4)
            skip_feats = [
                lmap(bneck, f) for bneck, f in zip(bottlenecks, reversed(feats))
            ]
            for i, s in enumerate(reversed(skip_feats)):
                slot = idx + i
                if slot_sums[slot] is None:
                    slot_sums[slot] = s
                else:
                    slot_sums[slot] = lmap2(lambda a, b: a + b, slot_sums[slot], s)

        slot_sums = slot_sums[::-1]  # deepest (1/128) first
        x = slot_sums[0]
        for i in range(2 + lvls):  # 5 blends for 3 levels, ending at 1/4
            x = UpsampleBlend(self.num_features, self.dtype, self.mulbn,
                              self.n_datasets, name=f"blend{i}")(
                x, slot_sums[i + 1], train=train
            )
        return x
