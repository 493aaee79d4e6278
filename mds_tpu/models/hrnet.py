"""HRNet-W48 family in Flax — multi-dataset, NHWC.

Reference: lib/models/HRNet_backbone.py (HighResolutionModule :117-290,
HighResolutionNet :297-580, BasicBlock/Bottleneck :39-116, stage dicts
configs/hrnet_config.py:HRNET_48) and lib/models/HRNetv2.py (HRNet_W48 :298,
HRNet_W48_GNN :558 — concat-to-720 → ProjectionHeadOri (convmlp: conv3x3-BN-
ReLU ×2-width → 1×1, lib/module/projection.py:60-95) → prototype classifier
with per-dataset bipartite graphs, same pattern as SemsegModel).

Per-dataset BN flows through mds_tpu.models.layers (list-based activations);
branch fusion upsampling uses align_corners=True bilinear like the reference
(HRNet_backbone.py:277-283).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mds_tpu.models.layers import resize_bilinear_ac
from mds_tpu.models.layers import ConvBN, ConvBNReLU, MultiX, lmap, lmap2
from mds_tpu.models.semseg import proto_logits, remap_logits
from mds_tpu.registry import MODELS

Dtype = Any

# HRNET_48 stage dicts (configs/hrnet_config.py)
HRNET48_STAGES = {
    "stage2": dict(num_modules=1, num_branches=2, num_blocks=(4, 4),
                   num_channels=(48, 96)),
    "stage3": dict(num_modules=4, num_branches=3, num_blocks=(4, 4, 4),
                   num_channels=(48, 96, 192)),
    "stage4": dict(num_modules=3, num_branches=4, num_blocks=(4, 4, 4, 4),
                   num_channels=(48, 96, 192, 384)),
}

HRNET18_STAGES = {
    "stage2": dict(num_modules=1, num_branches=2, num_blocks=(4, 4),
                   num_channels=(18, 36)),
    "stage3": dict(num_modules=4, num_branches=3, num_blocks=(4, 4, 4),
                   num_channels=(18, 36, 72)),
    "stage4": dict(num_modules=3, num_branches=4, num_blocks=(4, 4, 4, 4),
                   num_channels=(18, 36, 72, 144)),
}


class BasicBlock(nn.Module):
    """conv3-BN-ReLU → conv3-BN + residual (HRNet_backbone.py:39-72)."""

    planes: int
    stride: int = 1
    use_downsample: bool = False
    n_bn: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: MultiX, *, train: bool):
        cfg = dict(n_bn=self.n_bn, dtype=self.dtype)
        out = ConvBNReLU(self.planes, 3, stride=self.stride, name="conv1", **cfg)(
            xs, train=train
        )
        out = ConvBN(self.planes, 3, name="conv2", **cfg)(out, train=train)
        res = xs
        if self.use_downsample:
            res = ConvBN(self.planes, 1, stride=self.stride, name="downsample", **cfg)(
                xs, train=train
            )
        return lmap2(lambda a, b: nn.relu(a + b), out, res)


class Bottleneck(nn.Module):
    """1×1 → 3×3 → 1×1(×4) + residual (HRNet_backbone.py:74-116)."""

    planes: int
    stride: int = 1
    use_downsample: bool = False
    n_bn: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: MultiX, *, train: bool):
        cfg = dict(n_bn=self.n_bn, dtype=self.dtype)
        out = ConvBNReLU(self.planes, 1, name="conv1", **cfg)(xs, train=train)
        out = ConvBNReLU(self.planes, 3, stride=self.stride, name="conv2", **cfg)(
            out, train=train
        )
        out = ConvBN(self.planes * 4, 1, name="conv3", **cfg)(out, train=train)
        res = xs
        if self.use_downsample:
            res = ConvBN(self.planes * 4, 1, stride=self.stride, name="downsample", **cfg)(
                xs, train=train
            )
        return lmap2(lambda a, b: nn.relu(a + b), out, res)


def _resize_ac_list(xs: MultiX, size_hw) -> List:
    return lmap(lambda x: resize_bilinear_ac(x, size_hw).astype(x.dtype), xs)


class HighResolutionModule(nn.Module):
    """Parallel branches + full fusion (HRNet_backbone.py:117-290)."""

    num_branches: int
    num_blocks: Sequence[int]
    num_channels: Sequence[int]
    multi_scale_output: bool = True
    n_bn: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs_list: List[MultiX], *, train: bool):
        cfg = dict(n_bn=self.n_bn, dtype=self.dtype)
        nb = self.num_branches
        # branches
        for i in range(nb):
            for b in range(self.num_blocks[i]):
                need_ds = (
                    b == 0
                    and xs_list[i][_first(xs_list[i])].shape[-1] != self.num_channels[i]
                )
                xs_list[i] = BasicBlock(
                    self.num_channels[i], 1, need_ds, name=f"branch{i}_block{b}", **cfg
                )(xs_list[i], train=train)
        if nb == 1:
            return xs_list
        # fusion
        n_out = nb if self.multi_scale_output else 1
        fused = []
        for i in range(n_out):
            tgt = xs_list[i][_first(xs_list[i])].shape[1:3]
            y = xs_list[i]
            for j in range(nb):
                if j == i:
                    continue
                if j > i:
                    f = ConvBN(self.num_channels[i], 1, name=f"fuse{i}_{j}", **cfg)(
                        xs_list[j], train=train
                    )
                    f = _resize_ac_list(f, tgt)
                else:
                    f = xs_list[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        cls = ConvBN if last else ConvBNReLU
                        ch = self.num_channels[i] if last else self.num_channels[j]
                        f = cls(ch, 3, stride=2, name=f"fuse{i}_{j}_{k}", **cfg)(
                            f, train=train
                        )
                y = lmap2(lambda a, b: a + b, y, f)
            fused.append(lmap(nn.relu, y))
        return fused


def _first(xs: MultiX) -> int:
    for i, x in enumerate(xs):
        if x is not None:
            return i
    raise ValueError("all-None multi list")


class HRNetBackbone(nn.Module):
    """HRNetV2 trunk → list of 4 branch outputs (HRNet_backbone.py:297-580).
    Stem stride 2+2 (full_res_stem=False default)."""

    stages: Any = None  # dict like HRNET48_STAGES
    n_bn: int = 1
    full_res_stem: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: MultiX, *, train: bool):
        stages = self.stages or HRNET48_STAGES
        cfg = dict(n_bn=self.n_bn, dtype=self.dtype)
        stem_stride = 1 if self.full_res_stem else 2
        xs = ConvBNReLU(64, 3, stride=stem_stride, name="conv1", **cfg)(xs, train=train)
        if not self.full_res_stem:
            xs = ConvBNReLU(64, 3, stride=2, name="conv2", **cfg)(xs, train=train)
        # layer1: 4 bottlenecks 64→256
        for b in range(4):
            xs = Bottleneck(64, 1, b == 0, name=f"layer1_{b}", **cfg)(xs, train=train)

        branches: List[MultiX] = [xs]
        prev_channels = [256]
        for si, key in enumerate(["stage2", "stage3", "stage4"]):
            sc = stages[key]
            chans = list(sc["num_channels"])
            # transition: adapt/extend branch list
            new_branches: List[MultiX] = []
            for i in range(sc["num_branches"]):
                if i < len(branches):
                    if prev_channels[i] != chans[i]:
                        nb = ConvBNReLU(
                            chans[i], 3, name=f"transition{si + 1}_{i}", **cfg
                        )(branches[i], train=train)
                    else:
                        nb = branches[i]
                else:
                    nb = ConvBNReLU(
                        chans[i], 3, stride=2, name=f"transition{si + 1}_{i}", **cfg
                    )(branches[-1], train=train)
                new_branches.append(nb)
            branches = new_branches
            for m in range(sc["num_modules"]):
                branches = HighResolutionModule(
                    sc["num_branches"], sc["num_blocks"], chans,
                    multi_scale_output=True, name=f"{key}_module{m}", **cfg,
                )(branches, train=train)
            prev_channels = chans
        return branches  # 4 per-dataset lists at 1/4, 1/8, 1/16, 1/32


class ProjectionHead(nn.Module):
    """convmlp projection (lib/module/projection.py:60-95): conv3×3 →
    BN-ReLU (2×width) → 1×1 conv."""

    proj_dim: int
    n_bn: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: MultiX, *, train: bool):
        c_in = xs[_first(xs)].shape[-1]
        xs = ConvBNReLU(c_in * 2, 3, n_bn=self.n_bn, dtype=self.dtype, name="conv1")(
            xs, train=train
        )
        conv = nn.Conv(self.proj_dim, (1, 1), use_bias=True, dtype=self.dtype,
                       param_dtype=jnp.float32, name="conv_out")
        return lmap(conv, xs)


class HRNetW48(nn.Module):
    """HRNet-W48 with unified-prototype classifier + bipartite remap
    (HRNetv2.py HRNet_W48 :298 / HRNet_W48_GNN :558 / HRNet_W48_CLIP :423 —
    all share this shape; plain W48 is the n_datasets=1, unify_ratio=1 case).
    """

    datasets_cats: Sequence[int]
    output_feat_dim: int = 720
    unify_ratio: float = 1.0
    with_datasets_aux: bool = False
    n_bn: int = 1
    width: int = 48
    stages: Any = None  # explicit stage dict overrides `width`
    dtype: Dtype = jnp.float32

    @property
    def total_cats(self) -> int:
        return int(sum(self.datasets_cats))

    @property
    def max_num_unify_class(self) -> int:
        return int(self.unify_ratio * self.total_cats)

    @classmethod
    def from_configer(cls, configer, dtype=jnp.float32, **kw):
        n = configer.n_datasets
        return cls(
            datasets_cats=tuple(configer.n_cats(i) for i in range(n)),
            output_feat_dim=int(configer.get("GNN", "output_feat_dim", default=720)),
            unify_ratio=float(configer.get("GNN", "unify_ratio", default=1.0)),
            with_datasets_aux=bool(
                configer.get("loss", "with_datasets_aux", default=False)
            ),
            n_bn=int(configer.get("n_bn", default=n)),
            width=int(configer.get("hrnet", "width", default=48)),
            dtype=dtype,
            **kw,
        )

    def setup(self):
        stages = self.stages or (
            HRNET48_STAGES if self.width == 48 else HRNET18_STAGES
        )
        self.backbone = HRNetBackbone(stages=stages, n_bn=self.n_bn, dtype=self.dtype)
        self.proj_head = ProjectionHead(self.output_feat_dim, self.n_bn, self.dtype)
        M, D = self.max_num_unify_class, self.output_feat_dim
        self.unify_prototype = self.param(
            "unify_prototype", nn.initializers.truncated_normal(0.02),
            (M, D), jnp.float32,
        )
        if self.with_datasets_aux:
            self.aux_prototype = [
                self.param(f"aux_prototype_{i}",
                           nn.initializers.truncated_normal(0.02), (c, D), jnp.float32)
                for i, c in enumerate(self.datasets_cats)
            ]
        self.bi_graphs = [
            self.variable("buffers", f"bi_graph_{i}",
                          lambda c=c: jnp.zeros((c, M), jnp.float32))
            for i, c in enumerate(self.datasets_cats)
        ]

    def features(self, xs: MultiX, *, train: bool):
        xs = lmap(lambda x: x.astype(self.dtype), xs)
        branches = self.backbone(xs, train=train)
        tgt = branches[0][_first(branches[0])].shape[1:3]
        ups = [branches[0]] + [_resize_ac_list(b, tgt) for b in branches[1:]]
        cat = ups[0]
        for b in ups[1:]:
            cat = lmap2(lambda a, c: jnp.concatenate([a, c], axis=-1), cat, b)
        return self.proj_head(cat, train=train)

    def __call__(self, xs: MultiX, *, train: bool = True):
        feats = self.features(xs, train=train)
        out = {
            "seg": lmap(lambda f: proto_logits(f, self.unify_prototype), feats),
            "feat": feats,
        }
        if self.with_datasets_aux:
            out["aux"] = [
                None if f is None else proto_logits(f, self.aux_prototype[i])
                for i, f in enumerate(feats)
            ]
        return out

    def eval_logits(self, x, dataset: int = 0):
        n = len(self.datasets_cats)
        feats = self.features([x if i == dataset else None for i in range(n)],
                              train=False)
        logits = proto_logits(feats[dataset], self.unify_prototype)
        return remap_logits(logits, self.bi_graphs[dataset].value)

    def pred(self, x, dataset: int = 0):
        logits = self.eval_logits(x, dataset)
        b, h, w, c = logits.shape
        logits = resize_bilinear_ac(logits, (h * 4, w * 4))
        return jnp.argmax(logits, axis=-1)


@MODELS.register("hrnet_w48")
@MODELS.register("hrnet_w48_gnn")
def hrnet_w48(configer=None, **kw):
    return HRNetW48.from_configer(configer, **kw)


@MODELS.register("hrnet_w48_clip")
@MODELS.register("hrnet_w48_contrast")
def hrnet_w48_variants(configer=None, **kw):
    """CLIP-prototype / contrast variants share the W48 + projection +
    prototype-classifier shape (HRNetv2.py:44, :423) — the difference is
    where the prototypes come from (CLIP text vs learned), which is a
    trainer concern (set_unify_prototype)."""
    return HRNetW48.from_configer(configer, **kw)
