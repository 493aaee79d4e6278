"""SemsegModel ("snp_rn18") — unified-prototype classifier over SwiftNet.

Reference: lib/models/semseg.py:262-494. The GNN-era flagship seg model:
  * SwiftNet-pyramid backbone → 128-d features at 1/4 (semseg.py:271-276);
  * `logits` head = _BNReluConv(128 → output_feat_dim, k=1, bias=True)
    (:286, util.py:40-55);
  * classification = einsum('bchw,nc->bnhw', feat, unify_prototype) against a
    learnable prototype matrix of max_num_unify_class = unify_ratio ×
    Σ n_cats rows (:284-296, :325);
  * per-dataset aux prototypes (:298-303, :330-334);
  * per-dataset bipartite graphs (n_cats_i × M) remap unified logits to each
    dataset's label space at eval (:288-293, einsum :344);
  * `set_bipartite_graphs` / `set_unify_prototype` injection API (:452-478) —
    here functional helpers that rewrite the variables dict.

Entry points replace aux_mode ∈ {train, eval, pred, clip, uni_eval, unseen}
(:320-382). NHWC; prototype einsums run on the MXU as (B·H·W, C) × (C, N)
matmuls in the compute dtype.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mds_tpu.models.layers import MultiX, lmap
from mds_tpu.models.swiftnet import SharedListBN, SwiftNetPyramid
from mds_tpu.registry import MODELS

Dtype = Any


def proto_logits(feat: jax.Array, prototypes: jax.Array) -> jax.Array:
    """einsum('bhwc,nc->bhwn') — the reference's bchw,nc->bnhw in NHWC
    (semseg.py:325). Computed in the feature dtype (bf16 on TPU ⇒ MXU)."""
    return jnp.einsum(
        "bhwc,nc->bhwn", feat, prototypes.astype(feat.dtype),
        preferred_element_type=jnp.float32,
    )


def remap_logits(logits: jax.Array, bi_graph: jax.Array) -> jax.Array:
    """einsum('bhwn,cn->bhwc'): unified logits → dataset label space
    (semseg.py:344; bi_graph is (n_cats_i, M))."""
    return jnp.einsum(
        "bhwn,cn->bhwc", logits, bi_graph.astype(logits.dtype),
        preferred_element_type=jnp.float32,
    )


class SemsegModel(nn.Module):
    """snp_rn18 (reference: lib/models/semseg.py:262; factory
    lib/models/__init__.py). Construct via `from_configer` or directly."""

    datasets_cats: Sequence[int]
    output_feat_dim: int = 512
    unify_ratio: float = 1.0
    with_datasets_aux: bool = False
    dtype: Dtype = jnp.float32
    remat: bool = False
    mulbn: bool = False
    # backbone-size knobs (defaults = the reference resnet18 trunk); the
    # non-default values exist for tiny smoke/dryrun models only — see
    # __graft_entry__._dryrun_flagship
    backbone_layers: Sequence[int] = (2, 2, 2, 2)
    backbone_planes: Sequence[int] = (64, 128, 256, 512)
    backbone_features: int = 128
    pyramid_levels: int = 3

    @property
    def total_cats(self) -> int:
        return int(sum(self.datasets_cats))

    @property
    def max_num_unify_class(self) -> int:
        return int(self.unify_ratio * self.total_cats)

    @classmethod
    def from_configer(cls, configer, dtype=jnp.float32, **kw):
        n = configer.n_datasets
        bk = {}
        # gradient checkpointing per residual block — the reference builds
        # SwiftNet with efficient=True unconditionally (semseg.py:59,:276 →
        # resnet_pyramid.py do_efficient_fwd); without it the 7-dataset
        # recipe's saved backbone activations (global batch 28 at 768²)
        # exceed v5e HBM. network.efficient=false opts out.
        bk["remat"] = bool(configer.get("network", "efficient", default=True))
        for key, field in (("layers", "backbone_layers"),
                           ("planes", "backbone_planes"),
                           ("num_features", "backbone_features"),
                           ("pyramid_levels", "pyramid_levels")):
            v = configer.get("backbone", key, default=None)
            if v is not None:
                bk[field] = tuple(v) if isinstance(v, (list, tuple)) else int(v)
        bk.update(kw)
        return cls(
            datasets_cats=tuple(configer.n_cats(i) for i in range(n)),
            output_feat_dim=int(configer.get("GNN", "output_feat_dim", default=512)),
            unify_ratio=float(configer.get("GNN", "unify_ratio", default=1.0)),
            with_datasets_aux=bool(
                configer.get("loss", "with_datasets_aux", default=False)
            ),
            dtype=dtype,
            **bk,
        )

    def setup(self):
        self.backbone = SwiftNetPyramid(
            layers=self.backbone_layers, planes=self.backbone_planes,
            num_features=self.backbone_features,
            pyramid_levels=self.pyramid_levels,
            dtype=self.dtype, remat=self.remat, mulbn=self.mulbn,
            n_datasets=len(self.datasets_cats),
        )
        self.head_bn = SharedListBN(
            self.backbone_features, 1, dtype=self.dtype, per_dataset=self.mulbn,
            n_datasets=len(self.datasets_cats), name="logits_bn",
        )
        self.head_conv = nn.Conv(
            self.output_feat_dim, (1, 1), use_bias=True, dtype=self.dtype,
            param_dtype=jnp.float32, name="logits_conv",
        )
        M, D = self.max_num_unify_class, self.output_feat_dim
        self.unify_prototype = self.param(
            "unify_prototype",
            nn.initializers.truncated_normal(0.02),
            (M, D), jnp.float32,
        )
        if self.with_datasets_aux:
            self.aux_prototype = [
                self.param(
                    f"aux_prototype_{i}",
                    nn.initializers.truncated_normal(0.02),
                    (c, D), jnp.float32,
                )
                for i, c in enumerate(self.datasets_cats)
            ]
        # non-trainable buffers (requires_grad=False ParameterList in the ref)
        self.bi_graphs = [
            self.variable(
                "buffers", f"bi_graph_{i}",
                lambda c=c: jnp.zeros((c, M), jnp.float32),
            )
            for i, c in enumerate(self.datasets_cats)
        ]

    def features(self, xs: MultiX, *, train: bool) -> List[Optional[jax.Array]]:
        """backbone + _BNReluConv head → per-dataset feature maps at 1/4."""
        xs = lmap(lambda x: x.astype(self.dtype), xs)
        feats = self.backbone(xs, train=train)
        feats = self.head_bn(feats, slot=0, train=train)
        feats = lmap(nn.relu, feats)
        return lmap(self.head_conv, feats)

    def __call__(self, xs: MultiX, *, train: bool = True):
        """aux_mode='train' (semseg.py:324-335): dict with
        seg   = per-dataset unified logits (b,h/4,w/4,M)
        aux   = per-dataset aux-prototype logits (only with_datasets_aux)
        feat  = per-dataset features (for the GNN/contrast losses)."""
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

    def eval_logits(self, x: jax.Array, dataset: int = 0):
        """aux_mode='eval' (semseg.py:336-345): unified logits remapped to the
        dataset's label space via its bipartite graph, at 1/4 resolution (the
        reference compares against a downsampled label; evaluate.py:150-157)."""
        feats = self.features([x if i == dataset else None
                               for i in range(len(self.datasets_cats))], train=False)
        logits = proto_logits(feats[dataset], self.unify_prototype)
        return remap_logits(logits, self.bi_graphs[dataset].value)

    def uni_eval_logits(self, x: jax.Array, dataset: int = 0):
        """aux_mode='uni_eval' (semseg.py:361-363): raw unified-class logits."""
        feats = self.features([x if i == dataset else None
                               for i in range(len(self.datasets_cats))], train=False)
        return proto_logits(feats[dataset], self.unify_prototype)

    def pred(self, x: jax.Array, dataset: int = 0):
        """aux_mode='pred' (semseg.py:346-354): remap → ×4 bilinear
        (align_corners=True) → argmax."""
        from mds_tpu.models.layers import resize_bilinear_ac

        logits = self.eval_logits(x, dataset)
        b, h, w, c = logits.shape
        logits = resize_bilinear_ac(logits, (h * 4, w * 4))
        return jnp.argmax(logits, axis=-1)

    def clip_logits(self, x: jax.Array, dataset: int = 0):
        """aux_mode='clip' (semseg.py:355-361): logits against the dataset's
        OWN prototype rows (the CLIP-text anchors occupy rows
        [Σc_<i, Σc_<i + c_i) when seeded with identity graphs)."""
        feats = self.features([x if i == dataset else None
                               for i in range(len(self.datasets_cats))],
                              train=False)
        cur = sum(self.datasets_cats[:dataset])
        rows = self.unify_prototype[cur : cur + self.datasets_cats[dataset]]
        return proto_logits(feats[dataset], rows)

    def unseen_pred_logits(self, x: jax.Array, dataset: int = 0):
        """aux_mode='unseen' (semseg.py:365-372): hard-argmax the unified
        logits to a one-hot, then remap the one-hot through the dataset's
        bipartite graph — the unseen-class transfer protocol."""
        logits = self.uni_eval_logits(x, dataset)
        one_hot = jax.nn.one_hot(
            jnp.argmax(logits, axis=-1), logits.shape[-1],
            dtype=logits.dtype,
        )
        return remap_logits(one_hot, self.bi_graphs[dataset].value)

    def features_tg(self, xs: MultiX, *, train: bool = False):
        """aux_mode='train_tg' (semseg.py:373-374): backbone features only —
        the target-graph trainers consume {'seg': features}."""
        return {"seg": self.features(xs, train=train)}


def set_bipartite_graphs(variables: dict, bi_graphs: Sequence) -> dict:
    """Functional set_bipartite_graphs (semseg.py:452-466). Accepts n or 2n
    graphs (the GNN emits [max, softmax] pairs; even indices are the max/
    discrete ones)."""
    n = len([k for k in variables["buffers"] if k.startswith("bi_graph_")])
    if len(bi_graphs) == 2 * n:
        bi_graphs = [bi_graphs[2 * i] for i in range(n)]
    new_buffers = dict(variables["buffers"])
    for i in range(n):
        old = new_buffers[f"bi_graph_{i}"]
        new_buffers[f"bi_graph_{i}"] = jnp.asarray(bi_graphs[i], old.dtype).reshape(
            old.shape
        )
    out = dict(variables)
    out["buffers"] = new_buffers
    return out


def set_unify_prototype(variables: dict, proto: jax.Array,
                        datasets_cats: Optional[Sequence[int]] = None,
                        with_datasets_aux: bool = False) -> dict:
    """Functional set_unify_prototype (semseg.py:468-478). With aux enabled
    the first Σcats rows feed the per-dataset aux prototypes and the rest the
    unified prototype, mirroring the reference's split."""
    params = dict(variables["params"])
    proto = jnp.asarray(proto, jnp.float32)
    if with_datasets_aux:
        assert datasets_cats is not None
        total = int(sum(datasets_cats))
        params["unify_prototype"] = proto[total:]
        cur = 0
        for i, c in enumerate(datasets_cats):
            params[f"aux_prototype_{i}"] = proto[cur : cur + c]
            cur += c
    else:
        params["unify_prototype"] = proto
    out = dict(variables)
    out["params"] = params
    return out


@MODELS.register("snp_rn18")
def snp_rn18(configer=None, dtype=jnp.float32, **kw):
    return SemsegModel.from_configer(configer, dtype=dtype, **kw)


@MODELS.register("snp_rn18_mulbn")
def snp_rn18_mulbn(configer=None, dtype=jnp.float32, **kw):
    """Per-dataset-BN SwiftNet variant (reference: resnet_pyramid.py:433
    ResNet_mulbn + lib/models/semseg.py:46 SemsegModel_mulbn)."""
    return SemsegModel.from_configer(configer, dtype=dtype, mulbn=True, **kw)
