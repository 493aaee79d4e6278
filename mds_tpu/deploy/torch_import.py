"""Import torch checkpoints from the reference's BiSeNetV2 layout.

Reference: lib/models/bisenetv2.py — module names like `detail.S1_1.conv.
weight`, per-dataset BN buffers `*.bn.{i}.running_mean/var`, shared affine
`*.affine_weight/bias`, CEBlock per-dataset affine BNs `segment.S5_5.bn.{i}.
weight/bias`, per-dataset heads `head.{i}.*` / `aux2.{i}.*` … The CoinCheung
release weights go through the reference's own `load_pretrain` remap first
(bisenetv2.py:665-764), which produces exactly this layout, so supporting it
covers both.

Accepts any mapping of name → array-like (torch tensors, numpy arrays) — no
torch import required at runtime. `bisenetv2_to_torch` is the exact inverse
(used for round-trip tests and exporting back to torch-land).

Conventions translated:
  * conv weights OIHW → HWIO;
  * linear/1×1-conv biases copied as-is;
  * per-dataset BN stats stacked into our (n_bn, C) arrays;
  * plain nn.Conv2d (BGA's left1_conv/right2_conv, head conv_out=conv2).
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def _conv_w(x) -> np.ndarray:
    return _np(x).transpose(2, 3, 1, 0)  # OIHW → HWIO


_CONVBN_BLOCKS = {
    # our flax path → torch module path (ConvBNReLU/ConvBN with DatasetNorm)
    "detail/S1_1": "detail.S1_1", "detail/S1_2": "detail.S1_2",
    "detail/S2_1": "detail.S2_1", "detail/S2_2": "detail.S2_2",
    "detail/S2_3": "detail.S2_3", "detail/S3_1": "detail.S3_1",
    "detail/S3_2": "detail.S3_2", "detail/S3_3": "detail.S3_3",
    "segment/S1S2/conv": "segment.S1S2.conv",
    "segment/S1S2/left_1": "segment.S1S2.left_1",
    "segment/S1S2/left_2": "segment.S1S2.left_2",
    "segment/S1S2/fuse": "segment.S1S2.fuse",
    "segment/S5_5/conv_gap": "segment.S5_5.conv_gap",
    "segment/S5_5/conv_last": "segment.S5_5.conv_last",
    "bga/left1_convbn": "bga.left1_convbn",
    "bga/left2_convbn": "bga.left2_convbn",
    "bga/right1": "bga.right1",
    "bga/right2_convbn": "bga.right2_convbn",
    "bga/conv": "bga.conv",
}
for _s, _pre in (("S3", 2), ("S4", 2), ("S5_4", 4)):
    for _i in range(1, _pre + 1):
        _tag = f"{_s}_{_i}"
        _ge2 = _i == 1
        parts = ["conv1", "conv2"] + (
            ["dwconv1", "dwconv2", "shortcut_1", "shortcut_2"] if _ge2 else ["dwconv"]
        )
        for _p in parts:
            _CONVBN_BLOCKS[f"segment/{_tag}/{_p}"] = f"segment.{_tag}.{_p}"

_PLAIN_CONVS = {
    "bga/left1_conv": "bga.left1_conv",
    "bga/right2_conv": "bga.right2_conv",
}


def _head_blocks(n_heads: int, aux: bool):
    """Per-dataset SegmentHead paths (ours → torch)."""
    out = {}
    names = ["head"] + (["aux2", "aux3", "aux4", "aux5_4"] if aux else [])
    for hname in names:
        for i in range(n_heads):
            ours = f"{hname}_{i}"
            theirs = f"{hname}.{i}"
            out[f"{ours}/conv", "convbn1"] = f"{theirs}.conv"
            if hname != "head":
                out[f"{ours}/conv1", "convbn1"] = f"{theirs}.conv1"
            out[f"{ours}/conv_out", "conv_b"] = f"{theirs}.conv2"
    return out


def _set(tree: Dict, path: str, value: np.ndarray) -> None:
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def _load_v2_trunk(state: Mapping, n_bn: int, params: Dict, stats: Dict):
    """The BiSeNetV2 trunk (detail/segment/bga + CEBlock BN) shared by the
    multi-dataset model and the contrast family."""

    def load_convbn(ours: str, theirs: str, shared_affine: bool = True):
        _set(params, f"{ours}/conv/kernel", _conv_w(state[f"{theirs}.conv.weight"]))
        if shared_affine:
            _set(params, f"{ours}/bn/scale", _np(state[f"{theirs}.affine_weight"]))
            _set(params, f"{ours}/bn/bias", _np(state[f"{theirs}.affine_bias"]))
        means, vars_ = [], []
        for i in range(n_bn):
            mk = f"{theirs}.bn.{i}.running_mean"
            if mk not in state:  # single-BN head blocks
                mk, vk = f"{theirs}.bn.running_mean", f"{theirs}.bn.running_var"
                means.append(_np(state[mk]))
                vars_.append(_np(state[vk]))
                break
            means.append(_np(state[mk]))
            vars_.append(_np(state[f"{theirs}.bn.{i}.running_var"]))
        _set(stats, f"{ours}/bn/mean", np.stack(means))
        _set(stats, f"{ours}/bn/var", np.stack(vars_))

    for ours, theirs in _CONVBN_BLOCKS.items():
        load_convbn(ours, theirs)
    for ours, theirs in _PLAIN_CONVS.items():
        _set(params, f"{ours}/kernel", _conv_w(state[f"{theirs}.weight"]))

    # CEBlock per-dataset-affine BN (bisenetv2.py:229-268)
    means, vars_, scales, biases = [], [], [], []
    for i in range(n_bn):
        means.append(_np(state[f"segment.S5_5.bn.{i}.running_mean"]))
        vars_.append(_np(state[f"segment.S5_5.bn.{i}.running_var"]))
        scales.append(_np(state[f"segment.S5_5.bn.{i}.weight"]))
        biases.append(_np(state[f"segment.S5_5.bn.{i}.bias"]))
    _set(stats, "segment/S5_5/bn/mean", np.stack(means))
    _set(stats, "segment/S5_5/bn/var", np.stack(vars_))
    _set(params, "segment/S5_5/bn/scale", np.stack(scales))
    _set(params, "segment/S5_5/bn/bias", np.stack(biases))


def bisenetv2_from_torch(
    state: Mapping[str, "np.ndarray"], n_bn: int = 1, aux: bool = True,
) -> Tuple[Dict, Dict]:
    """torch state_dict (reference layout) → (params, batch_stats) trees."""
    params: Dict = {}
    stats: Dict = {}
    _load_v2_trunk(state, n_bn, params, stats)

    # heads (per dataset): count them from the state dict
    n_heads = 0
    while f"head.{n_heads}.conv2.weight" in state:
        n_heads += 1
    head_names = ["head"] + (
        ["aux2", "aux3", "aux4", "aux5_4"]
        if aux and "aux2.0.conv2.weight" in state else []
    )
    for hname in head_names:
        for i in range(n_heads):
            ours, theirs = f"{hname}_{i}", f"{hname}.{i}"
            # head BN is single (n_bn=1); stack shape (1, C)
            _set(params, f"{ours}/conv/conv/kernel",
                 _conv_w(state[f"{theirs}.conv.conv.weight"]))
            _set(params, f"{ours}/conv/bn/scale",
                 _np(state[f"{theirs}.conv.affine_weight"]))
            _set(params, f"{ours}/conv/bn/bias",
                 _np(state[f"{theirs}.conv.affine_bias"]))
            _set(stats, f"{ours}/conv/bn/mean",
                 _np(state[f"{theirs}.conv.bn.0.running_mean"])[None])
            _set(stats, f"{ours}/conv/bn/var",
                 _np(state[f"{theirs}.conv.bn.0.running_var"])[None])
            if f"{theirs}.conv1.conv.weight" in state:
                _set(params, f"{ours}/conv1/conv/kernel",
                     _conv_w(state[f"{theirs}.conv1.conv.weight"]))
                _set(params, f"{ours}/conv1/bn/scale",
                     _np(state[f"{theirs}.conv1.affine_weight"]))
                _set(params, f"{ours}/conv1/bn/bias",
                     _np(state[f"{theirs}.conv1.affine_bias"]))
                _set(stats, f"{ours}/conv1/bn/mean",
                     _np(state[f"{theirs}.conv1.bn.0.running_mean"])[None])
                _set(stats, f"{ours}/conv1/bn/var",
                     _np(state[f"{theirs}.conv1.bn.0.running_var"])[None])
            _set(params, f"{ours}/conv_out/kernel",
                 _conv_w(state[f"{theirs}.conv2.weight"]))
            _set(params, f"{ours}/conv_out/bias",
                 _np(state[f"{theirs}.conv2.bias"]))
    return params, stats


def bisenetv2_contrast_from_torch(
    state: Mapping[str, "np.ndarray"], n_bn: int = 1, aux: bool = True,
) -> Tuple[Dict, Dict, Dict]:
    """Reference contrast-family checkpoint (lib/models/bisenetv2_contrast.py
    BiSeNetV2_Contrast / _WN / _BN, the `--finetune_from` source of
    tools/train_amp_contrast_single.py) → (params, batch_stats, extras) for
    BiSeNetV2Contrast.

    Layout: the BiSeNetV2 trunk plus ONE unified SegmentHead
    (`head.conv/conv1/proj`, bisenetv2_contrast.py:339-394 — `proj` is the
    bias-free ConvNorm 1×1), aux heads `aux2..aux5_4` (same shape), the
    convmlp projection head `projHead.conv1/conv_last`
    (lib/module/projection.py:8-48), and the `prototypes` (U, P, D) buffer
    (returned in extras for the trainer's sinkhorn prototype state).

    Structural deltas (documented, lossless for finetuning):
      * ConvNorm's kernel lands in our conv_out with a zero bias (the
        cosine normalisation is a forward-time op, not a parameter);
      * the torch aux=False head constructs a dead `conv1` block
        (bisenetv2_contrast.py:365) — skipped, our head has no such params.
    """
    params: Dict = {}
    stats: Dict = {}
    extras: Dict = {}
    _load_v2_trunk(state, n_bn, params, stats)

    def load_head(ours: str, theirs: str, with_conv1: bool):
        blocks = [("conv", "conv")] + ([("conv1", "conv1")] if with_conv1 else [])
        for o, t in blocks:
            _set(params, f"{ours}/{o}/conv/kernel",
                 _conv_w(state[f"{theirs}.{t}.conv.weight"]))
            _set(params, f"{ours}/{o}/bn/scale",
                 _np(state[f"{theirs}.{t}.affine_weight"]))
            _set(params, f"{ours}/{o}/bn/bias",
                 _np(state[f"{theirs}.{t}.affine_bias"]))
            _set(stats, f"{ours}/{o}/bn/mean", np.stack([
                _np(state[f"{theirs}.{t}.bn.{i}.running_mean"])
                for i in range(n_bn)
            ]))
            _set(stats, f"{ours}/{o}/bn/var", np.stack([
                _np(state[f"{theirs}.{t}.bn.{i}.running_var"])
                for i in range(n_bn)
            ]))
        # ConvNorm (cosine, no bias) or convmlp proj (plain 1×1 + bias)
        if f"{theirs}.proj.conv.weight" in state:
            w = _conv_w(state[f"{theirs}.proj.conv.weight"])
        else:
            w = _conv_w(state[f"{theirs}.proj.weight"])
        _set(params, f"{ours}/conv_out/kernel", w)
        bias_key = f"{theirs}.proj.bias"
        if bias_key in state:
            _set(params, f"{ours}/conv_out/bias", _np(state[bias_key]))

    load_head("head", "head", with_conv1=False)
    if aux and "aux2.conv.conv.weight" in state:
        for h in ("aux2", "aux3", "aux4", "aux5_4"):
            load_head(h, h, with_conv1=True)

    # projection head (convmlp): conv1 = ConvBNReLU, conv_last = 1×1 + bias
    _set(params, "proj_head/conv1/conv/kernel",
         _conv_w(state["projHead.conv1.conv.weight"]))
    _set(params, "proj_head/conv1/bn/scale",
         _np(state["projHead.conv1.affine_weight"]))
    _set(params, "proj_head/conv1/bn/bias",
         _np(state["projHead.conv1.affine_bias"]))
    _set(stats, "proj_head/conv1/bn/mean", np.stack([
        _np(state[f"projHead.conv1.bn.{i}.running_mean"]) for i in range(n_bn)
    ]))
    _set(stats, "proj_head/conv1/bn/var", np.stack([
        _np(state[f"projHead.conv1.bn.{i}.running_var"]) for i in range(n_bn)
    ]))
    _set(params, "proj_head/conv_out/kernel",
         _conv_w(state["projHead.conv_last.weight"]))
    _set(params, "proj_head/conv_out/bias",
         _np(state["projHead.conv_last.bias"]))

    # per-dataset aux heads (dataset_aux_head.{i}, aux=False layout)
    i = 0
    while f"dataset_aux_head.{i}.conv.conv.weight" in state:
        load_head(f"dataset_aux_head_{i}", f"dataset_aux_head.{i}",
                  with_conv1=False)
        i += 1

    if "prototypes" in state:
        extras["prototypes"] = _np(state["prototypes"])
    return params, stats, extras


def _stack_bn(state: Mapping, prefix: str, n: int):
    """ModuleList of BatchNorm2d → our (n, C) stacked arrays.
    Returns (scale, bias, mean, var)."""
    return (
        np.stack([_np(state[f"{prefix}.{i}.weight"]) for i in range(n)]),
        np.stack([_np(state[f"{prefix}.{i}.bias"]) for i in range(n)]),
        np.stack([_np(state[f"{prefix}.{i}.running_mean"]) for i in range(n)]),
        np.stack([_np(state[f"{prefix}.{i}.running_var"]) for i in range(n)]),
    )


def swiftnet_backbone_from_torch(
    state: Mapping, prefix: str = "backbone."
) -> Tuple[Dict, Dict]:
    """Reference SwiftNet-pyramid ResNet (lib/models/resnet_pyramid.py:267-423)
    state_dict → (params, batch_stats) subtrees for SwiftNetPyramid.

    torch layout: conv1, bn1.{lvl} ModuleList, layer{1..4}.{bi} BasicBlocks
    (conv1/bn1.{lvl}/conv2/bn2.{lvl}/downsample.{0,1}), upsample_bottlenecks.{j}
    (j=0 ↔ layer4), upsample_blends.{i}.blend_conv.{norm,conv}."""
    p: Dict = {}
    s: Dict = {}
    lvls = 0
    while f"{prefix}bn1.{lvls}.weight" in state:
        lvls += 1
    assert lvls > 0, "not a SwiftNet-pyramid state dict"

    _set(p, "conv1/kernel", _conv_w(state[f"{prefix}conv1.weight"]))
    sc, bi, mn, vr = _stack_bn(state, f"{prefix}bn1", lvls)
    _set(p, "bn1/scale", sc); _set(p, "bn1/bias", bi)
    _set(s, "bn1/mean", mn); _set(s, "bn1/var", vr)

    for li in range(1, 5):
        bi_ = 0
        while f"{prefix}layer{li}.{bi_}.conv1.weight" in state:
            t = f"{prefix}layer{li}.{bi_}"
            o = f"layer{li}_{bi_}"
            _set(p, f"{o}/conv1/kernel", _conv_w(state[f"{t}.conv1.weight"]))
            _set(p, f"{o}/conv2/kernel", _conv_w(state[f"{t}.conv2.weight"]))
            for bn in ("bn1", "bn2"):
                sc, b, mn, vr = _stack_bn(state, f"{t}.{bn}", lvls)
                _set(p, f"{o}/{bn}/scale", sc); _set(p, f"{o}/{bn}/bias", b)
                _set(s, f"{o}/{bn}/mean", mn); _set(s, f"{o}/{bn}/var", vr)
            if f"{t}.downsample.0.weight" in state:
                _set(p, f"{o}/downsample_conv/kernel",
                     _conv_w(state[f"{t}.downsample.0.weight"]))
                _set(p, f"{o}/downsample_bn/scale",
                     _np(state[f"{t}.downsample.1.weight"])[None])
                _set(p, f"{o}/downsample_bn/bias",
                     _np(state[f"{t}.downsample.1.bias"])[None])
                _set(s, f"{o}/downsample_bn/mean",
                     _np(state[f"{t}.downsample.1.running_mean"])[None])
                _set(s, f"{o}/downsample_bn/var",
                     _np(state[f"{t}.downsample.1.running_var"])[None])
            bi_ += 1

    for j in range(4):
        _set(p, f"bneck{j}/kernel",
             _conv_w(state[f"{prefix}upsample_bottlenecks.{j}.weight"]))
    i = 0
    while f"{prefix}upsample_blends.{i}.blend_conv.conv.weight" in state:
        t = f"{prefix}upsample_blends.{i}.blend_conv"
        _set(p, f"blend{i}/conv/kernel", _conv_w(state[f"{t}.conv.weight"]))
        _set(p, f"blend{i}/bn/scale", _np(state[f"{t}.norm.weight"])[None])
        _set(p, f"blend{i}/bn/bias", _np(state[f"{t}.norm.bias"])[None])
        _set(s, f"blend{i}/bn/mean", _np(state[f"{t}.norm.running_mean"])[None])
        _set(s, f"blend{i}/bn/var", _np(state[f"{t}.norm.running_var"])[None])
        i += 1
    return p, s


def semseg_from_torch(state: Mapping) -> Tuple[Dict, Dict, Dict]:
    """Reference SemsegModel / snp_rn18 (lib/models/semseg.py:262-494)
    state_dict → (params, batch_stats, buffers) for mds_tpu SemsegModel."""
    bp, bs = swiftnet_backbone_from_torch(state, "backbone.")
    params: Dict = {"backbone": bp}
    stats: Dict = {"backbone": bs}
    buffers: Dict = {}

    _set(params, "logits_bn/scale", _np(state["logits.norm.weight"])[None])
    _set(params, "logits_bn/bias", _np(state["logits.norm.bias"])[None])
    _set(stats, "logits_bn/mean", _np(state["logits.norm.running_mean"])[None])
    _set(stats, "logits_bn/var", _np(state["logits.norm.running_var"])[None])
    _set(params, "logits_conv/kernel", _conv_w(state["logits.conv.weight"]))
    if "logits.conv.bias" in state:
        _set(params, "logits_conv/bias", _np(state["logits.conv.bias"]))

    params["unify_prototype"] = _np(state["unify_prototype"])
    i = 0
    while f"bipartite_graphs.{i}" in state:
        buffers[f"bi_graph_{i}"] = _np(state[f"bipartite_graphs.{i}"])
        i += 1
    i = 0
    while f"aux_prototype.{i}" in state:
        params[f"aux_prototype_{i}"] = _np(state[f"aux_prototype.{i}"])
        i += 1
    return params, stats, buffers


def resnet18_torchvision_to_swiftnet(
    state: Mapping, pyramid_levels: int = 3
) -> Tuple[Dict, Dict]:
    """torchvision-layout ResNet18 state_dict → SwiftNetPyramid trunk
    (params, batch_stats) subtrees (decoder/bottlenecks stay random-init —
    the reference's random_init list, resnet_pyramid.py:349).

    torchvision BNs are single; we broadcast affine+stats into every pyramid
    level slot (the reference's own strict=False load leaves its per-level
    BNs at init — ours is strictly closer to the ImageNet parent)."""
    p: Dict = {}
    s: Dict = {}

    def bn_bcast(ours: str, theirs: str, n: int):
        _set(p, f"{ours}/scale", np.tile(_np(state[f"{theirs}.weight"]), (n, 1)))
        _set(p, f"{ours}/bias", np.tile(_np(state[f"{theirs}.bias"]), (n, 1)))
        _set(s, f"{ours}/mean", np.tile(_np(state[f"{theirs}.running_mean"]), (n, 1)))
        _set(s, f"{ours}/var", np.tile(_np(state[f"{theirs}.running_var"]), (n, 1)))

    _set(p, "conv1/kernel", _conv_w(state["conv1.weight"]))
    bn_bcast("bn1", "bn1", pyramid_levels)
    for li in range(1, 5):
        bi = 0
        while f"layer{li}.{bi}.conv1.weight" in state:
            t, o = f"layer{li}.{bi}", f"layer{li}_{bi}"
            _set(p, f"{o}/conv1/kernel", _conv_w(state[f"{t}.conv1.weight"]))
            _set(p, f"{o}/conv2/kernel", _conv_w(state[f"{t}.conv2.weight"]))
            bn_bcast(f"{o}/bn1", f"{t}.bn1", pyramid_levels)
            bn_bcast(f"{o}/bn2", f"{t}.bn2", pyramid_levels)
            if f"{t}.downsample.0.weight" in state:
                _set(p, f"{o}/downsample_conv/kernel",
                     _conv_w(state[f"{t}.downsample.0.weight"]))
                bn_bcast(f"{o}/downsample_bn", f"{t}.downsample.1", 1)
            bi += 1
    return p, s


def hrnet_backbone_from_torch(
    state: Mapping, n_bn: int = 1
) -> Tuple[Dict, Dict]:
    """HRNet ImageNet-classification state_dict (the reference's
    hrnetv2_w48_imagenet_pretrained.pth layout; lib/models/HRNet_backbone.py)
    → (params, batch_stats) for mds_tpu HRNetBackbone.

    torch keys: conv1/bn1, conv2/bn2, layer1.{b} Bottlenecks,
    transition{t}.{i}(.0).{0=conv,1=bn}, stage{s}.{m}.branches.{i}.{b},
    stage{s}.{m}.fuse_layers.{i}.{j}(.{k}).{0,1}. Classifier heads
    (incre/downsamp/final_layer/classifier) are dropped. Single torch BNs
    broadcast into all n_bn per-dataset stat slots (shared affine)."""
    p: Dict = {}
    s: Dict = {}

    def cbr(ours: str, conv_key: str, bn_key: str):
        _set(p, f"{ours}/conv/kernel", _conv_w(state[conv_key]))
        _set(p, f"{ours}/bn/scale", _np(state[f"{bn_key}.weight"]))
        _set(p, f"{ours}/bn/bias", _np(state[f"{bn_key}.bias"]))
        _set(s, f"{ours}/bn/mean",
             np.tile(_np(state[f"{bn_key}.running_mean"]), (n_bn, 1)))
        _set(s, f"{ours}/bn/var",
             np.tile(_np(state[f"{bn_key}.running_var"]), (n_bn, 1)))

    cbr("conv1", "conv1.weight", "bn1")
    if "conv2.weight" in state:
        cbr("conv2", "conv2.weight", "bn2")

    b = 0
    while f"layer1.{b}.conv1.weight" in state:
        t, o = f"layer1.{b}", f"layer1_{b}"
        for c in ("conv1", "conv2", "conv3"):
            cbr(f"{o}/{c}", f"{t}.{c}.weight", f"{t}.bn{c[-1]}")
        if f"{t}.downsample.0.weight" in state:
            cbr(f"{o}/downsample", f"{t}.downsample.0.weight",
                f"{t}.downsample.1")
        b += 1

    import re

    for t in (1, 2, 3):
        idxs = sorted({
            int(m.group(1))
            for k in state
            if (m := re.match(rf"transition{t}\.(\d+)\.", k))
        })
        for i in idxs:  # identity transitions leave no keys — skip them
            if f"transition{t}.{i}.0.weight" in state:  # channel adapt
                cbr(f"transition{t}_{i}", f"transition{t}.{i}.0.weight",
                    f"transition{t}.{i}.1")
            elif f"transition{t}.{i}.0.0.weight" in state:  # new branch
                cbr(f"transition{t}_{i}", f"transition{t}.{i}.0.0.weight",
                    f"transition{t}.{i}.0.1")

    for st in (2, 3, 4):
        m = 0
        while f"stage{st}.{m}.branches.0.0.conv1.weight" in state:
            mod = f"stage{st}.{m}"
            omod = f"stage{st}_module{m}"
            i = 0
            while f"{mod}.branches.{i}.0.conv1.weight" in state:
                b = 0
                while f"{mod}.branches.{i}.{b}.conv1.weight" in state:
                    t = f"{mod}.branches.{i}.{b}"
                    o = f"{omod}/branch{i}_block{b}"
                    cbr(f"{o}/conv1", f"{t}.conv1.weight", f"{t}.bn1")
                    cbr(f"{o}/conv2", f"{t}.conv2.weight", f"{t}.bn2")
                    if f"{t}.downsample.0.weight" in state:
                        cbr(f"{o}/downsample", f"{t}.downsample.0.weight",
                            f"{t}.downsample.1")
                    b += 1
                i += 1
            n_br = i
            for i in range(n_br):
                for j in range(n_br):
                    if j == i:
                        continue
                    t = f"{mod}.fuse_layers.{i}.{j}"
                    if j > i:
                        if f"{t}.0.weight" in state:
                            cbr(f"{omod}/fuse{i}_{j}", f"{t}.0.weight", f"{t}.1")
                    else:
                        k = 0
                        while f"{t}.{k}.0.weight" in state:
                            cbr(f"{omod}/fuse{i}_{j}_{k}",
                                f"{t}.{k}.0.weight", f"{t}.{k}.1")
                            k += 1
            m += 1
    return p, s


def resnet18_torchvision_to_resnet(state: Mapping) -> Tuple[Dict, Dict]:
    """torchvision ResNet18 state_dict → mds_tpu.models.resnet.Resnet18
    (the BiSeNetV1 trunk; reference lib/models/resnet.py:9 hub-loads the
    same checkpoint). Returns (params, batch_stats) subtrees; fc.* dropped.
    """
    p: Dict = {}
    s: Dict = {}

    def bn(ours: str, theirs: str):
        _set(p, f"{ours}/scale", _np(state[f"{theirs}.weight"]))
        _set(p, f"{ours}/bias", _np(state[f"{theirs}.bias"]))
        _set(s, f"{ours}/mean", _np(state[f"{theirs}.running_mean"]))
        _set(s, f"{ours}/var", _np(state[f"{theirs}.running_var"]))

    _set(p, "conv1/kernel", _conv_w(state["conv1.weight"]))
    bn("bn1", "bn1")
    for li in range(1, 5):
        b = 0
        while f"layer{li}.{b}.conv1.weight" in state:
            t, o = f"layer{li}.{b}", f"layer{li}_{b}"
            _set(p, f"{o}/conv1/kernel", _conv_w(state[f"{t}.conv1.weight"]))
            _set(p, f"{o}/conv2/kernel", _conv_w(state[f"{t}.conv2.weight"]))
            bn(f"{o}/bn1", f"{t}.bn1")
            bn(f"{o}/bn2", f"{t}.bn2")
            if f"{t}.downsample.0.weight" in state:
                _set(p, f"{o}/downsample_conv/kernel",
                     _conv_w(state[f"{t}.downsample.0.weight"]))
                bn(f"{o}/downsample_bn", f"{t}.downsample.1")
            b += 1
    return p, s


def hrnet_ref_from_torch(state: Mapping, n_bn: int = 1) -> Tuple[Dict, Dict]:
    """Reference multi-dataset HRNet layout (lib/models/HRNet_backbone.py,
    ConvBNReLU blocks from lib/module/module_helper.py:63-220: `X.conv.
    weight`, per-dataset `X.bn.{i}.running_*` affine=False, shared
    `X.affine_weight/bias`) → (params, batch_stats) for HRNetBackbone."""
    p: Dict = {}
    s: Dict = {}

    def cbr(ours: str, theirs: str):
        _set(p, f"{ours}/conv/kernel", _conv_w(state[f"{theirs}.conv.weight"]))
        _set(p, f"{ours}/bn/scale", _np(state[f"{theirs}.affine_weight"]))
        _set(p, f"{ours}/bn/bias", _np(state[f"{theirs}.affine_bias"]))
        _set(s, f"{ours}/bn/mean", np.stack(
            [_np(state[f"{theirs}.bn.{i}.running_mean"]) for i in range(n_bn)]
        ))
        _set(s, f"{ours}/bn/var", np.stack(
            [_np(state[f"{theirs}.bn.{i}.running_var"]) for i in range(n_bn)]
        ))

    cbr("conv1", "conv1")
    if "conv2.conv.weight" in state:
        cbr("conv2", "conv2")
    b = 0
    while f"layer1.{b}.conv1.conv.weight" in state:
        for c in ("conv1", "conv2", "conv3"):
            cbr(f"layer1_{b}/{c}", f"layer1.{b}.{c}")
        if f"layer1.{b}.downsample.conv.weight" in state:
            cbr(f"layer1_{b}/downsample", f"layer1.{b}.downsample")
        b += 1
    import re

    for t in (1, 2, 3):
        idxs = sorted({
            int(m.group(1))
            for k in state
            if (m := re.match(rf"transition{t}\.(\d+)\.", k))
        })
        for i in idxs:  # None (identity) entries leave no keys — skip them
            if f"transition{t}.{i}.conv.weight" in state:  # channel adapt
                cbr(f"transition{t}_{i}", f"transition{t}.{i}")
            elif f"transition{t}.{i}.0.conv.weight" in state:  # new branch
                cbr(f"transition{t}_{i}", f"transition{t}.{i}.0")
    for st in (2, 3, 4):
        m = 0
        while f"stage{st}.{m}.branches.0.0.conv1.conv.weight" in state:
            mod, omod = f"stage{st}.{m}", f"stage{st}_module{m}"
            i = 0
            while f"{mod}.branches.{i}.0.conv1.conv.weight" in state:
                b = 0
                while f"{mod}.branches.{i}.{b}.conv1.conv.weight" in state:
                    t = f"{mod}.branches.{i}.{b}"
                    o = f"{omod}/branch{i}_block{b}"
                    cbr(f"{o}/conv1", f"{t}.conv1")
                    cbr(f"{o}/conv2", f"{t}.conv2")
                    if f"{t}.downsample.conv.weight" in state:
                        cbr(f"{o}/downsample", f"{t}.downsample")
                    b += 1
                i += 1
            n_br = i
            for i in range(n_br):
                for j in range(n_br):
                    if j == i:
                        continue
                    t = f"{mod}.fuse_layers.{i}.{j}"
                    if j > i and f"{t}.conv.weight" in state:
                        cbr(f"{omod}/fuse{i}_{j}", t)
                    elif j < i:
                        k = 0
                        while f"{t}.{k}.conv.weight" in state:
                            cbr(f"{omod}/fuse{i}_{j}_{k}", f"{t}.{k}")
                            k += 1
            m += 1
    return p, s


def detect_torch_layout(sd: Mapping) -> str:
    """Classify a torch state_dict for finetune_from routing:
    'semseg' (reference snp_rn18 ckpt), 'hrnet_ref' (reference multi-dataset
    HRNet), 'hrnet_imagenet' (classification ckpt), 'resnet18'
    (torchvision ImageNet), or 'bisenetv2' (reference/CoinCheung layout)."""
    if "backbone.conv1.weight" in sd and "unify_prototype" in sd:
        return "semseg"
    if "projHead.conv_last.weight" in sd:
        return "bisenetv2_contrast"
    if any(k.startswith("transition1.") for k in sd) or any(
        k.startswith("stage2.0.branches") for k in sd
    ):
        return "hrnet_ref" if "conv1.conv.weight" in sd else "hrnet_imagenet"
    if "cp.resnet.conv1.weight" in sd:
        return "bisenetv1"
    if "patch_embed.proj.weight" in sd and any(
        k.startswith("layers.0.blocks.") for k in sd
    ):
        return "swin"
    if "fc.weight" in sd or (
        "conv1.weight" in sd and "layer1.0.conv1.weight" in sd
        and "detail.S1_1.conv.weight" not in sd
    ):
        return "resnet18"
    return "bisenetv2"


def merge_subtree(variables: Dict, subtree: Dict, *path: str) -> Dict:
    """Return a copy of a variables collection with `subtree` grafted onto
    collection[path] (replacing only the keys present in subtree)."""
    import copy

    out = copy.deepcopy(variables)

    def rec(dst: Dict, src: Dict):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                rec(dst[k], v)
            else:
                dst[k] = v

    node = out
    for k in path:
        node = node[k]
    rec(node, subtree)
    return out


def bisenetv2_to_torch(params: Dict, stats: Dict) -> Dict[str, np.ndarray]:
    """Inverse mapping (for round-trip tests / exporting back to torch)."""
    out: Dict[str, np.ndarray] = {}

    def get(tree, path):
        node = tree
        for k in path.split("/"):
            node = node[k]
        return np.asarray(node)

    def dump_convbn(ours, theirs):
        out[f"{theirs}.conv.weight"] = get(params, f"{ours}/conv/kernel").transpose(3, 2, 0, 1)
        out[f"{theirs}.affine_weight"] = get(params, f"{ours}/bn/scale")
        out[f"{theirs}.affine_bias"] = get(params, f"{ours}/bn/bias")
        mean = get(stats, f"{ours}/bn/mean")
        var = get(stats, f"{ours}/bn/var")
        for i in range(mean.shape[0]):
            out[f"{theirs}.bn.{i}.running_mean"] = mean[i]
            out[f"{theirs}.bn.{i}.running_var"] = var[i]

    for ours, theirs in _CONVBN_BLOCKS.items():
        dump_convbn(ours, theirs)
    for ours, theirs in _PLAIN_CONVS.items():
        out[f"{theirs}.weight"] = get(params, f"{ours}/kernel").transpose(3, 2, 0, 1)

    mean = get(stats, "segment/S5_5/bn/mean")
    var = get(stats, "segment/S5_5/bn/var")
    scale = get(params, "segment/S5_5/bn/scale")
    bias = get(params, "segment/S5_5/bn/bias")
    for i in range(mean.shape[0]):
        out[f"segment.S5_5.bn.{i}.running_mean"] = mean[i]
        out[f"segment.S5_5.bn.{i}.running_var"] = var[i]
        out[f"segment.S5_5.bn.{i}.weight"] = scale[i]
        out[f"segment.S5_5.bn.{i}.bias"] = bias[i]

    for key in params:
        for hname in ("head", "aux2", "aux3", "aux4", "aux5_4"):
            if key.startswith(hname + "_") and key[len(hname) + 1 :].isdigit():
                i = int(key[len(hname) + 1 :])
                ours, theirs = key, f"{hname}.{i}"
                out[f"{theirs}.conv.conv.weight"] = get(
                    params, f"{ours}/conv/conv/kernel").transpose(3, 2, 0, 1)
                out[f"{theirs}.conv.affine_weight"] = get(params, f"{ours}/conv/bn/scale")
                out[f"{theirs}.conv.affine_bias"] = get(params, f"{ours}/conv/bn/bias")
                out[f"{theirs}.conv.bn.0.running_mean"] = get(stats, f"{ours}/conv/bn/mean")[0]
                out[f"{theirs}.conv.bn.0.running_var"] = get(stats, f"{ours}/conv/bn/var")[0]
                if "conv1" in params[key]:
                    out[f"{theirs}.conv1.conv.weight"] = get(
                        params, f"{ours}/conv1/conv/kernel").transpose(3, 2, 0, 1)
                    out[f"{theirs}.conv1.affine_weight"] = get(params, f"{ours}/conv1/bn/scale")
                    out[f"{theirs}.conv1.affine_bias"] = get(params, f"{ours}/conv1/bn/bias")
                    out[f"{theirs}.conv1.bn.0.running_mean"] = get(stats, f"{ours}/conv1/bn/mean")[0]
                    out[f"{theirs}.conv1.bn.0.running_var"] = get(stats, f"{ours}/conv1/bn/var")[0]
                out[f"{theirs}.conv2.weight"] = get(
                    params, f"{ours}/conv_out/kernel").transpose(3, 2, 0, 1)
                out[f"{theirs}.conv2.bias"] = get(params, f"{ours}/conv_out/bias")
    return out


def swin_from_torch(state: Mapping) -> Dict:
    """Reference SwinTransformer (lib/models/swin_transformer.py:444) state
    dict → flax params for models.swin.SwinTransformer.

    Layout notes: torch Linear weight (out,in) → flax kernel (in,out);
    patch-embed conv OIHW → HWIO; PatchMerging norm/reduction import
    verbatim because our quadrant concat order matches the reference's
    cat([x0,x1,x2,x3]); per-output norms norm1..3 → out_norm1..3 (norm0
    guards stage 0, whose output the context path never reads)."""
    p: Dict = {}

    def lin(ours, theirs, bias=True):
        _set(p, f"{ours}/kernel", _np(state[f"{theirs}.weight"]).T)
        if bias:
            _set(p, f"{ours}/bias", _np(state[f"{theirs}.bias"]))

    def ln(ours, theirs):
        _set(p, f"{ours}/scale", _np(state[f"{theirs}.weight"]))
        _set(p, f"{ours}/bias", _np(state[f"{theirs}.bias"]))

    _set(p, "patch_embed/kernel", _conv_w(state["patch_embed.proj.weight"]))
    _set(p, "patch_embed/bias", _np(state["patch_embed.proj.bias"]))
    ln("embed_norm", "patch_embed.norm")

    n_layers = 1 + max(
        int(k.split(".")[1]) for k in state if k.startswith("layers.")
    )
    for si in range(n_layers):
        n_blocks = 1 + max(
            int(k.split(".")[3])
            for k in state
            if k.startswith(f"layers.{si}.blocks.")
        )
        for bi in range(n_blocks):
            t = f"layers.{si}.blocks.{bi}"
            o = f"stage{si}_block{bi}"
            ln(f"{o}/norm1", f"{t}.norm1")
            ln(f"{o}/norm2", f"{t}.norm2")
            lin(f"{o}/attn/qkv", f"{t}.attn.qkv")
            lin(f"{o}/attn/proj", f"{t}.attn.proj")
            _set(p, f"{o}/attn/relative_position_bias_table",
                 _np(state[f"{t}.attn.relative_position_bias_table"]))
            lin(f"{o}/fc1", f"{t}.mlp.fc1")
            lin(f"{o}/fc2", f"{t}.mlp.fc2")
        if f"layers.{si}.downsample.reduction.weight" in state:
            ln(f"merge{si}/norm", f"layers.{si}.downsample.norm")
            lin(f"merge{si}/reduction", f"layers.{si}.downsample.reduction",
                bias=False)
        if f"norm{si}.weight" in state and si > 0:
            ln(f"out_norm{si}", f"norm{si}")
    return p


def bisenetv1_from_torch(state: Mapping, aux: bool = True) -> Tuple[Dict, Dict]:
    """Reference BiSeNetV1 (lib/models/bisenetv1.py:274) state dict → flax
    (params, batch_stats) for models.bisenetv1.BiSeNetV1. The trunk reuses
    resnet18_torchvision_to_resnet (the reference Resnet18 is
    torchvision-layout, lib/models/resnet.py:20-57)."""
    p: Dict = {}
    s: Dict = {}

    def cbn(ours: str, theirs: str):  # ConvBNReLU (conv + BN + relu)
        _set(p, f"{ours}/conv/kernel", _conv_w(state[f"{theirs}.conv.weight"]))
        _set(p, f"{ours}/bn/scale", _np(state[f"{theirs}.bn.weight"]))
        _set(p, f"{ours}/bn/bias", _np(state[f"{theirs}.bn.bias"]))
        _set(s, f"{ours}/bn/mean", _np(state[f"{theirs}.bn.running_mean"]))
        _set(s, f"{ours}/bn/var", _np(state[f"{theirs}.bn.running_var"]))

    def rawbn(ours: str, theirs: str):
        _set(p, f"{ours}/scale", _np(state[f"{theirs}.weight"]))
        _set(p, f"{ours}/bias", _np(state[f"{theirs}.bias"]))
        _set(s, f"{ours}/mean", _np(state[f"{theirs}.running_mean"]))
        _set(s, f"{ours}/var", _np(state[f"{theirs}.running_var"]))

    trunk = {
        k[len("cp.resnet."):]: v
        for k, v in state.items() if k.startswith("cp.resnet.")
    }
    rp, rs = resnet18_torchvision_to_resnet(trunk)
    p.setdefault("cp", {})["resnet"] = rp
    s.setdefault("cp", {})["resnet"] = rs

    for ours, theirs in [
        ("cp/conv_avg", "cp.conv_avg"),
        ("cp/conv_head32", "cp.conv_head32"),
        ("cp/conv_head16", "cp.conv_head16"),
        ("cp/arm16/conv", "cp.arm16.conv"),
        ("cp/arm32/conv", "cp.arm32.conv"),
        ("sp/conv1", "sp.conv1"), ("sp/conv2", "sp.conv2"),
        ("sp/conv3", "sp.conv3"), ("sp/conv_out", "sp.conv_out"),
        ("ffm/convblk", "ffm.convblk"),
        ("conv_out/conv", "conv_out.conv"),
    ] + ([("conv_out16/conv", "conv_out16.conv"),
          ("conv_out32/conv", "conv_out32.conv")] if aux else []):
        cbn(ours, theirs)

    for arm in ("arm16", "arm32"):
        _set(p, f"cp/{arm}/conv_atten/kernel",
             _conv_w(state[f"cp.{arm}.conv_atten.weight"]))
        rawbn(f"cp/{arm}/bn_atten", f"cp.{arm}.bn_atten")
    _set(p, "ffm/conv/kernel", _conv_w(state["ffm.conv.weight"]))
    rawbn("ffm/bn", "ffm.bn")

    heads = ["conv_out"] + (["conv_out16", "conv_out32"] if aux else [])
    for h in heads:
        _set(p, f"{h}/conv_out/kernel", _conv_w(state[f"{h}.conv_out.weight"]))
        _set(p, f"{h}/conv_out/bias", _np(state[f"{h}.conv_out.bias"]))
    return p, s
