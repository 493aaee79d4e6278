"""Optimizers with the reference's param-group policy, in optax.

Reference: tools/train_amp.py:138-166 `set_optimizer` — SGD(momentum=0.9,
weight_decay) over 4 groups produced by `model.get_params`
(lib/models/bisenetv2.py:766-782):
  * wd params: kernels (ndim ≥ 2) outside heads;
  * no-wd params: 1-d params (BN affine, biases);
  * head kernels: 10× lr (+wd);
  * head 1-d params: 10× lr, no wd.

The GNN stage uses AdamW (configs/ltbgnn_7_datasets_snp.json: optim AdamW,
lr 1e-3, wd 1e-5; tools/train_ltbgnn_all_datasets_snp.py set_graph_optimizer).

torch-SGD parity: v ← m·v + (g + wd·p); p ← p − lr·v. In optax that is
add_decayed_weights(wd, mask) → trace(momentum) → per-group lr scaling →
scale_by_learning_rate(schedule).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import optax


def _path_has_head(path) -> bool:
    """True for params under a per-dataset head (lr ×10 group).

    BiSeNetV2 names its heads head/aux2..aux5_4 with list suffixes
    (`head_0`, `aux2_1`, …); SemsegModel/HRNet heads are matched by the same
    prefixes plus proj/classifier conventions.
    """
    for k in path:
        name = getattr(k, "key", None)
        if name is None:
            continue
        if name.startswith(("head", "aux2", "aux3", "aux4", "aux5_4", "classifier", "proj_head")):
            return True
    return False


def _mask(params: Any, pred: Callable) -> Any:
    return jax.tree_util.tree_map_with_path(lambda p, v: pred(p, v), params)


def sgd_param_groups(
    schedule: Callable,
    momentum: float = 0.9,
    weight_decay: float = 5e-4,
    lr_mul: float = 10.0,
    nesterov: bool = False,
) -> optax.GradientTransformation:
    """SGD with wd-masking and head-lr multiplier (4 torch param groups)."""

    def wd_mask(params):
        # weight decay on ndim>=2 kernels only (torch: param.dim() in (2,4))
        return _mask(params, lambda p, v: v.ndim >= 2)

    def head_mask(params):
        return _mask(params, lambda p, v: _path_has_head(p))

    def not_head_mask(params):
        return _mask(params, lambda p, v: not _path_has_head(p))

    return optax.chain(
        optax.add_decayed_weights(weight_decay, mask=wd_mask),
        optax.trace(decay=momentum, nesterov=nesterov),
        # 10× lr for head params, 1× elsewhere
        optax.masked(optax.scale(lr_mul), head_mask),
        optax.scale_by_learning_rate(schedule),  # includes the −1
    )


def adamw(
    schedule: Callable,
    weight_decay: float = 1e-5,
    b1: float = 0.9,
    b2: float = 0.999,
) -> optax.GradientTransformation:
    """AdamW for the GNN stage (reference AdamW lr 1e-3 wd 1e-5)."""
    return optax.adamw(schedule, b1=b1, b2=b2, weight_decay=weight_decay)


def build_optimizer(configer, schedule) -> optax.GradientTransformation:
    """Config-driven builder (reference lr/optim keys)."""
    name = (configer.get("lr", "optim", default="sgd") or "sgd").lower()
    wd = float(configer.get("lr", "weight_decay", default=5e-4))
    if name == "sgd":
        return sgd_param_groups(
            schedule,
            momentum=float(configer.get("lr", "momentum", default=0.9)),
            weight_decay=wd,
            lr_mul=float(configer.get("lr", "lr_mul", default=10.0)),
        )
    if name == "adamw":
        return adamw(schedule, weight_decay=wd)
    raise ValueError(f"unknown optimizer {name}")
