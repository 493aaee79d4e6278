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

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
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


def _is_wd_kernel(path, v) -> bool:
    # weight decay on conv/linear kernels only (torch: param.dim() in
    # (2,4)). NOT a plain ndim>=2 test: per-dataset BN affine params are
    # STACKED to (n_bn, C) in our trees (models/layers.py DatasetNorm)
    # while each torch BN weight is dim-1 (no-wd group) — match on the
    # leaf name so stacking can't change a param's group.
    name = getattr(path[-1], "key", "") if path else ""
    return v.ndim >= 2 and name in ("kernel", "embedding")


class SGDGroupsState(NamedTuple):
    count: jnp.ndarray  # schedule step
    trace: Any  # momentum buffers (params-shaped pytree)


def sgd_param_groups(
    schedule: Callable,
    momentum: float = 0.9,
    weight_decay: float = 5e-4,
    lr_mul: float = 10.0,
    nesterov: bool = False,
) -> optax.GradientTransformation:
    """SGD with wd-masking and head-lr multiplier (4 torch param groups).

    Written as ONE custom transformation (not an optax.chain) so it can
    reproduce torch.optim.SGD exactly, including the grad-None skip:
    torch never touches a param whose .grad is None — e.g. the main
    SegmentHead's structurally-dead conv1 block (built but unused when
    aux=False, lib/models/bisenetv2.py:513-530; DDP find_unused_parameters
    leaves its grad None). Per-leaf, a gradient that is identically zero
    means "unused this step": momentum buffer kept as-is, no weight decay,
    zero update. Verified against torch in tests/test_train_step_parity.py.
    """

    def init(params):
        return SGDGroupsState(
            count=jnp.zeros([], jnp.int32),
            trace=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update(grads, state, params=None):
        assert params is not None, "sgd_param_groups needs params (for wd)"
        lr = schedule(state.count)

        def leaf(path, g, p, v):
            is_wd = _is_wd_kernel(path, p)
            group_lr = lr * (lr_mul if _path_has_head(path) else 1.0)
            used = jnp.any(g != 0)
            d = g + weight_decay * p if is_wd else g
            v_new = jnp.where(used, momentum * v + d, v)
            step_dir = d + momentum * v_new if nesterov else v_new
            upd = jnp.where(used, -group_lr * step_dir, jnp.zeros_like(p))
            return v_new, upd

        out = jax.tree_util.tree_map_with_path(leaf, grads, params, state.trace)
        trace = jax.tree_util.tree_map(lambda t: t[0], out,
                                       is_leaf=lambda x: isinstance(x, tuple))
        updates = jax.tree_util.tree_map(lambda t: t[1], out,
                                         is_leaf=lambda x: isinstance(x, tuple))
        return updates, SGDGroupsState(count=state.count + 1, trace=trace)

    return optax.GradientTransformation(init, update)


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
