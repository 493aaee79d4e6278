"""Jitted training steps.

TPU-native equivalent of the reference hot loop (tools/train_amp.py:218-291):
one jitted function does normalize → forward → per-dataset OHEM main+aux loss
→ grad → SGD update → BN-stat update. Under a data mesh the batch arrays are
sharded on their leading axis and params are replicated, so XLA inserts the
gradient all-reduce exactly where DDP's NCCL all-reduce sat. bf16 compute
needs no GradScaler (reference: amp.GradScaler tools/train_amp.py:204) — TPU
bf16 has fp32 range.

Loss composition parity (tools/train_amp.py:253-263):
  loss = Σ_datasets [ OhemCE(main_i, lb_i) + Σ_aux OhemCE(aux_i, lb_i) ].
"""

from __future__ import annotations

import functools
from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from mds_tpu.engine.train_state import TrainState
from mds_tpu.losses.ohem_ce import OhemCELoss


def normalize_images(
    ims: Sequence[Optional[jax.Array]],
    means: Sequence[jax.Array],
    stds: Sequence[jax.Array],
    dtype=jnp.float32,
) -> List[Optional[jax.Array]]:
    """uint8 NHWC → ÷255 → (x−mean)/std per dataset, on device.

    Replaces the host-side ToTensor normalize (lib/transform_cv2.py:283-301)
    and the CVCUDA convertto+normalize pair (lib/cvCudaPreprocess.py:313-350);
    XLA fuses this into the first conv.
    """
    out = []
    for x, m, s in zip(ims, means, stds):
        if x is None:
            out.append(None)
            continue
        xf = x.astype(jnp.float32) / 255.0
        xf = (xf - m.reshape(1, 1, 1, 3)) / s.reshape(1, 1, 1, 3)
        out.append(xf.astype(dtype))
    return out


def make_seg_loss_fn(
    model,
    means: Sequence,
    stds: Sequence,
    ohem_thresh: float = 0.7,
    compute_dtype=jnp.bfloat16,
    fused_up_loss: bool = False,
) -> Callable:
    """The multi-dataset seg loss used by make_seg_train_step, exposed so
    the torch train-step parity test (tests/test_train_step_parity.py)
    differentiates EXACTLY the production loss path.

    loss_fn(params, batch_stats, ims, lbs, rng) -> (loss, (new_stats, metrics))
    """
    criteria = OhemCELoss(ohem_thresh)
    means = [jnp.asarray(m, jnp.float32) for m in means]
    stds = [jnp.asarray(s, jnp.float32) for s in stds]

    def loss_fn(params, batch_stats, ims, lbs, rng):
        xs = normalize_images(ims, means, stds, dtype=compute_dtype)
        kwargs = {"up": False} if fused_up_loss else {}
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            xs,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
            **kwargs,
        )
        if fused_up_loss:
            main_f, aux_fs = out["up_factors"]
        total = 0.0
        metrics = {}
        for i, (logits, lb) in enumerate(zip(out["logits"], lbs)):
            if logits is None:
                continue
            lb = lb.astype(jnp.int32)
            if fused_up_loss:
                l_main = criteria.upsampled(logits, lb, main_f)
                l_aux = 0.0
                for af, aux_set in zip(aux_fs, out.get("aux", [])):
                    if aux_set[i] is not None:
                        l_aux = l_aux + criteria.upsampled(aux_set[i], lb, af)
            else:
                l_main = criteria(logits, lb)
                l_aux = 0.0
                for aux_set in out.get("aux", []):
                    if aux_set[i] is not None:
                        l_aux = l_aux + criteria(aux_set[i], lb)
            total = total + l_main + l_aux
            metrics[f"loss_pre_{i}"] = l_main
        metrics["loss"] = total
        return total, (mut["batch_stats"], metrics)

    return loss_fn


def make_seg_train_step(
    model,
    tx: optax.GradientTransformation,
    means: Sequence,
    stds: Sequence,
    ohem_thresh: float = 0.7,
    compute_dtype=jnp.bfloat16,
    donate: bool = True,
    mesh=None,
    local_bn: bool = False,
    fused_up_loss: bool = False,
) -> Callable:
    """Build the jitted multi-dataset train step for head-based models
    (BiSeNetV1/V2). Returns step_fn(state, ims, lbs, rng) -> (state, metrics).

    local_bn=True (requires mesh): the reference's DEFAULT BN semantics —
    per-GPU batch moments, no cross-replica sync (use_sync_bn=False,
    configs/bisenetv2_city.py; DDP does not sync BN unless
    convert_sync_batchnorm is called). Implemented by shard_mapping the
    grad computation over the data axis so each shard normalizes with its
    OWN moments; gradients are pmean'd (= DDP all-reduce) and the running
    stats are pmean'd across shards for the replicated state. Default
    (False) keeps global-batch moments (SyncBN — usually better on TPU).

    RNG note (measured negative result, v5e + CPU bisect 2026-08-17):
    converting the step key to the hardware-backed 'rbg' PRNG to speed up
    the SegmentHead dropout draws (~4.7 ms/step of threefry in the
    profile) DOUBLES trace+compile time of the full train step (CPU
    bisect: trace 110s→200s, compile 16s→26s) — rbg keys stay out; the
    dropout cost is attacked at the source instead with uint8 draws
    (models/layers.py FastDropout).

    fused_up_loss=True calls the model with up=False and evaluates the OHEM
    CE through the phase-decomposed upsample (OhemCELoss.upsampled): the
    five full-res (B,H,W,19) head volumes — the largest tensors in the
    graph — never materialize. Requires a model whose __call__ takes `up`
    and reports 'up_factors' (BiSeNetV2 family). Loss is value-identical
    (the resize is decomposed exactly; tests/test_losses.py).
    """
    loss_fn = make_seg_loss_fn(
        model, means, stds, ohem_thresh=ohem_thresh,
        compute_dtype=compute_dtype, fused_up_loss=fused_up_loss,
    )

    grad_fn = jax.grad(loss_fn, has_aux=True)
    if local_bn:
        assert mesh is not None, "local_bn needs the data mesh"
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        def local_grad(params, batch_stats, ims, lbs, rng):
            grads, (new_stats, metrics) = grad_fn(
                params, batch_stats, ims, lbs, rng
            )
            # DDP grad all-reduce; running stats averaged across shards for
            # the replicated state (normalization already used LOCAL moments)
            grads = jax.lax.pmean(grads, "data")
            new_stats = jax.lax.pmean(new_stats, "data")
            metrics = jax.lax.pmean(metrics, "data")
            return grads, new_stats, metrics

        compute_grads = shard_map(
            local_grad, mesh=mesh,
            in_specs=(P(), P(), P("data"), P("data"), P()),
            out_specs=P(),
            check_vma=False,  # jax 0.9 name (0.8's check_rep)
        )
    else:
        compute_grads = grad_fn

    def step_fn(state: TrainState, ims, lbs, rng):
        rng = jax.random.fold_in(rng, state.step)
        if local_bn:
            grads, new_stats, metrics = compute_grads(
                state.params, state.batch_stats, ims, lbs, rng
            )
        else:
            grads, (new_stats, metrics) = compute_grads(
                state.params, state.batch_stats, ims, lbs, rng
            )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(
                params=params,
                batch_stats=new_stats,
                opt_state=opt_state,
                step=state.step + 1,
            ),
            metrics,
        )

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def init_train_state(model, tx, sample_ims, rng=None, with_buffers: bool = False):
    """Initialize params/stats/optimizer for a per-dataset sample batch.

    with_buffers=True also returns the flax 'buffers' collection (the
    non-trainable bipartite graphs of prototype models — requires_grad=False
    ParameterLists in the reference, lib/models/semseg.py:288-293) as a
    second value; callers must thread it through apply/eval themselves.
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    variables = model.init(
        {"params": k1, "dropout": k2},
        [None if x is None else jnp.asarray(x, jnp.float32) for x in sample_ims],
        train=True,
    )
    params = variables["params"]
    state = TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        step=jnp.asarray(0, jnp.int32),
    )
    if with_buffers:
        return state, variables.get("buffers", {})
    return state
