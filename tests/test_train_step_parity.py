"""Full train-STEP numeric parity vs the reference's torch train_amp step.

The strongest dataset-free proxy for the mIoU north star (BASELINE.md):
one BiSeNetV2 batch built from the reference's own checked-in Cityscapes
fixture frame, identical weights on both sides, and we assert

  * loss value |Δ| < 1e-3 — normalize → forward (train-mode BN) → OHEM CE
    over main + 4 aux heads (tools/train_amp.py:253-263);
  * per-param-group gradient cosine > 0.999 for each of the reference's 4
    SGD groups (wd / no-wd / 10×lr head wd / 10×lr head no-wd —
    tools/train_amp.py:138-166, lib/models/bisenetv2.py:766-782);
  * post-SGD-step parameter deltas match per group (lr/momentum/wd
    accounting, optax chain vs torch.optim.SGD first step);
  * BN running-stat updates match (momentum 0.1, unbiased-var accounting —
    torch BatchNorm2d semantics, models/layers.py:126-136).

Dropout is disabled on BOTH sides (p=0 torch / stubbed FastDropout) — it is
the only stochastic element of the step and each side draws from a
different PRNG.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from test_reference_parity import (  # noqa: E402
    _stub,
    load_flat_module,
    randomize_state,
)

REF = "/root/reference"

CITY_MEAN = np.asarray([0.3257, 0.3690, 0.3223], np.float32)
CITY_STD = np.asarray([0.2112, 0.2148, 0.2115], np.float32)
LR, WD, MOM = 5e-3, 5e-4, 0.9  # configs/bisenetv2_city.py recipe


@pytest.fixture(scope="module")
def ref_ohem():
    """The reference's REAL OhemCELoss (lib/loss/ohem_ce_loss.py:13-34)."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    _stub("lib")
    sys.modules["lib"].__path__ = [f"{REF}/lib"]
    import importlib

    return importlib.import_module("lib.loss.ohem_ce_loss").OhemCELoss


@pytest.fixture(scope="module")
def frame():
    """(im_u8 2xHxWx3, lb 2xHxW) from the reference's Cityscapes fixture,
    downscaled so CPU torch+jax backwards stay fast; batch of 2 = frame +
    horizontal flip."""
    import os

    from PIL import Image

    from mds_tpu.data.labels import get_spec

    ref_im = f"{REF}/lib/test/test_leftImg8bit.png"
    ref_lb = f"{REF}/lib/test/test_labelIds.png"
    if not (os.path.exists(ref_im) and os.path.exists(ref_lb)):
        pytest.skip("reference fixtures absent")
    H, W = 128, 256
    im = np.asarray(Image.open(ref_im).resize((W, H), Image.BILINEAR))
    lb_ids = np.asarray(Image.open(ref_lb).resize((W, H), Image.NEAREST))
    lb = np.asarray(get_spec("cityscapes").lut_eval)[lb_ids]
    ims = np.stack([im, im[:, ::-1]]).astype(np.uint8)
    lbs = np.stack([lb, lb[:, ::-1]]).astype(np.uint8)
    return ims, lbs


def _torch_groups(net):
    """set_optimizer's 4 param groups (tools/train_amp.py:138-166)."""
    wd_p, nowd_p, mul_wd_p, mul_nowd_p = net.get_params()
    return [
        {"params": wd_p},
        {"params": nowd_p, "weight_decay": 0.0},
        {"params": mul_wd_p, "lr": LR * 10},
        {"params": mul_nowd_p, "weight_decay": 0.0, "lr": LR * 10},
    ]


def _group_masks(params):
    """Our optimizer's 4 group masks — the REAL ones from engine.optim."""
    from mds_tpu.engine.optim import _is_wd_kernel as kernel
    from mds_tpu.engine.optim import _mask, _path_has_head

    masks = {
        "wd": _mask(params, lambda p, v: kernel(p, v) and not _path_has_head(p)),
        "nowd": _mask(params, lambda p, v: not kernel(p, v) and not _path_has_head(p)),
        "head_wd": _mask(params, lambda p, v: kernel(p, v) and _path_has_head(p)),
        "head_nowd": _mask(params, lambda p, v: not kernel(p, v) and _path_has_head(p)),
    }
    return masks


def _masked_cosine(tree_a, tree_b, mask):
    va, vb = [], []
    for a, b, m in zip(
        jax.tree_util.tree_leaves(tree_a),
        jax.tree_util.tree_leaves(tree_b),
        jax.tree_util.tree_leaves(mask),
    ):
        if m:
            va.append(np.asarray(a, np.float64).ravel())
            vb.append(np.asarray(b, np.float64).ravel())
    va, vb = np.concatenate(va), np.concatenate(vb)
    return float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb) + 1e-30)), va, vb


@pytest.mark.slow
def test_bisenetv2_train_step_parity(frame, ref_ohem, monkeypatch):
    import mds_tpu.models.layers as layers_mod
    from mds_tpu.deploy.torch_import import bisenetv2_from_torch
    from mds_tpu.engine.train_step import make_seg_loss_fn
    from mds_tpu.engine.optim import sgd_param_groups
    from mds_tpu.models.bisenetv2 import BiSeNetV2

    import optax

    ims, lbs = frame

    # ---------------- torch side: the reference train_amp step ------------
    ref = load_flat_module("lib/models/bisenetv2.py", "ref_bisenetv2")
    torch.manual_seed(0)
    net = ref.BiSeNetV2(19, "train", 1)
    sd0 = {k: v.clone() for k, v in randomize_state(net, seed=11).items()}
    for m in net.modules():  # kill the only stochastic op
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    net.train()

    x = ims.astype(np.float32) / 255.0
    x = (x - CITY_MEAN.reshape(1, 1, 1, 3)) / CITY_STD.reshape(1, 1, 1, 3)
    tx_im = torch.from_numpy(x.transpose(0, 3, 1, 2))
    tlb = torch.from_numpy(lbs.astype(np.int64))

    crit = ref_ohem(0.7)
    optim = torch.optim.SGD(_torch_groups(net), lr=LR, momentum=MOM,
                            weight_decay=WD)
    optim.zero_grad()
    logits, *logits_aux = net(tx_im, 0)
    t_loss = crit(logits[0], tlb) + sum(crit(a[0], tlb) for a in logits_aux)
    t_loss.backward()
    grad_sd = {
        k: (p.grad.detach().clone() if p.grad is not None
            else torch.zeros_like(p))
        for k, p in net.named_parameters()
    }
    # buffers ride along so the importer can parse the dict; they are not
    # read out of the grad tree
    for k, v in sd0.items():
        grad_sd.setdefault(k, v)
    optim.step()
    sd_after = net.state_dict()  # params stepped + BN stats updated

    # ---------------- jax side: the production loss/step path -------------
    params0, stats0 = bisenetv2_from_torch(sd0, n_bn=1, aux=True)
    params0 = jax.tree_util.tree_map(jnp.asarray, params0)
    stats0 = jax.tree_util.tree_map(jnp.asarray, stats0)
    t_grads, _ = bisenetv2_from_torch(grad_sd, n_bn=1, aux=True)
    t_params_after, t_stats_after = bisenetv2_from_torch(
        {k: v.detach().clone() for k, v in sd_after.items()}, n_bn=1, aux=True
    )

    # FastDropout stub = torch p=0 (identity)
    monkeypatch.setattr(
        layers_mod, "FastDropout",
        lambda rate: (lambda x, deterministic=True: x),
    )

    model = BiSeNetV2(n_classes=(19,), n_bn=1)  # f32, aux heads on
    loss_fn = make_seg_loss_fn(
        model, [CITY_MEAN], [CITY_STD], compute_dtype=jnp.float32
    )
    (j_loss, (new_stats, _)), j_grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(params0, stats0, [jnp.asarray(ims)], [jnp.asarray(lbs)],
      jax.random.PRNGKey(0))

    # 1) loss value
    assert abs(float(j_loss) - float(t_loss)) < 1e-3, (
        float(j_loss), float(t_loss))

    # 2) per-group gradient cosine
    masks = _group_masks(params0)
    sizes = {}
    for gname, mask in masks.items():
        cos, va, vb = _masked_cosine(j_grads, t_grads, mask)
        assert cos > 0.999, (gname, cos)
        sizes[gname] = va.size
    # group partition sanity vs torch get_params
    tg = _torch_groups(net)
    for gname, gidx in (("wd", 0), ("nowd", 1), ("head_wd", 2),
                        ("head_nowd", 3)):
        want = sum(p.numel() for p in tg[gidx]["params"])
        assert sizes[gname] == want, (gname, sizes[gname], want)

    # 3) one optimizer step: parameter deltas per group
    tx = sgd_param_groups(lambda _: LR, momentum=MOM, weight_decay=WD)
    updates, _ = tx.update(j_grads, tx.init(params0), params0)
    params1 = optax.apply_updates(params0, updates)
    deltas_ours = jax.tree_util.tree_map(lambda a, b: a - b, params1, params0)
    deltas_ref = jax.tree_util.tree_map(
        lambda a, b: np.asarray(a) - np.asarray(b), t_params_after, params0)
    for gname, mask in masks.items():
        cos, va, vb = _masked_cosine(deltas_ours, deltas_ref, mask)
        assert cos > 0.999, (gname, cos)
        # magnitudes too (catches lr×10 / wd mix-ups that keep direction)
        ra, rb = np.linalg.norm(va), np.linalg.norm(vb)
        assert abs(ra - rb) <= 2e-3 * max(rb, 1e-12), (gname, ra, rb)

    # 4) BN running-stat accounting (momentum 0.1, unbiased var)
    flat_new = jax.tree_util.tree_leaves_with_path(new_stats)
    flat_ref = dict(
        (jax.tree_util.keystr(p), np.asarray(v))
        for p, v in jax.tree_util.tree_leaves_with_path(t_stats_after)
    )
    assert flat_new
    for path, v in flat_new:
        want = flat_ref[jax.tree_util.keystr(path)]
        np.testing.assert_allclose(np.asarray(v), want, atol=2e-4, rtol=2e-3,
                                   err_msg=jax.tree_util.keystr(path))


@pytest.mark.slow
def test_bisenetv2_training_dynamics_50_steps(frame, ref_ohem, monkeypatch):
    """Multi-step training-dynamics golden (VERDICT r4 next #6): 50 full
    train steps on the fixture batch, torch (reference train_amp loop:
    optim.step + WarmupPolyLrScheduler.step, tools/train_amp.py:218-291)
    vs our jitted step with sgd_param_groups(warmup_poly_lr). Catches
    LR-schedule off-by-one, momentum/wd and BN-momentum drift that
    single-step parity can't."""
    import optax

    import mds_tpu.models.layers as layers_mod
    from mds_tpu.deploy.torch_import import bisenetv2_from_torch
    from mds_tpu.engine.lr_schedule import warmup_poly_lr
    from mds_tpu.engine.optim import sgd_param_groups
    from mds_tpu.engine.train_step import init_train_state, make_seg_train_step
    from mds_tpu.models.bisenetv2 import BiSeNetV2

    N, WARM = 50, 5
    ims, lbs = frame

    # ---------------- torch side ------------------------------------------
    ref = load_flat_module("lib/models/bisenetv2.py", "ref_bisenetv2")
    sched_mod = load_flat_module("lib/lr_scheduler.py", "ref_lr_scheduler")
    torch.manual_seed(0)
    net = ref.BiSeNetV2(19, "train", 1)
    sd0 = {k: v.clone() for k, v in randomize_state(net, seed=23).items()}
    for m in net.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    net.train()
    x = ims.astype(np.float32) / 255.0
    x = (x - CITY_MEAN.reshape(1, 1, 1, 3)) / CITY_STD.reshape(1, 1, 1, 3)
    tx_im = torch.from_numpy(x.transpose(0, 3, 1, 2))
    tlb = torch.from_numpy(lbs.astype(np.int64))
    crit = ref_ohem(0.7)
    optim = torch.optim.SGD(_torch_groups(net), lr=LR, momentum=MOM,
                            weight_decay=WD)
    sched = sched_mod.WarmupPolyLrScheduler(
        optim, power=0.9, max_iter=N, warmup_iter=WARM
    )
    t_losses, t_lrs = [], []
    for _ in range(N):
        optim.zero_grad()
        logits, *logits_aux = net(tx_im, 0)
        loss = crit(logits[0], tlb) + sum(crit(a[0], tlb) for a in logits_aux)
        loss.backward()
        t_lrs.append(float(optim.param_groups[0]["lr"]))
        optim.step()
        sched.step()
        t_losses.append(float(loss))
    t_params_final, t_stats_final = bisenetv2_from_torch(
        {k: v.detach().clone() for k, v in net.state_dict().items()},
        n_bn=1, aux=True,
    )

    # ---------------- jax side --------------------------------------------
    params0, stats0 = bisenetv2_from_torch(sd0, n_bn=1, aux=True)
    monkeypatch.setattr(
        layers_mod, "FastDropout",
        lambda rate: (lambda x, deterministic=True: x),
    )
    model = BiSeNetV2(n_classes=(19,), n_bn=1)
    sched_j = warmup_poly_lr(LR, 0.9, N, warmup_iter=WARM)
    tx = sgd_param_groups(sched_j, momentum=MOM, weight_decay=WD)
    from mds_tpu.engine.train_state import TrainState

    state = TrainState(
        params=jax.tree_util.tree_map(jnp.asarray, params0),
        batch_stats=jax.tree_util.tree_map(jnp.asarray, stats0),
        opt_state=tx.init(params0),
        step=jnp.asarray(0, jnp.int32),
    )
    step = make_seg_train_step(
        model, tx, [CITY_MEAN], [CITY_STD],
        compute_dtype=jnp.float32, donate=False,
    )
    j_losses = []
    key = jax.random.PRNGKey(0)
    for i in range(N):
        state, metrics = step(state, [jnp.asarray(ims)], [jnp.asarray(lbs)],
                              key)
        j_losses.append(float(metrics["loss"]))

    # 1) LR schedule values agree at every step (torch records pre-step lr)
    j_lrs = [float(sched_j(i)) for i in range(N)]
    np.testing.assert_allclose(j_lrs, t_lrs, rtol=1e-5)

    # 2) loss trajectory: tight early, tolerance grows with compounding
    # f32 rounding; and training actually learns on both sides
    diffs = np.abs(np.asarray(j_losses) - np.asarray(t_losses))
    rel = diffs / np.maximum(np.abs(t_losses), 1.0)
    assert rel[:10].max() < 2e-3, (rel[:10].max(), j_losses[:10], t_losses[:10])
    assert rel.max() < 3e-2, (rel.argmax(), rel.max())
    assert t_losses[-1] < t_losses[0] and j_losses[-1] < j_losses[0]

    # 3) final params still aligned after 50 coupled steps
    va = np.concatenate([np.asarray(l, np.float64).ravel()
                         for l in jax.tree_util.tree_leaves(state.params)])
    vb = np.concatenate([np.asarray(l, np.float64).ravel()
                         for l in jax.tree_util.tree_leaves(t_params_final)])
    cos = va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb) + 1e-30)
    assert cos > 0.9999, cos

    # 4) final BN running stats (50 momentum-0.1 updates compounded).
    # Backbone stats average over full feature maps — tight per-element
    # check. The aux heads see tiny spatial extents (aux5_4 norms over
    # 2×4×8 samples at this fixture size) so their stats amplify the
    # params' own f32 drift chaotically — check those by relative L2.
    # A momentum-accounting bug (0.9-vs-0.1) diverges by O(1) everywhere.
    flat_ref = dict(
        (jax.tree_util.keystr(p), np.asarray(v))
        for p, v in jax.tree_util.tree_leaves_with_path(t_stats_final)
    )
    for path, v in jax.tree_util.tree_leaves_with_path(state.batch_stats):
        key = jax.tree_util.keystr(path)
        want = flat_ref[key]
        got = np.asarray(v)
        if "aux" in key or "head" in key:
            rel = np.linalg.norm(got - want) / (np.linalg.norm(want) + 1e-6)
            assert rel < 0.25, (key, rel)
        else:
            np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2,
                                       err_msg=key)
