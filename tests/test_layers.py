"""Golden tests of DatasetNorm and OHEM against torch (CPU) reference ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mds_tpu.models.layers import ConvBNReLU, DatasetNorm
from mds_tpu.ops.ohem import ohem_mean, ohem_mean_exact
from mds_tpu.losses.ohem_ce import MdsOhemCELoss, OhemCELoss, cross_entropy_per_pixel


# ---------------------------------------------------------------- DatasetNorm
def torch_multibn_step(x_splits, scale, bias, momentum=0.1, eps=1e-5):
    """Reference ConvBNReLU BN path (lib/models/bisenetv2.py:29-58):
    per-split BatchNorm2d(affine=False) + shared affine."""
    outs, stats = [], []
    for xs in x_splits:
        bn = torch.nn.BatchNorm2d(xs.shape[1], affine=False, momentum=momentum, eps=eps)
        bn.train()
        y = bn(torch.from_numpy(xs))
        y = y * torch.from_numpy(scale).reshape(1, -1, 1, 1) + torch.from_numpy(
            bias
        ).reshape(1, -1, 1, 1)
        outs.append(y.detach().numpy())
        stats.append((bn.running_mean.numpy(), bn.running_var.numpy()))
    return outs, stats


def test_datasetnorm_matches_torch_train_and_stats():
    rng = np.random.default_rng(0)
    c = 6
    x0 = rng.normal(2.0, 3.0, (3, 4, 5, c)).astype(np.float32)  # NHWC
    x1 = rng.normal(-1.0, 0.5, (2, 4, 5, c)).astype(np.float32)
    scale = rng.normal(1, 0.1, c).astype(np.float32)
    bias = rng.normal(0, 0.1, c).astype(np.float32)

    m = DatasetNorm(c, n_bn=2)
    variables = m.init(
        jax.random.PRNGKey(0), [jnp.zeros((1, 4, 5, c))] * 2, train=False
    )
    variables = {
        "params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
        "batch_stats": variables["batch_stats"],
    }
    ys, mut = m.apply(
        variables,
        [jnp.asarray(x0), jnp.asarray(x1)],
        train=True,
        mutable=["batch_stats"],
    )

    t_outs, t_stats = torch_multibn_step(
        [np.transpose(x0, (0, 3, 1, 2)), np.transpose(x1, (0, 3, 1, 2))], scale, bias
    )
    got0 = np.transpose(np.asarray(ys[0]), (0, 3, 1, 2))
    got1 = np.transpose(np.asarray(ys[1]), (0, 3, 1, 2))
    np.testing.assert_allclose(got0, t_outs[0], atol=1e-4)
    np.testing.assert_allclose(got1, t_outs[1], atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["mean"][0]), t_stats[0][0], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["var"][0]), t_stats[0][1], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["mean"][1]), t_stats[1][0], atol=1e-5
    )


def test_datasetnorm_eval_uses_selected_stats():
    c = 4
    m = DatasetNorm(c, n_bn=2)
    stats = {
        "mean": jnp.stack([jnp.zeros(c), jnp.full(c, 5.0)]),
        "var": jnp.stack([jnp.ones(c), jnp.full(c, 4.0)]),
    }
    params = {"scale": jnp.ones(c), "bias": jnp.zeros(c)}
    x = jnp.full((2, 3, 3, c), 5.0)
    y0 = m.apply({"params": params, "batch_stats": stats}, [x, None], train=False)[0]
    y1 = m.apply({"params": params, "batch_stats": stats}, [None, x], train=False)[1]
    np.testing.assert_allclose(np.asarray(y0), 5.0, atol=1e-2)
    np.testing.assert_allclose(np.asarray(y1), 0.0, atol=1e-3)


def test_datasetnorm_skips_absent_dataset_stats():
    c = 4
    m = DatasetNorm(c, n_bn=3)
    v = m.init(jax.random.PRNGKey(0), [jnp.zeros((1, 2, 2, c))] * 3, train=False)
    x = jnp.asarray(np.random.default_rng(0).normal(3, 1, (4, 2, 2, c)), jnp.float32)
    ys, mut = m.apply(v, [x, None, None], train=True, mutable=["batch_stats"])
    assert ys[1] is None and ys[2] is None
    # dataset 0 stats moved, 1 and 2 untouched
    assert not np.allclose(np.asarray(mut["batch_stats"]["mean"][0]), 0.0)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["mean"][1]), 0.0)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["var"][2]), 1.0)


def test_convbnrelu_depthwise_and_stride():
    m = ConvBNReLU(16, ks=3, stride=2, groups=8, n_bn=1)
    x = jnp.ones((2, 8, 8, 8))
    v = m.init(jax.random.PRNGKey(0), [x], train=False)
    (y,) = m.apply(v, [x], train=False)
    assert y.shape == (2, 4, 4, 16)
    assert (np.asarray(y) >= 0).all()


# ---------------------------------------------------------------- OHEM
def torch_ohem(logits_nchw, labels, thresh=0.7, ignore=255):
    """Exact reference OhemCELoss (lib/loss/ohem_ce_loss.py:13-34)."""
    th = -torch.log(torch.tensor(thresh, dtype=torch.float))
    crit = torch.nn.CrossEntropyLoss(ignore_index=ignore, reduction="none")
    lg = torch.from_numpy(logits_nchw)
    lb = torch.from_numpy(labels.astype(np.int64))
    n_min = lb[lb != ignore].numel() // 16
    loss = crit(lg, lb).view(-1)
    loss_hard = loss[loss > th]
    if loss_hard.numel() < n_min:
        loss_hard, _ = loss.topk(n_min)
    return float(torch.mean(loss_hard))


@pytest.mark.parametrize("seed,sharp", [(0, False), (1, True)])
def test_ohem_exact_matches_torch(seed, sharp):
    rng = np.random.default_rng(seed)
    b, c, h, w = 2, 5, 16, 16
    scale = 8.0 if sharp else 1.0  # sharp logits → few pixels above thresh
    logits = (rng.normal(0, scale, (b, c, h, w))).astype(np.float32)
    labels = rng.integers(0, c, (b, h, w)).astype(np.int64)
    labels[rng.random((b, h, w)) < 0.2] = 255

    want = torch_ohem(logits, labels)
    logits_nhwc = jnp.asarray(np.transpose(logits, (0, 2, 3, 1)))
    got = float(OhemCELoss(0.7, exact=True)(logits_nhwc, jnp.asarray(labels)))
    assert abs(got - want) < 1e-4, (got, want)


def test_ohem_hist_close_to_exact():
    rng = np.random.default_rng(3)
    b, c, h, w = 2, 19, 32, 32
    logits = rng.normal(0, 4.0, (b, h, w, c)).astype(np.float32)
    labels = rng.integers(0, c, (b, h, w)).astype(np.int64)
    labels[rng.random((b, h, w)) < 0.3] = 255
    ce, valid = cross_entropy_per_pixel(jnp.asarray(logits), jnp.asarray(labels))
    exact = float(ohem_mean_exact(ce, valid, 0.3567))
    hist = float(ohem_mean(ce, valid, 0.3567))
    assert abs(exact - hist) / max(exact, 1e-6) < 0.02, (exact, hist)


def test_mds_ohem_global_pool():
    rng = np.random.default_rng(4)
    lg0 = rng.normal(0, 2, (1, 8, 8, 5)).astype(np.float32)
    lg1 = rng.normal(0, 2, (2, 8, 8, 7)).astype(np.float32)
    lb0 = rng.integers(0, 5, (1, 8, 8)).astype(np.int64)
    lb1 = rng.integers(0, 7, (2, 8, 8)).astype(np.int64)
    loss = MdsOhemCELoss(0.7, exact=True)(
        [jnp.asarray(lg0), jnp.asarray(lg1)], [jnp.asarray(lb0), jnp.asarray(lb1)]
    )
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_ohem_all_ignore_is_finite():
    logits = jnp.zeros((1, 4, 4, 3))
    labels = jnp.full((1, 4, 4), 255, jnp.int32)
    loss = OhemCELoss(0.7)(logits, labels)
    assert np.isfinite(float(loss))


def test_ohem_hist_bisect_branch_close_to_exact():
    """Mostly-confident predictions force the n_min rule (the lax.cond
    bisection branch): hist quantile must still track the exact top-k."""
    rng = np.random.default_rng(9)
    b, c, h, w = 2, 19, 32, 32
    labels = rng.integers(0, c, (b, h, w)).astype(np.int64)
    # logits strongly favor the true class -> CE mostly << -log(0.7)
    logits = rng.normal(0, 0.05, (b, h, w, c)).astype(np.float32)
    onehot = np.eye(c, dtype=np.float32)[labels] * 6.0
    logits += onehot
    # a few genuinely hard pixels
    hard = rng.random((b, h, w)) < 0.01
    logits[hard] = rng.normal(0, 1.0, (int(hard.sum()), c))
    ce, valid = cross_entropy_per_pixel(jnp.asarray(logits), jnp.asarray(labels))
    n_above = int(((np.asarray(ce) > 0.3567) & np.asarray(valid)).sum())
    n_min = int(np.asarray(valid).sum()) // 16
    assert n_above < n_min, "test must exercise the bisection branch"
    exact = float(ohem_mean_exact(ce, valid, 0.3567))
    hist = float(ohem_mean(ce, valid, 0.3567))
    assert abs(exact - hist) / max(exact, 1e-6) < 0.02, (exact, hist)
