"""Loss zoo tests: golden vs torch where cheap, invariants elsewhere."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from mds_tpu.losses.contrast import (
    MemoryBank,
    PixelContrastLoss,
    memory_bank_push,
)
from mds_tpu.losses.helpers import (
    focal_loss,
    multi_label_cross_entropy,
    nll_plus_loss,
    recall_cross_entropy,
    weighted_nll_plus_loss,
)
from mds_tpu.losses.lovasz import boundary_aware_focal_loss, lovasz_grad, lovasz_softmax
from mds_tpu.losses.rmi import rmi_loss


def _rand(shape, seed=0, scale=1.0):
    return np.random.default_rng(seed).normal(0, scale, shape).astype(np.float32)


def test_focal_gamma0_equals_ce():
    logits = _rand((2, 8, 8, 5), 0)
    labels = np.random.default_rng(1).integers(0, 5, (2, 8, 8))
    labels[0, 0, 0] = 255
    got = float(focal_loss(jnp.asarray(logits), jnp.asarray(labels), gamma=0.0))
    want = float(
        F.cross_entropy(
            torch.from_numpy(logits.transpose(0, 3, 1, 2)),
            torch.from_numpy(labels.astype(np.int64)),
            ignore_index=255,
        )
    )
    assert abs(got - want) < 1e-5


def test_recall_ce_matches_torch_reference():
    logits = _rand((1, 8, 8, 4), 2, scale=3)
    labels = np.random.default_rng(3).integers(0, 4, (1, 8, 8)).astype(np.int64)
    labels[0, :2, :2] = 255

    # reference semantics (loss_helper.py:31-76)
    inp = torch.from_numpy(logits.transpose(0, 3, 1, 2))
    tgt = torch.from_numpy(labels)
    pred = inp.argmax(1)
    idex = (pred != tgt).view(-1)
    gt_counter = torch.ones((256,))
    gt_idx, gt_count = torch.unique(tgt, return_counts=True)
    gt_counter[gt_idx] = gt_count.float()
    fn_counter = torch.ones((256,))
    fn = tgt.view(-1)[idex]
    fn_idx, fn_count = torch.unique(fn, return_counts=True)
    fn_counter[fn_idx] = fn_count.float()
    weight = fn_counter / gt_counter
    weight[255] = 0
    CE = F.cross_entropy(inp, tgt, reduction="none", ignore_index=255)
    want = float((weight[tgt] * CE).mean())

    got = float(
        recall_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), 4)
    )
    assert abs(got - want) < 1e-5, (got, want)


def test_nll_plus_multi_positive():
    logits = _rand((1, 4, 4, 6), 4)
    lb0 = np.random.default_rng(5).integers(0, 6, (1, 4, 4))
    lb1 = np.full((1, 4, 4), 255)
    lb1[0, 0, 0] = 3  # one pixel has a second admissible label
    loss = float(
        nll_plus_loss(jnp.asarray(logits), [jnp.asarray(lb0), jnp.asarray(lb1)])
    )
    assert np.isfinite(loss)
    # adding an alternative can only increase total prob → lower loss
    loss_single = float(nll_plus_loss(jnp.asarray(logits), [jnp.asarray(lb0)]))
    assert loss <= loss_single + 1e-6


def test_weighted_nll_plus():
    logits = _rand((1, 4, 4, 5), 6)
    mask = np.zeros((1, 4, 4, 5), np.float32)
    mask[..., 2] = 1
    loss = float(weighted_nll_plus_loss(jnp.asarray(logits), jnp.asarray(mask)))
    assert np.isfinite(loss) and loss > 0


def test_multilabel_ce_prefers_positives():
    logits = np.zeros((1, 2, 2, 4), np.float32)
    logits[..., 1] = 5.0
    mh_good = np.zeros((1, 2, 2, 4), np.float32)
    mh_good[..., 1] = 1
    mh_bad = np.zeros((1, 2, 2, 4), np.float32)
    mh_bad[..., 2] = 1
    good = float(multi_label_cross_entropy(jnp.asarray(logits), jnp.asarray(mh_good)))
    bad = float(multi_label_cross_entropy(jnp.asarray(logits), jnp.asarray(mh_bad)))
    assert good < bad


def test_lovasz_grad_and_perfect_prediction():
    g = lovasz_grad(jnp.asarray([1.0, 1.0, 0.0]))
    assert np.isfinite(np.asarray(g)).all()
    labels = np.random.default_rng(7).integers(0, 3, (1, 8, 8))
    perfect = jax.nn.one_hot(jnp.asarray(labels), 3) * 50.0
    loss = float(lovasz_softmax(perfect, jnp.asarray(labels)))
    assert loss < 1e-3
    bad = 50.0 - np.asarray(perfect)
    loss_bad = float(lovasz_softmax(jnp.asarray(bad), jnp.asarray(labels)))
    assert loss_bad > loss


def test_lovasz_matches_torch_reference_impl():
    """Cross-check against a direct numpy transcription of lovasz_softmax_flat."""
    rng = np.random.default_rng(8)
    P, C = 64, 4
    probas = jax.nn.softmax(jnp.asarray(rng.normal(0, 1, (P, C)), jnp.float32), -1)
    labels = rng.integers(0, C, P)

    def np_lovasz(probas, labels):
        losses = []
        for c in range(C):
            fg = (labels == c).astype(np.float64)
            if fg.sum() == 0:
                continue
            errors = np.abs(fg - probas[:, c])
            perm = np.argsort(-errors)
            errors_sorted = errors[perm]
            fg_sorted = fg[perm]
            gts = fg_sorted.sum()
            inter = gts - np.cumsum(fg_sorted)
            union = gts + np.cumsum(1 - fg_sorted)
            jac = 1 - inter / union
            jac[1:] = jac[1:] - jac[:-1]
            losses.append((errors_sorted * jac).sum())
        return np.mean(losses)

    want = np_lovasz(np.asarray(probas, np.float64), labels)
    from mds_tpu.losses.lovasz import lovasz_softmax_flat

    got = float(
        lovasz_softmax_flat(probas, jnp.asarray(labels), jnp.ones(P, bool))
    )
    assert abs(got - want) < 1e-4, (got, want)


def test_boundary_aware_focal():
    logits = _rand((1, 8, 8, 3), 9)
    labels = np.random.default_rng(10).integers(0, 3, (1, 8, 8))
    alphas = np.random.default_rng(11).random((1, 8, 8)).astype(np.float32)
    loss = float(
        boundary_aware_focal_loss(
            jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(alphas), gamma=0.5
        )
    )
    assert np.isfinite(loss) and loss > 0


def test_rmi_loss_runs_and_discriminates():
    rng = np.random.default_rng(12)
    labels = rng.integers(0, 3, (1, 32, 32))
    good_logits = np.asarray(jax.nn.one_hot(jnp.asarray(labels), 3)) * 8 - 4
    bad_logits = _rand((1, 32, 32, 3), 13, scale=2)
    good = float(rmi_loss(jnp.asarray(good_logits), jnp.asarray(labels), 3,
                          pool_size=2))
    bad = float(rmi_loss(jnp.asarray(bad_logits), jnp.asarray(labels), 3,
                         pool_size=2))
    assert np.isfinite(good) and np.isfinite(bad)
    assert good < bad


def test_contrast_loss_and_memory_bank():
    rng = np.random.default_rng(14)
    C, M, D = 4, 8, 16
    bank = MemoryBank.create(C, M, D)
    feats = jnp.asarray(rng.normal(0, 1, (1, 8, 8, D)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, C, (1, 8, 8)), jnp.int32)
    preds = jnp.asarray(rng.integers(0, C, (1, 8, 8)), jnp.int32)
    crit = PixelContrastLoss(n_view=4)
    loss = float(crit(feats, labels, preds, bank, jax.random.PRNGKey(0)))
    assert np.isfinite(loss) and loss > 0
    # bank update advances pointers for present classes only
    bank2 = memory_bank_push(
        bank, feats.reshape(-1, D), labels.reshape(-1), jax.random.PRNGKey(1)
    )
    assert (np.asarray(bank2.ptr) >= np.asarray(bank.ptr)).all()
    assert np.asarray(bank2.ptr).sum() > 0


def test_aaf_loss_prefers_consistent_predictions():
    from mds_tpu.losses.aaf import AAFLoss, eight_corner

    rng = np.random.default_rng(20)
    # block labels: interior pairs are non-edge; prediction matching the
    # labels should beat a noisy prediction
    lb8 = rng.integers(0, 3, (1, 4, 4))
    lb = np.repeat(np.repeat(lb8, 4, 1), 4, 2).astype(np.int32)
    good = np.asarray(jax.nn.one_hot(jnp.asarray(lb), 3)) * 6 - 3
    bad = rng.normal(0, 3, (1, 16, 16, 3)).astype(np.float32)
    crit = AAFLoss(num_classes=3)
    lg = float(crit(jnp.asarray(good), jnp.asarray(lb)))
    lb_ = float(crit(jnp.asarray(bad), jnp.asarray(lb)))
    assert np.isfinite(lg) and np.isfinite(lb_)
    assert lg < lb_


def test_eight_corner_shape_and_values():
    from mds_tpu.losses.aaf import eight_corner

    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    nb = eight_corner(x, 1)
    assert nb.shape == (1, 4, 4, 1, 8)
    # neighbor up-left of pixel (1,1) is pixel (0,0)
    assert float(nb[0, 1, 1, 0, 0]) == 0.0
    # padding at the border
    assert float(nb[0, 0, 0, 0, 0]) == 0.0


def test_fs_loss_wrappers():
    """FS* wrapper family (ref loss_helper.py:342-543) + SegFix."""
    import jax
    from mds_tpu.losses.fs import (
        FSAuxCELoss, FSCELoss, FSCELOVASZLoss, FSOhemCELoss, FSRMILoss,
        SegFixLoss,
    )

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 5)), jnp.float32)
    aux = jnp.asarray(rng.normal(0, 1, (2, 4, 4, 5)), jnp.float32)
    lb = jnp.asarray(rng.integers(0, 5, (2, 8, 8)), jnp.int32)
    lb = lb.at[0, 0, 0].set(255)

    ce = FSCELoss()(logits, lb)
    # parity with torch CE mean over valid pixels
    import torch
    import torch.nn.functional as F
    want = F.cross_entropy(
        torch.tensor(np.asarray(logits)).permute(0, 3, 1, 2),
        torch.tensor(np.asarray(lb), dtype=torch.long), ignore_index=255,
    ).item()
    assert abs(float(ce) - want) < 1e-5

    # list form with weights; aux label auto-rescaled nearest
    two = FSCELoss()([logits, aux], lb, weights=[1.0, 0.4])
    assert np.isfinite(float(two)) and float(two) > float(ce) * 0.3

    assert np.isfinite(float(FSAuxCELoss()( (aux, logits), lb)))
    assert np.isfinite(float(FSOhemCELoss(thresh=0.7)(logits, lb)))
    assert np.isfinite(float(FSRMILoss()(logits, lb)))
    assert np.isfinite(float(FSCELOVASZLoss()(logits, lb)))

    # SegFix: mask + direction
    pred_mask = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 2)), jnp.float32)
    pred_dir = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 8)), jnp.float32)
    seg_lb = jnp.asarray(rng.integers(0, 5, (1, 8, 8)), jnp.int32)
    dist = jnp.asarray(rng.uniform(0, 10, (1, 8, 8)), jnp.float32)
    ang = jnp.asarray(rng.uniform(-180, 180, (1, 8, 8)), jnp.float32)
    sf = SegFixLoss()((pred_mask, pred_dir), (seg_lb, dist, ang))
    assert np.isfinite(float(sf)) and float(sf) > 0


def test_fs_segfix_helpers():
    from mds_tpu.losses.fs import angle_to_direction_label, distance_to_mask_label

    seg = jnp.asarray([[0, 255], [1, 2]], jnp.int32)
    dist = jnp.asarray([[1.0, 1.0], [9.0, 4.0]], jnp.float32)
    m = np.asarray(distance_to_mask_label(dist, seg))
    np.testing.assert_array_equal(m, [[1, -1], [0, 1]])

    ang = jnp.asarray([[-179.0, 0.0], [0.0, 179.0]], jnp.float32)
    d = np.asarray(angle_to_direction_label(ang, seg, 8))
    assert d[0, 1] == -1  # ignore
    assert d[0, 0] == 0 and d[1, 1] == 7
    assert d[1, 0] == 4  # 0 deg → sector 4 of 8 ([-180,180) shifted)


def test_cross_datasets_kmeans_loss():
    """KMeans-era loss (ref loss_cross_datasets.py:349-660): warmup multi-hot
    NLL, main-phase bank enqueue + prototype EMA refresh + sharpened masks."""
    import jax

    from mds_tpu.config import Configer
    from mds_tpu.losses.contrast import MemoryBank
    from mds_tpu.losses.cross_datasets_kmeans import (
        CrossDatasetsCELossKMeans,
        multi_hot_nll,
        update_prototypes,
    )

    cfg = Configer(configs={
        "n_datasets": 2,
        "num_unify_classes": 6,
        "dataset1": {"n_cats": 3}, "dataset2": {"n_cats": 4},
        "loss": {"ignore_index": 255, "reweight": False, "aux_weight": 0.4},
        "contrast": {"num_prototype": 1, "coefficient": 0.9,
                     "loss_weight": 0.5, "use_contrast": True,
                     "update_sim_thresh": 0.3, "temperature": 0.07},
        "network": {"stride": 2},
        "lr": {"max_iter": 10},
        "class_remap1": {"0": [0], "1": [1, 2], "2": [3]},
        "class_remap2": {"0": [0], "1": [4], "2": [5], "3": [1]},
    })
    crit = CrossDatasetsCELossKMeans(cfg)
    rng = np.random.default_rng(0)
    B, H, W, D, U = 1, 8, 8, 4, 6
    lbs = [jnp.asarray(rng.integers(0, 3, (B, H, W)), jnp.int32),
           jnp.asarray(rng.integers(0, 4, (B, H, W)), jnp.int32)]
    seg = [jnp.asarray(rng.normal(0, 1, (B, H, W, U)), jnp.float32)
           for _ in range(2)]
    emb = [jnp.asarray(rng.normal(0, 1, (B, H // 2, W // 2, D)), jnp.float32)
           for _ in range(2)]
    emb = [e / jnp.linalg.norm(e, axis=-1, keepdims=True) for e in emb]
    bank = MemoryBank.create(U, 4, D)
    protos = jnp.asarray(rng.normal(0, 1, (U, D)), jnp.float32)
    protos = protos / jnp.linalg.norm(protos, axis=-1, keepdims=True)

    # warmup: bank still fills, seg loss only
    loss_w, m_w, bank2, protos2 = crit(
        {"seg": seg, "embed": emb}, lbs, bank, protos, is_warmup=True
    )
    assert np.isfinite(float(loss_w)) and float(m_w["contrast_loss"]) == 0.0
    assert (np.asarray(bank2.ptr) != np.asarray(bank.ptr)).any()

    # main phase: contrast term live, prototypes refreshed + unit-norm
    loss_m, m_m, bank3, protos3 = crit(
        {"seg": seg, "embed": emb}, lbs, bank2, protos2, cur_iter=5
    )
    assert np.isfinite(float(loss_m)) and float(m_m["contrast_loss"]) > 0.0
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(protos3), axis=-1), 1.0, atol=1e-5
    )
    assert not np.allclose(np.asarray(protos3), np.asarray(protos2))

    # multi_hot_nll: empty-mask pixels excluded; perfect logits → ~0 loss
    logits = jnp.asarray([[10.0, -10, -10], [0, 0, 0]], jnp.float32)
    mask = jnp.asarray([[True, False, False], [False, False, False]])
    assert float(multi_hot_nll(logits, mask)) < 1e-3

    # update_prototypes is an EMA toward the bank mean
    p2 = update_prototypes(bank3, protos3, 1.0)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(protos3), atol=1e-5)


def test_cross_entropy_upsampled_matches_resize_path():
    """Phase-decomposed upsample+CE == resize-then-CE (same loss multiset,
    same OHEM value), and the bilinear phases match torch F.interpolate."""
    from mds_tpu.losses.ohem_ce import (
        OhemCELoss,
        cross_entropy_per_pixel,
        cross_entropy_upsampled,
    )

    rng = np.random.default_rng(0)
    B, hs, ws, C, f = 2, 6, 8, 5, 4
    logits = jnp.asarray(rng.normal(0, 2, (B, hs, ws, C)), jnp.float32)
    lb = rng.integers(0, C, (B, hs * f, ws * f))
    lb[0, :3, :5] = 255  # some ignored pixels
    lb = jnp.asarray(lb, jnp.int32)

    up = jax.image.resize(logits, (B, hs * f, ws * f, C), method="linear")
    # sanity: jax resize == torch bilinear align_corners=False
    up_t = F.interpolate(
        torch.from_numpy(np.asarray(logits)).permute(0, 3, 1, 2),
        scale_factor=f, mode="bilinear", align_corners=False,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(up), up_t, atol=1e-5)

    ce_ref, valid_ref = cross_entropy_per_pixel(up, lb)
    ce_ph, valid_ph = cross_entropy_upsampled(logits, lb, f)
    assert ce_ph.shape == (f * f, B, hs, ws)
    # same multiset of per-pixel losses (phase-major vs row-major order)
    np.testing.assert_allclose(
        np.sort(np.asarray(ce_ph).ravel()),
        np.sort(np.asarray(ce_ref).ravel()), atol=1e-5)
    assert int(valid_ph.sum()) == int(valid_ref.sum())

    # identical OHEM losses through both paths (order-free reduction)
    crit = OhemCELoss(0.7, exact=True)
    l_ref = float(crit(up, lb))
    l_ph = float(crit.upsampled(logits, lb, f))
    np.testing.assert_allclose(l_ph, l_ref, rtol=1e-6)

    # factor 1 passthrough
    lb1 = jnp.asarray(rng.integers(0, C, (B, hs, ws)), jnp.int32)
    np.testing.assert_allclose(
        float(crit.upsampled(logits, lb1, 1)), float(crit(logits, lb1)),
        rtol=1e-6)


def test_cross_entropy_upsampled_grad_matches():
    """Gradients w.r.t. the head-res logits agree with the resize path."""
    from mds_tpu.losses.ohem_ce import OhemCELoss

    rng = np.random.default_rng(1)
    B, hs, ws, C, f = 1, 4, 6, 4, 8
    logits = jnp.asarray(rng.normal(0, 1, (B, hs, ws, C)), jnp.float32)
    lb = jnp.asarray(rng.integers(0, C, (B, hs * f, ws * f)), jnp.int32)
    crit = OhemCELoss(0.7, exact=True)

    def loss_ref(x):
        up = jax.image.resize(x, (B, hs * f, ws * f, C), method="linear")
        return crit(up, lb)

    g_ref = jax.grad(loss_ref)(logits)
    g_ph = jax.grad(lambda x: crit.upsampled(x, lb, f))(logits)
    np.testing.assert_allclose(np.asarray(g_ph), np.asarray(g_ref),
                               atol=1e-5)
