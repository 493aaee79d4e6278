"""ClassRemap tests mirroring the reference's tiny-config pytest pattern
(lib/test/test_class_remap.py + configs/test/test.json)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mds_tpu.config import Configer
from mds_tpu.data.class_remap import ClassRemap


@pytest.fixture
def remapper():
    cfg = Configer(configs={
        "n_datasets": 2,
        "num_unify_classes": 6,
        "dataset1": {"n_cats": 3},
        "dataset2": {"n_cats": 4},
        "loss": {"ignore_index": 255, "reweight": False},
        "contrast": {"temperature": 0.07},
        # ds0: class0→{0}, class1→{1,2}, class2→{3}
        "class_remap1": {"0": [0], "1": [1, 2], "2": [3]},
        # ds1: 0→{0}, 1→{4}, 2→{5}, 3→{1}
        "class_remap2": {"0": [0], "1": [4], "2": [5], "3": [1]},
    })
    return ClassRemap(cfg)


def test_is_single_remap(remapper):
    assert remapper.IsSingleRemaplb(0)
    assert remapper.IsSingleRemaplb(3)
    assert remapper.IsSingleRemaplb(4)
    assert not remapper.IsSingleRemaplb(2)  # only in a multi-mapping


def test_seg_remapping_alternatives(remapper):
    lb = jnp.asarray([[0, 1], [2, 255]], jnp.int32)
    maps = remapper.SegRemapping(lb, 0)
    assert len(maps) == 2  # maxMapNum for ds0
    np.testing.assert_array_equal(np.asarray(maps[0]), [[0, 1], [3, 255]])
    # second alternative: only class1 has one; others → ignore
    np.testing.assert_array_equal(np.asarray(maps[1]), [[255, 2], [255, 255]])


def test_single_seg_remapping(remapper):
    lb = jnp.asarray([[0, 1], [2, 3]], jnp.int32)
    out = remapper.SingleSegRemapping(lb, 0)
    np.testing.assert_array_equal(np.asarray(out), [[0, 255], [3, 255]])


def test_eq_weight_mask(remapper):
    lb = jnp.asarray([[1]], jnp.int32)
    w = np.asarray(remapper.GetEqWeightMask(lb, 0))
    assert w.shape == (1, 1, 6)
    np.testing.assert_array_equal(w[0, 0], [0, 1, 1, 0, 0, 0])


def test_reverse_remap(remapper):
    preds = jnp.asarray([[0, 1, 2, 3]], jnp.int32)
    out = remapper.ReverseSegRemap(preds, 0)
    np.testing.assert_array_equal(np.asarray(out), [[0, 1, 1, 2]])


def test_remap_matrix(remapper):
    m = np.asarray(remapper.getRemapMatrix(1))
    assert m.shape == (4, 6)
    np.testing.assert_array_equal(m[1], [0, 0, 0, 0, 1, 0])


@pytest.fixture
def onehot_remapper():
    from mds_tpu.data.class_remap import ClassRemapOneHotLabel

    cfg = Configer(configs={
        "n_datasets": 2,
        "num_unify_classes": 6,
        "dataset1": {"n_cats": 3},
        "dataset2": {"n_cats": 4},
        "loss": {"ignore_index": 255, "reweight": False},
        "contrast": {"temperature": 0.07, "update_sim_thresh": 0.5,
                     "num_prototype": 1},
        "network": {"stride": 2},
        "lr": {"max_iter": 10},
        "class_remap1": {"0": [0], "1": [1, 2], "2": [3]},
        "class_remap2": {"0": [0], "1": [4], "2": [5], "3": [1]},
    })
    return ClassRemapOneHotLabel(cfg)


def test_single_seg_remapping_onehot(onehot_remapper):
    """ref class_remap.py:239-258: unique mappings one-hot, multi rows zero."""
    lb = jnp.asarray([[[0, 1], [2, 255]]], jnp.int32)
    m = np.asarray(onehot_remapper.SingleSegRemappingOneHot(lb, 0))
    assert m.shape == (1, 2, 2, 6)
    np.testing.assert_array_equal(m[0, 0, 0], [1, 0, 0, 0, 0, 0])  # 0→{0}
    assert m[0, 0, 1].sum() == 0  # multi-mapped class 1 excluded
    np.testing.assert_array_equal(m[0, 1, 0], [0, 0, 0, 1, 0, 0])  # 2→{3}
    assert m[0, 1, 1].sum() == 0  # ignore


def test_seg_remapping_onehot_multihot(onehot_remapper):
    """ref :260-276: multi-hot over all admissible unified classes."""
    lb = jnp.asarray([[[1]]], jnp.int32)
    m = np.asarray(onehot_remapper.SegRemappingOneHot(lb, 0))
    np.testing.assert_array_equal(m[0, 0, 0], [0, 1, 1, 0, 0, 0])


def test_kmeans_remapping(onehot_remapper):
    lb = jnp.asarray([[[0, 1]]], jnp.int32)
    cluster, constraint = onehot_remapper.KMeansRemapping(lb, 0)
    np.testing.assert_array_equal(np.asarray(cluster)[0, 0], [False, True])
    assert np.asarray(constraint)[0, 0, 1].tolist() == [0, 1, 1, 0, 0, 0]


def test_contrast_remapping_sharpening(onehot_remapper):
    """Confident multi-mapped pixels collapse onto the prototype-similarity
    argmax within their admissible set {1,2}; low-similarity pixels keep the
    full multi-hot (ref :278-422)."""
    # 4x4 labels all class 1 (multi-mapped {1,2}); stride 2 → 2x2 contrast
    lb = jnp.ones((1, 4, 4), jnp.int32)
    D = 4
    proto = np.zeros((6, D), np.float32)
    proto[1, 0] = 1.0  # unified class 1 prototype = e0
    proto[2, 1] = 1.0  # unified class 2 prototype = e1
    proto[5, 2] = 1.0  # off-set class — must never be selected
    embed = np.zeros((1, 2, 2, D), np.float32)
    embed[0, 0, 0, 0] = 1.0   # → class 1, sim 1.0
    embed[0, 0, 1, 1] = 1.0   # → class 2, sim 1.0
    embed[0, 1, 0, 2] = 1.0   # sim 0 within {1,2} → below thresh → multi-hot
    embed[0, 1, 1, 0] = 0.9   # → class 1, above 0.5
    cm, seg = onehot_remapper.ContrastRemapping(
        lb, jnp.asarray(embed), jnp.asarray(proto), 0, cur_iter=10
    )
    cm = np.asarray(cm)
    np.testing.assert_array_equal(cm[0, 0, 0], [0, 1, 0, 0, 0, 0])
    np.testing.assert_array_equal(cm[0, 0, 1], [0, 0, 1, 0, 0, 0])
    np.testing.assert_array_equal(cm[0, 1, 0], [0, 1, 1, 0, 0, 0])  # hard
    np.testing.assert_array_equal(cm[0, 1, 1], [0, 1, 0, 0, 0, 0])
    # seg mask is the nearest-upsampled contrast mask for multi-mapped pixels
    seg = np.asarray(seg)
    np.testing.assert_array_equal(seg[0, 0, 0], [0, 1, 0, 0, 0, 0])
    np.testing.assert_array_equal(seg[0, 3, 3], [0, 1, 0, 0, 0, 0])


def test_contrast_remapping_singles_and_ignore(onehot_remapper):
    """Single-mapped pixels stay one-hot; ignore rows are all-zero."""
    lb = jnp.asarray([[[0, 0], [2, 255]]], jnp.int32)  # 2x2, stride 2 → 1x1
    embed = jnp.zeros((1, 1, 1, 4), jnp.float32)
    proto = jnp.zeros((6, 4), jnp.float32)
    cm, seg = onehot_remapper.ContrastRemapping(lb, embed, proto, 0)
    seg = np.asarray(seg)
    np.testing.assert_array_equal(seg[0, 0, 0], [1, 0, 0, 0, 0, 0])
    np.testing.assert_array_equal(seg[0, 1, 0], [0, 0, 0, 1, 0, 0])
    assert seg[0, 1, 1].sum() == 0  # ignore


def test_contrast_remapping_anneal_ratio(onehot_remapper):
    """At cur_iter=0 the keep-ratio floor is 1 pixel per class: only the
    single highest-similarity pixel of each assigned class sharpens."""
    lb = jnp.ones((1, 4, 4), jnp.int32)
    proto = np.zeros((6, 4), np.float32)
    proto[1, 0] = 1.0
    embed = np.zeros((1, 2, 2, 4), np.float32)
    embed[..., 0] = np.asarray([[0.9, 0.8], [0.7, 0.6]])  # all → class 1
    cm, _ = onehot_remapper.ContrastRemapping(
        lb, jnp.asarray(embed), jnp.asarray(proto), 0, cur_iter=0
    )
    cm = np.asarray(cm)
    np.testing.assert_array_equal(cm[0, 0, 0], [0, 1, 0, 0, 0, 0])  # top-1
    for (i, j) in [(0, 1), (1, 0), (1, 1)]:
        np.testing.assert_array_equal(cm[0, i, j], [0, 1, 1, 0, 0, 0])
