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
