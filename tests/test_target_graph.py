import numpy as np

from mds_tpu.config import Configer
from mds_tpu.ops.target_graph import target_graphs_from_pairs, target_graphs_from_remap


def test_target_graphs_from_remap():
    cfg = Configer(configs={
        "n_datasets": 2, "num_unify_classes": 6,
        "dataset1": {"n_cats": 3}, "dataset2": {"n_cats": 4},
        "loss": {"ignore_index": 255},
        "class_remap1": {"0": [0], "1": [1, 2], "2": [3]},
        "class_remap2": {"0": [0], "1": [4], "2": [5], "3": [1]},
    })
    graphs = target_graphs_from_remap(cfg)
    assert graphs[0].shape == (3, 6) and graphs[1].shape == (4, 6)
    np.testing.assert_array_equal(graphs[0][1], [0, 1, 1, 0, 0, 0])
    np.testing.assert_array_equal(graphs[1][2], [0, 0, 0, 0, 0, 1])


def test_target_graphs_from_pairs_unconstrained():
    gs = target_graphs_from_pairs([2], 4, [[(0, 1), (1, 3)]])
    g = gs[0]
    assert g[0, 1] == 1 and g[1, 3] == 1
    assert (g[0, [0, 2, 3]] == 255).all()
