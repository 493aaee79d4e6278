"""Shipped configs must parse and construct their models."""

import os

import jax
import jax.numpy as jnp
import pytest

from mds_tpu.config import Configer
from mds_tpu.engine.trainer import build_model, dataset_stats

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


@pytest.mark.parametrize("name", [
    "bisenetv2_city.json",
    "bisenetv1_city.json",
    "bisenetv2_city_cam_a2d2.json",
    "ltbgnn_7_datasets_snp.json",
    "ltbgnn_3_datasets_snp.json",
    "ltbgnn_7_datasets_mseg_snp.json",
    "hrnet_w48_city.json",
    "bisenetv2_contrast_3ds.json",
    "test_synthetic.json",
    "test_synthetic_gnn.json",
    "ltbgnn_5_datasets_snp.json",
    "ltbgnn_5_datasets_snp_gnnonly.json",
    "ltbgnn_7_datasets_snp_segonly.json",
    "clip_5_datasets.json",
    "bisenetv2_camvid.json",
    "bisenetv2_a2d2.json",
    "bisenetv1_coco.json",
    # round-3 recipe-zoo expansion (distinct reference recipes)
    "ltbgnn_7_datasets_hr.json",
    "ltbgnn_7_datasets_snp_train_tg.json",
    "ltbgnn_3_datasets_snp_unlabel.json",
    "ltbgnn_3_datasets_gat.json",
    "ltbgnn_all_in_one.json",
    "clip_7_datasets.json",
    "ltbgnn_7_datasets_mseg.json",
    "kitti.json",
    "wilddash.json",
    "scannet.json",
    "camvid.json",
    "Cityscapes.json",
    "Mapi.json",
    "gnn_city_cam_a2d2.json",
    "CEloss_city_cam_a2d2.json",
])
def test_config_builds_model(name):
    configer = Configer(config_file=os.path.join(CFG_DIR, name))
    model = build_model(configer, dtype=jnp.float32)
    assert model is not None
    means, stds = dataset_stats(configer)
    assert len(means) == configer.n_datasets


def test_ltbgnn_config_matches_reference_recipe():
    c = Configer(config_file=os.path.join(CFG_DIR, "ltbgnn_7_datasets_snp.json"))
    # BASELINE.md: AdamW lr 1e-3, wd 1e-5, crop 768, alternating 200k/60k, 960k
    assert c.get("lr", "optim") == "adamw"
    assert c.get("lr", "max_iter") == 960000
    assert c.get("train", "seg_iters") == 200000
    assert c.get("train", "gnn_iters") == 60000
    assert c.get("train", "cropsize") == [768, 768]
    assert c.n_datasets == 7
    assert c.get("GNN", "GNN_type") == "GSAGE"


def test_bisenetv2_city_matches_reference_recipe():
    c = Configer(config_file=os.path.join(CFG_DIR, "bisenetv2_city.json"))
    # configs/bisenetv2_city.py: 130k iters, lr 5e-3, crop 512x1024
    assert c.get("lr", "max_iter") == 130000
    assert c.get("lr", "lr_start") == 5e-3
    assert c.get("train", "cropsize") == [512, 1024]
    assert c.n_cats(0) == 19
    # reference default: per-GPU local BN (use_sync_bn=False) — selects the
    # shard_map local-moment step for run-to-run recipe parity
    assert c.get("use_sync_bn") is False


def test_gnn_model_from_7ds_config():
    from mds_tpu.models.gnn import LearnableTopologyBGNN
    from mds_tpu.models.semseg import SemsegModel

    c = Configer(config_file=os.path.join(CFG_DIR, "ltbgnn_7_datasets_snp.json"))
    seg = SemsegModel.from_configer(c)
    gnn = LearnableTopologyBGNN.from_configer(c)
    total = sum(c.n_cats(i) for i in range(7))
    assert seg.total_cats == total
    assert seg.max_num_unify_class == int(0.8 * total)
    assert gnn.adj_mode == "direct" and gnn.gnn_type == "GSAGE"


def test_model_factory_covers_reference_names():
    """Every name in the reference model_factory (lib/models/__init__.py)
    resolves in our registry."""
    import mds_tpu.models  # noqa: F401
    from mds_tpu.registry import MODELS

    ref_names = [
        "bisenetv1", "bisenetv2", "bisenetv1_swin", "bisenetv2_contrast",
        "bisenetv2_contrast_wn", "bisenetv2_contrast_bn",
        "bisenetv2_contrast_ema", "hrnet_w48_contrast", "hrnet_w48",
        "hrnet_w48_clip", "graph_attention_network", "hrnet_w48_gnn",
        "learnable_topology_GAT", "learnable_topology_BGNN",
        "learnable_topology_BGAT", "learnable_topology_BGNN_unlabel",
        "self_attention_GNN", "snp_rn18", "snp_rn18_mulbn",
        "learnable_topology_BGNN_adj", "learnable_topology_BGNN_adj_tg",
    ]
    have = set(MODELS._registry if hasattr(MODELS, "_registry") else MODELS.keys())
    missing = [n for n in ref_names if n not in have]
    assert not missing, missing


@pytest.mark.parametrize("name", [
    "ltbgnn_7_datasets_hr.json",
    "ltbgnn_7_datasets_snp_train_tg.json",
    "ltbgnn_3_datasets_snp_unlabel.json",
    "ltbgnn_all_in_one.json",
    "ltbgnn_7_datasets_mseg.json",
    "kitti.json",
    "wilddash.json",
    "scannet.json",
    "camvid.json",
])
def test_new_recipe_builds_gnn_model(name):
    """The alternating-trainer recipes also construct their GNN unifier
    (reference: each ltbgnn config names a GNN.model_name consumed by
    set_graph_model, train_ltbgnn_all_datasets_snp.py:147)."""
    from mds_tpu.models.gnn import LearnableTopologyBGNN

    c = Configer(config_file=os.path.join(CFG_DIR, name))
    gnn = LearnableTopologyBGNN.from_configer(c)
    total = sum(c.n_cats(i) for i in range(c.n_datasets))
    assert gnn.total_cats == total
    ratio = float(c.get("GNN", "unify_ratio", default=1.0))
    assert gnn.max_num_unify_class == int(ratio * total)


def test_eval_crop_recipes_match_reference():
    """eval_crop per config pinned to the reference py-configs
    (bisenetv2_city.py:17, bisenetv1_city.py:16, bisenetv2_a2d2.py:17,
    bisenetv2_cam.py:18, bisenetv1_coco.py:16)."""
    import json

    want = {
        "bisenetv2_city.json": [512, 1024],
        "bisenetv1_city.json": [512, 1024],
        "bisenetv2_a2d2.json": [512, 1024],
        "bisenetv2_camvid.json": [512, 1024],
        "bisenetv1_coco.json": [512, 512],
    }
    for name, crop in want.items():
        d = json.load(open(os.path.join(CFG_DIR, name)))
        assert d["eval"]["eval_crop"] == crop, name
