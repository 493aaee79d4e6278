import json

import pytest

from mds_tpu.config import Configer, set_cfg_from_file


def make_cfg(tmp_path):
    cfg = {
        "model_name": "bisenetv2",
        "n_datasets": 2,
        "dataset1": {"n_cats": 19, "data_reader": "CityScapes", "ims_per_gpu": 8},
        "dataset2": {"n_cats": 11, "data_reader": "CamVid", "ims_per_gpu": 2},
        "lr": {"lr_start": 5e-3, "max_iter": 130000},
        "train": {"scales": [0.5, 1.0, 1.5], "cropsize": [512, 1024]},
    }
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    return str(p)


def test_get_nested(tmp_path):
    c = Configer(config_file=make_cfg(tmp_path))
    assert c.get("lr", "lr_start") == 5e-3
    assert c.get("model_name") == "bisenetv2"
    assert c.get("nope") is None
    assert c.get("lr", "nope", default=7) == 7
    with pytest.raises(KeyError):
        c.get_strict("lr", "nope")


def test_exists_add_update_plus_one(tmp_path):
    c = Configer(config_file=make_cfg(tmp_path))
    assert c.exists("lr", "max_iter")
    assert not c.exists("lr", "bogus")
    c.add(["lr", "warmup_iter"], 1000)
    assert c.get("lr", "warmup_iter") == 1000
    with pytest.raises(KeyError):
        c.add(["lr", "warmup_iter"], 5)
    c.update(["lr", "warmup_iter"], 5)
    assert c.get("lr", "warmup_iter") == 5
    assert c.plus_one("iter") == 1
    assert c.plus_one("iter") == 2


def test_cli_overrides(tmp_path):
    c = Configer(
        config_file=make_cfg(tmp_path),
        args_parser=["lr.lr_start", "0.01", "train.cropsize", "[768,768]"],
    )
    assert c.get("lr", "lr_start") == 0.01
    assert c.get("train", "cropsize") == [768, 768]
    c2 = Configer(config_file=make_cfg(tmp_path), args_parser=["lr.max_iter=80000"])
    assert c2.get("lr", "max_iter") == 80000


def test_dataset_helpers(tmp_path):
    c = Configer(config_file=make_cfg(tmp_path))
    assert c.n_datasets == 2
    assert c.n_cats(0) == 19
    assert c.n_cats(1) == 11
    assert c.dataset_cfg(1)["data_reader"] == "CamVid"


def test_py_config(tmp_path):
    p = tmp_path / "cfg.py"
    p.write_text("cfg = dict(model_type='bisenetv2', n_cats=19, lr_start=5e-3)\n")
    c = set_cfg_from_file(str(p))
    assert c.get("model_type") == "bisenetv2"
    assert c.get("n_cats") == 19
