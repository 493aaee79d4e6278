"""Contrast-family torch importer (`--finetune-from` for mode=contrast).

Golden vs the ACTUAL reference model: lib/models/bisenetv2_contrast.py
BiSeNetV2_Contrast is instantiated, its state_dict imported through
deploy.torch_import.bisenetv2_contrast_from_torch, and we assert

  * structural parity — the imported trees carry exactly the leaves our
    BiSeNetV2Contrast.init produces (same paths, same shapes);
  * forward parity — detail→segment→bga features, the convmlp projection
    embedding, AND the unified-head ConvNorm cosine logits match the torch
    forward numerically (per-dataset BN slots routed identically);
  * ContrastTrainer.finetune_from loads a .pth end-to-end (incl. the
    prototypes buffer) and the next step is finite.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mds_tpu.config import Configer  # noqa: E402

N_UNIFY, N_BN, PROJ = 6, 2, 16
HW = 64


class RefCfg:
    """Minimal configer for the reference model's __init__ reads."""

    _vals = {
        ("aux_mode",): "train",
        ("num_unify_classes",): N_UNIFY,
        ("n_datasets",): 2,
        ("n_bn",): N_BN,
        ("network", "stride"): 8,
        ("contrast", "proj_dim"): PROJ,
        ("contrast", "upsample"): False,
        ("contrast", "downsample"): False,
        ("contrast", "num_prototype"): 3,
        ("contrast", "coefficient"): 0.9,
        ("contrast", "update_sim_thresh"): 0.6,
        ("contrast", "use_contrast"): True,
        ("dataset_aux_head", "use_dataset_aux_head"): False,
        ("network", "with_domain_adversarial"): False,
        ("use_sync_bn",): False,
        ("lr", "max_iter"): 10,
        ("dataset1", "ims_per_gpu"): 1,
        ("dataset2", "ims_per_gpu"): 1,
    }

    def get(self, *keys):
        return self._vals[keys]


@pytest.fixture(scope="module")
def ref_model():
    from test_reference_parity import import_ref_package_module, randomize_state

    mod = import_ref_package_module("lib.models.bisenetv2_contrast")
    torch.manual_seed(0)
    # init_weights tail-calls load_pretrain('./res/backbone_v2.pth') —
    # absent here and irrelevant (randomize_state overwrites everything)
    mod.BiSeNetV2_Contrast.load_pretrain = lambda self: None
    net = mod.BiSeNetV2_Contrast(RefCfg())
    randomize_state(net, seed=7)
    net.eval()
    return net


def my_configer():
    return Configer(configs={
        "model_name": "bisenetv2_contrast",
        "n_datasets": 2,
        "n_bn": N_BN,
        "num_unify_classes": N_UNIFY,
        "use_ema": False,
        "dataset1": {"n_cats": 3, "ims_per_gpu": 1},
        "dataset2": {"n_cats": 4, "ims_per_gpu": 1},
        "class_remap1": {"0": [0], "1": [1, 5], "2": [2]},
        "class_remap2": {"0": [0], "1": [3], "2": [4], "3": [5]},
        "loss": {"ohem_thresh": 0.7, "ignore_index": 255},
        "network": {"stride": 8},
        "contrast": {
            "proj_dim": PROJ, "temperature": 0.07, "base_temperature": 0.07,
            "max_views": 2, "loss_weight": 0.1, "memory_bank_size": 4,
            "num_prototype": 3, "coefficient": 0.9,
        },
        "lr": {"lr_start": 1e-2, "max_iter": 10, "warmup_iters": 2},
        "train": {"mode": "contrast", "cropsize": [HW, HW]},
    })


def _tree_paths(tree):
    return {
        jax.tree_util.keystr(p): np.shape(v)
        for p, v in jax.tree_util.tree_leaves_with_path(tree)
    }


def test_detect_layout(ref_model):
    from mds_tpu.deploy.torch_import import detect_torch_layout

    assert detect_torch_layout(ref_model.state_dict()) == "bisenetv2_contrast"


def test_structural_parity(ref_model):
    from mds_tpu.deploy.torch_import import bisenetv2_contrast_from_torch
    from mds_tpu.models.bisenetv2_contrast import BiSeNetV2Contrast

    params, stats, extras = bisenetv2_contrast_from_torch(
        ref_model.state_dict(), n_bn=N_BN)
    model = BiSeNetV2Contrast(
        num_unify_classes=N_UNIFY, datasets_cats=(3, 4), n_bn=N_BN,
        proj_dim=PROJ)
    x0 = jnp.zeros((1, HW, HW, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        [x0, x0], train=True,  # train=True: the aux heads are train-only
    )
    assert _tree_paths(params) == _tree_paths(variables["params"])
    assert _tree_paths(stats) == _tree_paths(variables["batch_stats"])
    assert extras["prototypes"].shape == (N_UNIFY, 3, PROJ)


def test_trunk_and_projection_forward_parity(ref_model):
    from mds_tpu.deploy.torch_import import bisenetv2_contrast_from_torch
    from mds_tpu.models.bisenetv2_contrast import BiSeNetV2Contrast

    params, stats, _ = bisenetv2_contrast_from_torch(
        ref_model.state_dict(), n_bn=N_BN)
    model = BiSeNetV2Contrast(
        num_unify_classes=N_UNIFY, datasets_cats=(3, 4), n_bn=N_BN,
        proj_dim=PROJ)
    variables = {
        "params": jax.tree_util.tree_map(jnp.asarray, params),
        "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats),
    }
    rng = np.random.default_rng(0)
    xs = [rng.normal(size=(1, HW, HW, 3)).astype(np.float32) for _ in range(2)]

    with torch.no_grad():
        tx = [torch.from_numpy(x.transpose(0, 3, 1, 2)) for x in xs]
        feat_d = ref_model.detail(tx[0], 0, tx[1])
        *_, feat_s = ref_model.segment(tx[0], 0, tx[1])
        feat_head = ref_model.bga(feat_d, feat_s, 0)
        t_emb = ref_model.projHead(0, *feat_head)
        t_seg = ref_model.head(0, *feat_head)

    j_head, _ = model.apply(
        variables, [jnp.asarray(x) for x in xs], train=False,
        method=model.backbone,
    )
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(j_head[i]),
            feat_head[i].numpy().transpose(0, 2, 3, 1),
            atol=2e-4, rtol=2e-3,
        )
    # projection embedding (both sides L2-normalized in-module,
    # projection.py:51) and the unified ConvNorm head logits
    out = model.apply(variables, [jnp.asarray(x) for x in xs], train=False)
    for i in range(2):
        te = t_emb[i].numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(
            np.asarray(out["embed"][i]), te, atol=2e-4, rtol=2e-3)
        ts = t_seg[i].numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(
            np.asarray(out["seg"][i]), ts, atol=2e-4, rtol=2e-3)


@pytest.mark.slow
def test_finetune_from_pth_e2e(ref_model, tmp_path):
    from mds_tpu.engine.contrast_trainer import ContrastTrainer

    pth = tmp_path / "contrast.pth"
    torch.save(ref_model.state_dict(), str(pth))
    t = ContrastTrainer(my_configer(), work_dir=str(tmp_path))
    t.finetune_from(str(pth))
    # a trunk leaf took the torch value
    want = ref_model.state_dict()["detail.S1_1.conv.weight"].numpy()
    got = np.asarray(t.state.params["detail"]["S1_1"]["conv"]["kernel"])
    np.testing.assert_allclose(got, want.transpose(2, 3, 1, 0), atol=1e-6)
    # prototypes buffer landed in the trainer's sinkhorn state
    np.testing.assert_allclose(
        np.asarray(t.prototypes),
        ref_model.state_dict()["prototypes"].numpy(), atol=1e-6)
    rng = np.random.default_rng(1)
    b = {"ims": [rng.integers(0, 256, (1, HW, HW, 3)).astype(np.uint8)] * 2,
         "lbs": [rng.integers(0, 3, (1, HW, HW)).astype(np.uint8),
                 rng.integers(0, 4, (1, HW, HW)).astype(np.uint8)]}
    m = t.step(b, it=5)
    assert np.isfinite(m["loss"])
