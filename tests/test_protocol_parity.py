"""Full-pipeline protocol parity vs the reference's OWN eval code.

VERDICT r2 next #3: upgrade "forward parity" to "protocol parity". These
tests import the reference's real MscEvalV0 / MscEvalV0_Contrast classes
from /root/reference/evaluate.py (cuda monkeypatched to CPU, unused heavy
imports stubbed), run them in torch on the reference's checked-in REAL
Cityscapes fixture frame (lib/test/test_leftImg8bit.png + labelIds) with a
randomized reference model, transfer the identical weights through
mds_tpu.deploy.torch_import, run OUR evaluator on the identical inputs, and
assert the resulting mIoU matches — covering resize conventions
(align_corners, round-32), label nearest-downsample, softmax accumulation,
flip, argmax and the confusion hist in one shot.

Reference: evaluate.py:43-99 (MscEvalV0), :100-192 (MscEvalV0_Contrast).
"""

import importlib.util
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_reference_parity import (  # noqa: E402
    DictConfiger,
    _stub,
    import_ref_package_module,
    load_flat_module,
    randomize_state,
)

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_evaluate():
    """Import /root/reference/evaluate.py with its dataloader/CLIP/CVCUDA
    imports stubbed (absent from this image; only the MscEval* classes are
    under test) and the REAL lib.models package (other golden tests use it)."""
    if "ref_evaluate" in sys.modules:
        return sys.modules["ref_evaluate"]
    import_ref_package_module("lib.models")  # real package, with timm stubs
    _stub("lib.get_dataloader", get_data_loader=None, get_city_loader=None,
          get_DALI_data_loader=None)
    _stub("lib.cvCudaDataLoader", getDataLoaderCVCUDA=None)
    _stub("lib.module.gen_graph_node_feature", gen_graph_node_feature=None)
    _stub("lib.city_to_cam", Cityid_to_Camid=None)
    _stub("lib.a2d2_to_cam", a2d2_to_Camid=None)
    _stub("lib.class_remap", ClassRemap=None)
    _stub("configs", set_cfg_from_file=None)
    _stub("lib.logger", setup_logger=None)
    _stub("tools")
    _stub("tools.configer", Configer=None)
    spec = importlib.util.spec_from_file_location(
        "ref_evaluate", f"{REF}/evaluate.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_evaluate"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(autouse=True)
def cpu_cuda(monkeypatch):
    """The reference eval code calls .cuda() unconditionally — no GPU here."""
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    monkeypatch.setattr(torch.nn.Module, "cuda", lambda self, *a, **k: self)


@pytest.fixture(scope="module")
def fixture_frame():
    """(im_u8 HxWx3, lb_trainid HxW) from the reference's real Cityscapes
    fixture, downscaled 4x so CPU torch forwards stay fast."""
    import os

    from PIL import Image

    from mds_tpu.data.labels import get_spec

    ref_im = f"{REF}/lib/test/test_leftImg8bit.png"
    ref_lb = f"{REF}/lib/test/test_labelIds.png"
    if not (os.path.exists(ref_im) and os.path.exists(ref_lb)):
        pytest.skip("reference fixtures absent")
    im = np.asarray(Image.open(ref_im).resize((512, 256), Image.BILINEAR))
    lb_ids = np.asarray(Image.open(ref_lb).resize((512, 256), Image.NEAREST))
    spec = get_spec("cityscapes")
    lb = np.asarray(spec.lut_eval)[lb_ids]
    assert ((np.unique(lb) < 19) | (np.unique(lb) == 255)).any()
    return im.astype(np.uint8), lb.astype(np.uint8), spec


def _torch_loader(im_u8, lb, mean, std):
    """One-batch iterable shaped like the reference's val loader output:
    (normalized NCHW float, label N1HW long)."""
    x = im_u8.astype(np.float32) / 255.0
    x = (x - mean.reshape(1, 1, 3)) / std.reshape(1, 1, 3)
    tim = torch.from_numpy(x.transpose(2, 0, 1))[None]
    tlb = torch.from_numpy(lb.astype(np.int64))[None, None]
    return [(tim, tlb)]


def _jax_loader(im_u8, lb):
    return [{"im": im_u8[None].astype(np.float32), "lb": lb[None]}]


def test_msf_protocol_matches_reference(ref_evaluate, fixture_frame):
    """MscEvalV0 multi-scale+flip on the real fixture frame: identical
    weights, identical inputs ⇒ identical mIoU (atol 5e-4)."""
    from mds_tpu.deploy.torch_import import bisenetv2_from_torch
    from mds_tpu.evaluation.evaluator import MscEvalV0, make_logits_fn
    from mds_tpu.models.bisenetv2 import BiSeNetV2

    im, lb, spec = fixture_frame
    ref_bise = load_flat_module("lib/models/bisenetv2.py", "ref_bisenetv2")
    torch.manual_seed(0)
    net = ref_bise.BiSeNetV2(19, "eval", 1).eval()
    sd = randomize_state(net, seed=11)

    class _Net(torch.nn.Module):
        """MscEvalV0 consumes net(im, dataset=i)[0] as a tensor; the raw
        reference BiSeNetV2 returns a per-dataset LIST at [0] — unwrap the
        requested dataset (the role eval_model's single-dataset cfg plays)."""

        def __init__(self, inner):
            super().__init__()
            self.inner = inner

        def forward(self, x, dataset=0):
            return (self.inner(x, dataset)[0][dataset],)

    scales = (0.5, 0.75)
    with torch.no_grad():
        want = ref_evaluate.MscEvalV0(scales, True)(
            _Net(net), _torch_loader(im, lb, spec.mean, spec.std), 19, 0
        )

    params, stats = bisenetv2_from_torch(sd, n_bn=1, aux=False)
    model = BiSeNetV2(n_classes=(19,), n_bn=1, aux=False)
    logits_fn = make_logits_fn(
        model, {"params": params, "batch_stats": stats}, spec.mean, spec.std
    )
    got = MscEvalV0(scales=scales, flip=True)(
        logits_fn, _jax_loader(im, lb), 19, 0
    )
    assert abs(got - want) < 5e-4, (got, want)


def test_contrast_protocol_matches_reference(ref_evaluate, fixture_frame):
    """MscEvalV0_Contrast (label nearest-downsample to the prototype model's
    1/4-res logits) on the real fixture frame, SemsegModel weights imported."""
    from mds_tpu.deploy.torch_import import semseg_from_torch
    from mds_tpu.evaluation.evaluator import (
        MscEvalV0Contrast,
        make_logits_fn,
    )
    from mds_tpu.models.semseg import SemsegModel

    im, lb, spec = fixture_frame
    ref_semseg = import_ref_package_module("lib.models.semseg")
    cfg = DictConfiger({
        "aux_mode": "eval",
        "n_datasets": 1,
        "loss": {"with_datasets_aux": False},
        "dataset1": {"n_cats": 19},
        "GNN": {"output_feat_dim": 32, "unify_ratio": 1.0},
    })
    torch.manual_seed(0)
    net = ref_semseg.SemsegModel(cfg).eval()
    net.aux_mode = "eval"
    sd = randomize_state(net, seed=13)
    # non-degenerate bipartite graph: random rows would be fine too, but the
    # reference initializes from set_bipartite_graphs; use a randomized one
    with torch.no_grad():
        g = torch.rand(19, net.max_num_unify_class)
        net.bipartite_graphs[0].copy_(g)
        sd = net.state_dict()

    with torch.no_grad():
        want = ref_evaluate.MscEvalV0_Contrast(cfg, (0.5,), False)(
            net, _torch_loader(im, lb, spec.mean, spec.std), 19, 0
        )

    params, stats, buffers = semseg_from_torch(sd)
    model = SemsegModel(datasets_cats=(19,), output_feat_dim=32,
                        unify_ratio=1.0, with_datasets_aux=False)
    logits_fn = make_logits_fn(
        model,
        {"params": params, "batch_stats": stats, "buffers": buffers},
        spec.mean, spec.std,
    )
    got = MscEvalV0Contrast(scales=(0.5,), flip=False)(
        logits_fn, _jax_loader(im, lb), 19, 0
    )
    assert abs(got - want) < 5e-4, (got, want)


def test_crop_protocol_matches_reference(ref_evaluate, fixture_frame):
    """MscEvalCrop (the ssc/mscf BASELINE columns): pad-to-crop, 2/3-stride
    sliding windows, flip with the reference's exp(prob+prob) quirk
    (evaluate.py:683-688), multi-scale resize-back accumulation — identical
    weights + inputs ⇒ identical mIoU (atol 5e-4). Ours batches all windows
    of a scale into ONE jitted call (evaluator.py MscEvalCrop); this pins
    that rewrite to the reference's per-window loop."""
    from mds_tpu.deploy.torch_import import bisenetv2_from_torch
    from mds_tpu.evaluation.evaluator import MscEvalCrop, make_logits_fn
    from mds_tpu.models.bisenetv2 import BiSeNetV2

    im, lb, spec = fixture_frame
    ref_bise = load_flat_module("lib/models/bisenetv2.py", "ref_bisenetv2")
    torch.manual_seed(0)
    net = ref_bise.BiSeNetV2(19, "eval", 1).eval()
    sd = randomize_state(net, seed=17)

    class _Net(torch.nn.Module):
        def __init__(self, inner):
            super().__init__()
            self.inner = inner

        def forward(self, x, dataset=0):
            return (self.inner(x, dataset)[0][dataset],)

    scales = (0.5, 0.75)
    with torch.no_grad():
        want = ref_evaluate.MscEvalCrop(
            cropsize=(128, 128), cropstride=2.0 / 3, flip=True,
            scales=scales, lb_ignore=255,
        )(_Net(net), _torch_loader(im, lb, spec.mean, spec.std), 19)

    params, stats = bisenetv2_from_torch(sd, n_bn=1, aux=False)
    model = BiSeNetV2(n_classes=(19,), n_bn=1, aux=False)
    logits_fn = make_logits_fn(
        model, {"params": params, "batch_stats": stats}, spec.mean, spec.std
    )
    got = MscEvalCrop(
        cropsize=(128, 128), cropstride=2.0 / 3, flip=True, scales=scales
    )(logits_fn, _jax_loader(im, lb), 19, 0)
    assert abs(got - want) < 5e-4, (got, want)
