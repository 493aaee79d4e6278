"""Native preprocessing library tests (builds cpp/libmdspre.so on demand)."""

import io

import numpy as np
import pytest
from PIL import Image

from mds_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def _jpeg_bytes(im):
    buf = io.BytesIO()
    Image.fromarray(im).save(buf, format="JPEG", quality=95)
    return buf.getvalue()


def _png_bytes(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def test_decode_jpeg_matches_pil():
    rng = np.random.default_rng(0)
    im = rng.integers(0, 256, (40, 60, 3)).astype(np.uint8)
    data = _jpeg_bytes(im)
    got = native.decode_jpeg(data)
    want = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert got.shape == want.shape
    # JPEG decoders may differ by ±1 in IDCT rounding
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_decode_png_label_exact():
    rng = np.random.default_rng(1)
    lb = rng.integers(0, 34, (30, 45)).astype(np.uint8)
    got = native.decode_png(_png_bytes(lb), channels=1)
    np.testing.assert_array_equal(got, lb)


def test_decode_png_rgb():
    rng = np.random.default_rng(2)
    im = rng.integers(0, 256, (20, 25, 3)).astype(np.uint8)
    got = native.decode_png(_png_bytes(im), channels=3)
    np.testing.assert_array_equal(got, im)


def test_resize_nearest_matches_numpy():
    from mds_tpu.data.transforms import resize_label

    rng = np.random.default_rng(3)
    lb = rng.integers(0, 19, (33, 47)).astype(np.uint8)
    got = native.resize_nearest(lb, 66, 94)
    want = resize_label(lb, (66, 94))
    np.testing.assert_array_equal(got.squeeze(), want)


def test_resize_bilinear_close_to_reference():
    from mds_tpu.data.transforms import _resize_bilinear_np

    rng = np.random.default_rng(4)
    im = rng.integers(0, 256, (32, 48, 3)).astype(np.uint8)
    got = native.resize_bilinear(im, 64, 80)
    want = _resize_bilinear_np(im, (64, 80))
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_fused_augment_identity_params():
    """With scale=1, no pad, no flip, unit jitter → crop of LUT-remapped input."""
    rng = np.random.default_rng(5)
    h, w = 40, 50
    im = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    lb = rng.integers(0, 19, (h, w)).astype(np.uint8)
    lut = np.arange(256, dtype=np.uint8)
    lut[5] = 99
    out_im, out_lb = native.fused_augment(
        im, lb, resize_hw=(h, w), pad_hw=(0, 0), crop_off=(4, 6),
        crop_hw=(16, 20), flip=False, brightness=1.0, contrast=1.0,
        saturation=1.0, lb_lut=lut,
    )
    np.testing.assert_array_equal(out_lb, lut[lb[4:20, 6:26]])
    # saturation=1 → identity matmul; brightness/contrast=1 → identity LUT
    np.testing.assert_array_equal(out_im, im[4:20, 6:26])


def test_fused_augment_flip_and_pad():
    rng = np.random.default_rng(6)
    h, w = 10, 12
    im = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    lb = rng.integers(0, 5, (h, w)).astype(np.uint8)
    lut = np.arange(256, dtype=np.uint8)
    out_im, out_lb = native.fused_augment(
        im, lb, resize_hw=(h, w), pad_hw=(3, 3), crop_off=(0, 0),
        crop_hw=(16, 18), flip=True, brightness=1.0, contrast=1.0,
        saturation=1.0, lb_lut=lut,
    )
    # padded border is ignore for labels, 0 for image
    assert (out_lb[0, :] == 255).all()
    assert (out_im[0, :, :] == 0).all()
    # interior flipped: padded x index 3..14 maps to source, flipped
    np.testing.assert_array_equal(out_lb[3:13, 3:15][:, ::-1], lb)


def test_fused_augment_jitter_luts():
    from mds_tpu.data.transforms import ColorJitter

    rng = np.random.default_rng(7)
    im = rng.integers(0, 256, (8, 8, 3)).astype(np.uint8)
    lb = np.zeros((8, 8), np.uint8)
    lut = np.arange(256, dtype=np.uint8)
    out_im, _ = native.fused_augment(
        im, lb, (8, 8), (0, 0), (0, 0), (8, 8), False,
        brightness=1.3, contrast=0.8, saturation=1.0, lb_lut=lut,
    )
    want = ColorJitter.adj_contrast(ColorJitter.adj_brightness(im, 1.3), 0.8)
    np.testing.assert_array_equal(out_im, want)


def test_native_bundle_matches_numpy_bundle_stats():
    """Same RNG stream → native and numpy bundles produce near-identical crops."""
    from mds_tpu.data.fast_transforms import NativeTransformationTrain
    from mds_tpu.data.transforms import TransformationTrain

    rng_a = np.random.default_rng(42)
    rng_b = np.random.default_rng(42)
    g = np.random.default_rng(0)
    im = g.integers(0, 256, (100, 140, 3)).astype(np.uint8)
    lb = g.integers(0, 19, (100, 140)).astype(np.uint8)

    nat = NativeTransformationTrain([0.5, 1.5], (64, 64), min_side=None)
    ref = TransformationTrain([0.5, 1.5], (64, 64), min_side=None)
    a = nat(dict(im=im, lb=lb), rng_a)
    b = ref(dict(im=im, lb=lb), rng_b)
    assert a["im"].shape == b["im"].shape == (64, 64, 3)
    # the random parameter draws consume the same stream in the same order, so
    # geometry matches exactly; pixel values may differ by resampling backend
    np.testing.assert_array_equal(a["lb"] == 255, b["lb"] == 255)
    agree = (a["lb"] == b["lb"]).mean()
    assert agree > 0.97, agree  # nearest-resize edges may differ slightly
    diff = np.abs(a["im"].astype(int) - b["im"].astype(int))
    assert np.median(diff) <= 2


def _write_pair(tmpdir, im, lb, palette=False):
    impth = str(tmpdir / "im.jpg")
    lbpth = str(tmpdir / "lb.png")
    Image.fromarray(im).save(impth, quality=95)
    if palette:
        p = Image.fromarray(lb, mode="P")
        p.putpalette([v for i in range(256) for v in (i, 255 - i, i // 2)])
        p.save(lbpth)
    else:
        Image.fromarray(lb).save(lbpth)
    return impth, lbpth


def test_reader_native_decode_parity(tmp_path):
    """AnnFileDataset decodes via cpp/mdspre.cpp with PIL semantics."""
    from mds_tpu.data.base import CityScapes, set_native_decode

    rng = np.random.default_rng(8)
    im = rng.integers(0, 256, (48, 64, 3)).astype(np.uint8)
    lb = rng.integers(0, 34, (48, 64)).astype(np.uint8)
    impth, lbpth = _write_pair(tmp_path, im, lb)
    ann = tmp_path / "ann.txt"
    ann.write_text("im.jpg,lb.png")
    ds = CityScapes(str(tmp_path), str(ann), trans_func=None, mode="train")
    set_native_decode(True)
    a = ds.read(0)
    set_native_decode(False)
    b = ds.read(0)
    set_native_decode(True)
    np.testing.assert_array_equal(a["lb"], b["lb"])  # PNG labels exact
    assert np.abs(a["im"].astype(int) - b["im"].astype(int)).max() <= 1  # JPEG IDCT


def test_reader_palette_label_falls_back_to_pil(tmp_path):
    """Palette-PNG labels keep PIL's palette-index semantics (no rgb→gray)."""
    from mds_tpu.data.base import CityScapes, set_native_decode

    rng = np.random.default_rng(9)
    im = rng.integers(0, 256, (32, 40, 3)).astype(np.uint8)
    lb = rng.integers(0, 30, (32, 40)).astype(np.uint8)
    impth, lbpth = _write_pair(tmp_path, im, lb, palette=True)
    ann = tmp_path / "ann.txt"
    ann.write_text("im.jpg,lb.png")
    ds = CityScapes(str(tmp_path), str(ann), trans_func=None, mode="train")
    set_native_decode(True)
    got = ds.get_label(lbpth)
    np.testing.assert_array_equal(got, lb)  # palette INDICES, not gray values


def test_fused_label_lut_matches_reader_lut(tmp_path):
    """set_label_lut + raw-label reader == reader-side numpy LUT."""
    from mds_tpu.data.base import CityScapes
    from mds_tpu.data.fast_transforms import NativeTransformationTrain

    rng = np.random.default_rng(10)
    im = rng.integers(0, 256, (64, 80, 3)).astype(np.uint8)
    lb = rng.integers(0, 34, (64, 80)).astype(np.uint8)
    _write_pair(tmp_path, im, lb)
    ann = tmp_path / "ann.txt"
    ann.write_text("im.jpg,lb.png")

    fused = NativeTransformationTrain([0.5, 1.5], (48, 48), min_side=None)
    plain = NativeTransformationTrain([0.5, 1.5], (48, 48), min_side=None)
    ds_fused = CityScapes(str(tmp_path), str(ann), trans_func=fused)
    fused.set_label_lut(ds_fused.lb_map)
    assert fused.wants_raw_label and not plain.wants_raw_label
    ds_plain = CityScapes(str(tmp_path), str(ann), trans_func=plain)
    a = ds_fused.read(0, np.random.default_rng(3))
    b = ds_plain.read(0, np.random.default_rng(3))
    np.testing.assert_array_equal(a["lb"], b["lb"])
    np.testing.assert_array_equal(a["im"], b["im"])


def test_loader_factory_uses_native_pipeline(tmp_path):
    """get_data_loader wires NativeTransformationTrain + fused per-dataset LUT."""
    from mds_tpu.config import Configer
    from mds_tpu.data.fast_transforms import NativeTransformationTrain
    from mds_tpu.data.loader import get_data_loader

    rng = np.random.default_rng(11)
    im = rng.integers(0, 256, (40, 56, 3)).astype(np.uint8)
    lb = rng.integers(0, 34, (40, 56)).astype(np.uint8)
    _write_pair(tmp_path, im, lb)
    ann = tmp_path / "ann.txt"
    ann.write_text("im.jpg,lb.png")
    cfg = Configer(configs={
        "n_datasets": 1,
        "train": {"scales": [0.75, 1.0], "cropsize": [32, 32],
                  "min_side": None, "num_workers": 2},
        "dataset1": {"n_cats": 19, "data_reader": "CityScapes",
                     "im_root": str(tmp_path), "train_im_anns": str(ann),
                     "ims_per_gpu": 2},
    })
    loader = get_data_loader(cfg, "train")
    try:
        ds = loader.datasets[0]
        assert isinstance(ds.trans_func, NativeTransformationTrain)
        assert ds.trans_func.wants_raw_label
        np.testing.assert_array_equal(ds.trans_func.lb_lut, ds.lb_map)
        batch = next(loader)
        assert batch.ims[0].shape == (2, 32, 32, 3)
        valid = batch.lbs[0][batch.lbs[0] != 255]
        assert valid.size == 0 or valid.max() < 19
    finally:
        loader.close()
