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
