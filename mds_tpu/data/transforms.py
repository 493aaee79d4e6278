"""Host-side image/label augmentations (numpy + PIL).

Numpy reimplementation of the reference's cv2 CPU transforms
(lib/transform_cv2.py): RandomResizedCrop (:14-61, incl. the min-side<1080
upscale rule :36-37 and the pad-both-sides-by-half+1 rule :45-51),
RandomHorizontalFlip (:64-78), ColorJitter with brightness/contrast uint8 LUTs
(contrast centered at 74) and the saturation 3×3 matmul (:81-127), and the
÷255 + per-dataset mean/std normalize of ToTensor (:283-301) — except
normalization here stays NHWC and is deferred to the device (fused into the
jitted step) rather than done per-sample on the host.

Every transform takes and returns `dict(im=uint8 HxWx3 RGB, lb=uint8 HxW)`
and draws randomness from an explicit `np.random.Generator` so the pipeline
is reproducible and shardable.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import numpy as np

try:
    from PIL import Image

    _HAS_PIL = True
except ImportError:  # pragma: no cover
    _HAS_PIL = False


# ---------------------------------------------------------------- resizing
def resize_image(im: np.ndarray, size_hw: Tuple[int, int]) -> np.ndarray:
    """Bilinear uint8 image resize (PIL backend, half-pixel convention)."""
    h, w = size_hw
    if im.shape[:2] == (h, w):
        return im
    if _HAS_PIL:
        return np.asarray(Image.fromarray(im).resize((w, h), Image.BILINEAR))
    return _resize_bilinear_np(im, (h, w))


def _resize_bilinear_np(im: np.ndarray, size_hw: Tuple[int, int]) -> np.ndarray:
    h_out, w_out = size_hw
    h_in, w_in = im.shape[:2]
    ys = (np.arange(h_out) + 0.5) * h_in / h_out - 0.5
    xs = (np.arange(w_out) + 0.5) * w_in / w_out - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h_in - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w_in - 1)
    y1 = np.clip(y0 + 1, 0, h_in - 1)
    x1 = np.clip(x0 + 1, 0, w_in - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    p = im.astype(np.float32)
    top = p[y0][:, x0] * (1 - wx) + p[y0][:, x1] * wx
    bot = p[y1][:, x0] * (1 - wx) + p[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def resize_label(lb: np.ndarray, size_hw: Tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor label resize, half-pixel convention — exact for LUT ids."""
    h_out, w_out = size_hw
    h_in, w_in = lb.shape[:2]
    if (h_in, w_in) == (h_out, w_out):
        return lb
    ys = np.minimum(((np.arange(h_out) + 0.5) * h_in / h_out).astype(np.int64), h_in - 1)
    xs = np.minimum(((np.arange(w_out) + 0.5) * w_in / w_out).astype(np.int64), w_in - 1)
    return lb[ys][:, xs]


# ---------------------------------------------------------------- transforms
class RandomResizedCrop:
    """Random-scale resize + pad + random crop (lib/transform_cv2.py:14-61).

    scales: (lo, hi) uniform scale range. size: (crop_h, crop_w). Keeps the
    reference's quirks: the upscale-to-≥1080-min-side rule and padding both
    sides by (deficit//2 + 1) with 0 for image / 255 for label.
    """

    def __init__(self, scales: Sequence[float] = (0.5, 1.0), size=(384, 384),
                 min_side: Optional[int] = 1080):
        self.scales = scales
        self.size = tuple(size) if size is not None else None
        self.min_side = min_side

    def __call__(self, im_lb: dict, rng: np.random.Generator) -> dict:
        if self.size is None:
            return im_lb
        im, lb = im_lb["im"], im_lb["lb"]
        assert im.shape[:2] == lb.shape[:2]
        crop_h, crop_w = self.size
        h, w = im.shape[:2]

        scale = rng.uniform(min(self.scales), max(self.scales))
        if self.min_side is not None and min(h, w) < self.min_side:
            scale = scale * (self.min_side / min(h, w))
        im_h, im_w = math.ceil(h * scale), math.ceil(w * scale)
        im = resize_image(im, (im_h, im_w))
        lb = resize_label(lb, (im_h, im_w))
        if (im_h, im_w) == (crop_h, crop_w):
            return dict(im=im, lb=lb)

        pad_h = (crop_h - im_h) // 2 + 1 if im_h < crop_h else 0
        pad_w = (crop_w - im_w) // 2 + 1 if im_w < crop_w else 0
        if pad_h > 0 or pad_w > 0:
            im = np.pad(im, ((pad_h, pad_h), (pad_w, pad_w), (0, 0)))
            lb = np.pad(lb, ((pad_h, pad_h), (pad_w, pad_w)), constant_values=255)
        im_h, im_w = im.shape[:2]
        sh = int(rng.random() * (im_h - crop_h))
        sw = int(rng.random() * (im_w - crop_w))
        return dict(
            im=np.ascontiguousarray(im[sh : sh + crop_h, sw : sw + crop_w]),
            lb=np.ascontiguousarray(lb[sh : sh + crop_h, sw : sw + crop_w]),
        )


class RandomHorizontalFlip:
    """Flip with prob p (lib/transform_cv2.py:64-78 — note the reference flips
    when rand >= p, i.e. its `p` is the keep probability; we keep that)."""

    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(self, im_lb: dict, rng: np.random.Generator) -> dict:
        if rng.random() < self.p:
            return im_lb
        return dict(
            im=np.ascontiguousarray(im_lb["im"][:, ::-1]),
            lb=np.ascontiguousarray(im_lb["lb"][:, ::-1]),
        )


class ColorJitter:
    """Brightness/contrast uint8 LUTs + saturation matmul
    (lib/transform_cv2.py:81-127; contrast centered at 74)."""

    def __init__(self, brightness=None, contrast=None, saturation=None):
        def rng_of(v):
            if v is None or v < 0:
                return None
            return [max(1 - v, 0.0), 1 + v]

        self.brightness = rng_of(brightness)
        self.contrast = rng_of(contrast)
        self.saturation = rng_of(saturation)

    @staticmethod
    def adj_brightness(im: np.ndarray, rate: float) -> np.ndarray:
        table = (np.arange(256, dtype=np.float64) * rate).clip(0, 255).astype(np.uint8)
        return table[im]

    @staticmethod
    def adj_contrast(im: np.ndarray, rate: float) -> np.ndarray:
        table = (74 + (np.arange(256, dtype=np.float64) - 74) * rate).clip(0, 255).astype(np.uint8)
        return table[im]

    @staticmethod
    def adj_saturation(im: np.ndarray, rate: float) -> np.ndarray:
        M = np.float32(
            [
                [1 + 2 * rate, 1 - rate, 1 - rate],
                [1 - rate, 1 + 2 * rate, 1 - rate],
                [1 - rate, 1 - rate, 1 + 2 * rate],
            ]
        )
        shape = im.shape
        out = np.matmul(im.reshape(-1, 3).astype(np.float32), M).reshape(shape) / 3
        return np.clip(out, 0, 255).astype(np.uint8)

    def __call__(self, im_lb: dict, rng: np.random.Generator) -> dict:
        im, lb = im_lb["im"], im_lb["lb"]
        if self.brightness is not None:
            im = self.adj_brightness(im, rng.uniform(*self.brightness))
        if self.contrast is not None:
            im = self.adj_contrast(im, rng.uniform(*self.contrast))
        if self.saturation is not None:
            im = self.adj_saturation(im, rng.uniform(*self.saturation))
        return dict(im=im, lb=lb)


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, im_lb: dict, rng: np.random.Generator) -> dict:
        for t in self.transforms:
            im_lb = t(im_lb, rng)
        return im_lb


def TransformationTrain(scales, cropsize, min_side: Optional[int] = 1080) -> Compose:
    """Train bundle: RRC + flip + jitter(0.4,0.4,0.4)
    (reference: lib/get_dataloader.py:44-66)."""
    return Compose(
        [
            RandomResizedCrop(scales, cropsize, min_side=min_side),
            RandomHorizontalFlip(),
            ColorJitter(brightness=0.4, contrast=0.4, saturation=0.4),
        ]
    )


def TransformationVal() -> Compose:
    """Identity (reference: lib/get_dataloader.py:69-80)."""
    return Compose([])


def normalize_np(im: np.ndarray, mean: np.ndarray, std: np.ndarray) -> np.ndarray:
    """÷255 then (x-mean)/std, NHWC float32 (ToTensor semantics,
    lib/transform_cv2.py:283-301, minus the HWC→CHW permute — TPU wants NHWC)."""
    x = im.astype(np.float32) / 255.0
    return (x - mean.reshape(1, 1, 3)) / std.reshape(1, 1, 3)
