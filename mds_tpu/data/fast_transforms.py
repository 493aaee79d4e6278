"""Native one-pass train augmentation bundle.

Drop-in replacement for transforms.TransformationTrain that draws the same
random parameters (scale / crop offsets / flip / jitter rates — the
RandomResizedCrop + HFlip + ColorJitter semantics of lib/transform_cv2.py)
and executes them in a single native fused pass (cpp/mdspre.cpp), replacing
the reference's DALI fused pipeline (lib/get_dataloader.py:544-733).

Falls back to the numpy Compose when the native library is unavailable.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import numpy as np

from mds_tpu.data import native
from mds_tpu.data.transforms import TransformationTrain


class NativeTransformationTrain:
    def __init__(self, scales: Sequence[float], cropsize: Tuple[int, int],
                 min_side: Optional[int] = 1080,
                 brightness: float = 0.4, contrast: float = 0.4,
                 saturation: float = 0.4, flip_keep_p: float = 0.5,
                 lb_lut: Optional[np.ndarray] = None):
        self.scales = scales
        self.crop = tuple(cropsize)
        self.min_side = min_side
        self.b = [max(1 - brightness, 0.0), 1 + brightness]
        self.c = [max(1 - contrast, 0.0), 1 + contrast]
        self.s = [max(1 - saturation, 0.0), 1 + saturation]
        self.flip_keep_p = flip_keep_p
        self.lb_lut = (
            np.arange(256, dtype=np.uint8) if lb_lut is None else lb_lut
        )
        # when True the READER skips its numpy id→trainId LUT and this
        # bundle applies it inside the native pass (free — the fused kernel
        # already LUTs every output label); saves a full-res fancy-index
        # per sample (~5 ms at 1024×2048)
        self.wants_raw_label = lb_lut is not None
        self._fallback = TransformationTrain(scales, cropsize, min_side=min_side)

    def set_label_lut(self, lut: np.ndarray) -> None:
        """Fuse the dataset's id→trainId LUT into the native pass."""
        self.lb_lut = np.ascontiguousarray(lut.astype(np.uint8))
        self.wants_raw_label = True

    def __call__(self, im_lb: dict, rng: np.random.Generator) -> dict:
        if not native.available():
            if self.wants_raw_label:
                im_lb = dict(im=im_lb["im"], lb=self.lb_lut[im_lb["lb"]])
            return self._fallback(im_lb, rng)
        im, lb = im_lb["im"], im_lb["lb"]
        h, w = im.shape[:2]
        crop_h, crop_w = self.crop

        # RandomResizedCrop parameter draw (lib/transform_cv2.py:33-56)
        scale = rng.uniform(min(self.scales), max(self.scales))
        if self.min_side is not None and min(h, w) < self.min_side:
            scale = scale * (self.min_side / min(h, w))
        rh, rw = math.ceil(h * scale), math.ceil(w * scale)
        pad_h = (crop_h - rh) // 2 + 1 if rh < crop_h else 0
        pad_w = (crop_w - rw) // 2 + 1 if rw < crop_w else 0
        ph, pw = rh + 2 * pad_h, rw + 2 * pad_w
        off_y = int(rng.random() * (ph - crop_h)) if ph > crop_h else 0
        off_x = int(rng.random() * (pw - crop_w)) if pw > crop_w else 0
        # flip draw (keep when rand < p; transform_cv2.py:70)
        flip = not (rng.random() < self.flip_keep_p)
        br = rng.uniform(*self.b)
        ct = rng.uniform(*self.c)
        st = rng.uniform(*self.s)
        # ColorJitter saturation matmul uses rate directly (not 1±rate scale of
        # identity): the matrix is built from the drawn rate
        out_im, out_lb = native.fused_augment(
            im, lb, (rh, rw), (pad_h, pad_w), (off_y, off_x),
            (crop_h, crop_w), flip, br, ct, st, self.lb_lut,
        )
        return dict(im=out_im, lb=out_lb)
