"""Dataset readers: ann-file based, returning uint8 numpy samples.

Reference: lib/base_dataset.py:57-113 `BaseDataset` — reads an annotation file
with one `im_path,lb_path` pair per line, decodes image (RGB) and label,
applies the id→trainId LUT, then the train transform. Decode uses the native
library (cpp/mdspre.cpp libjpeg/libpng — the DALI/nvJPEG decode role,
lib/get_dataloader.py:557-560) when built, PIL otherwise (no cv2 in the
environment); normalization is deferred to the device; samples are
`dict(im=uint8 HxWx3, lb=uint8 HxW)`.
"""

from __future__ import annotations

import os.path as osp
from typing import Optional

import numpy as np

from mds_tpu.data import native as _native
from mds_tpu.data.labels import DatasetSpec, get_spec
from mds_tpu.registry import DATASETS

_NATIVE_DECODE = True


def set_native_decode(enabled: bool) -> None:
    """Toggle native (libjpeg/libpng) decode; PIL is used when off."""
    global _NATIVE_DECODE
    _NATIVE_DECODE = bool(enabled)


def _decode_native(path: str, channels: int) -> Optional[np.ndarray]:
    """Decode via cpp/mdspre.cpp when safe; None → caller uses PIL.

    Label decodes (channels=1) keep PIL semantics for palette / RGB /
    16-bit PNGs: libpng's palette→rgb→gray chain would silently remap the
    id values PIL reads verbatim (palette indices / raw 16-bit ids)."""
    if not (_NATIVE_DECODE and _native.available()):
        return None
    low = path.lower()
    is_jpg = low.endswith((".jpg", ".jpeg"))
    is_png = low.endswith(".png")
    if not (is_jpg or is_png):
        return None
    try:
        with open(path, "rb") as f:
            data = f.read()
    except OSError:
        return None
    if is_jpg:
        return _native.decode_jpeg(data) if channels == 3 else None
    # PNG IHDR: byte 24 = bit depth, byte 25 = color type (0 gray, 2 rgb,
    # 3 palette, 4 gray+alpha, 6 rgba)
    if len(data) <= 25:
        return None
    if channels == 1 and (data[24] == 16 or data[25] not in (0, 4)):
        return None
    return _native.decode_png(data, channels=channels)


class AnnFileDataset:
    """im,lb-per-line reader with LUT remap (lib/base_dataset.py:57-102)."""

    def __init__(
        self,
        dataroot: str,
        annpath: str,
        spec: DatasetSpec,
        trans_func=None,
        mode: str = "train",
    ):
        self.mode = mode
        self.trans_func = trans_func
        self.spec = spec
        self.lb_map = spec.lut_eval  # the reference forces eval LUT for both
        # modes in the GNN-era readers (lib/cityscapes_cv2.py:149 `mode='eval'`)
        self.n_cats = spec.n_cats
        self.img_paths, self.lb_paths = [], []
        with open(annpath, "r") as fr:
            for line in fr.read().splitlines():
                if not line.strip():
                    continue
                imgpth, lbpth = line.split(",")
                self.img_paths.append(osp.join(dataroot, imgpth))
                self.lb_paths.append(osp.join(dataroot, lbpth))
        assert len(self.img_paths) == len(self.lb_paths)

    def __len__(self) -> int:
        return len(self.img_paths)

    def get_image(self, impth: str) -> np.ndarray:
        out = _decode_native(impth, channels=3)
        if out is not None:
            return out
        from PIL import Image

        return np.asarray(Image.open(impth).convert("RGB"))

    def get_label(self, lbpth: str) -> np.ndarray:
        out = _decode_native(lbpth, channels=1)
        if out is not None:
            return out
        from PIL import Image

        return np.asarray(Image.open(lbpth)).astype(np.uint8)

    def read(self, idx: int, rng: Optional[np.random.Generator] = None) -> dict:
        label = self.get_label(self.lb_paths[idx])
        if not getattr(self.trans_func, "wants_raw_label", False):
            # transforms that fuse the LUT (NativeTransformationTrain with
            # set_label_lut) get the raw ids; everyone else the remapped map
            label = self.lb_map[label]
        img = self.get_image(self.img_paths[idx])
        im_lb = dict(im=img, lb=label)
        if self.trans_func is not None:
            im_lb = self.trans_func(im_lb, rng or np.random.default_rng())
        return im_lb

    # torch-Dataset-style alias
    __getitem__ = read


def _make_reader(spec_name: str):
    class _Reader(AnnFileDataset):
        def __init__(self, dataroot, annpath, trans_func=None, mode="train"):
            super().__init__(dataroot, annpath, get_spec(spec_name), trans_func, mode)

    _Reader.__name__ = spec_name.capitalize() + "Reader"
    _Reader.__qualname__ = _Reader.__name__
    return _Reader


# Per-dataset readers: parity with the reference's one-module-per-dataset zoo
# (lib/cityscapes_cv2.py:141, lib/CamVid_lb.py:103, lib/a2d2_lb_cv2.py:136,
#  lib/Mapi.py:413, lib/sunrgbd.py:63, lib/bdd100k_data.py:46,
#  lib/idd_cv2.py:153, lib/ade2016_data.py:330, lib/coco_data.py:296,
#  lib/WD2.py:65, lib/scannet.py:64).
CityScapes = DATASETS.register("CityScapes")(_make_reader("cityscapes"))
CamVid = DATASETS.register("CamVid")(_make_reader("camvid"))
A2D2Data = DATASETS.register("A2D2Data")(_make_reader("a2d2"))
Mapiv1 = DATASETS.register("Mapiv1")(_make_reader("mapillary"))
Sunrgbd = DATASETS.register("Sunrgbd")(_make_reader("sunrgbd"))
Bdd100k = DATASETS.register("Bdd100k")(_make_reader("bdd100k"))
Idd = DATASETS.register("Idd")(_make_reader("idd"))
Ade2016 = DATASETS.register("ade2016")(_make_reader("ade20k"))
CocoStuff = DATASETS.register("Coco_data")(_make_reader("cocostuff"))
WildDash2 = DATASETS.register("wd2")(_make_reader("wilddash2"))
ScanNet = DATASETS.register("scannet")(_make_reader("scannet"))
# KITTI semantics (Cityscapes labelIds — reference feeds
# datasets/kitti/training.txt to the CityScapes reader, configs/kitti.json)
Kitti = DATASETS.register("Kitti")(_make_reader("kitti"))
# PASCAL VOC 2012 aug (reference datasets/voc/train.txt — ids are trainIds)
Voc = DATASETS.register("Voc")(_make_reader("voc"))


@DATASETS.register("Synthetic")
class SyntheticDataset:
    """Deterministic fake dataset for tests and pipeline benchmarks.

    What the reference lacks (SURVEY.md §4): a CPU-runnable fake-data dataset.
    Generates structured images (blocks of constant color per class region) so
    that a model can actually fit it and mIoU accounting can be verified.
    """

    def __init__(
        self,
        dataroot=None,
        annpath=None,
        trans_func=None,
        mode: str = "train",
        n_cats: int = 8,
        size=(64, 64),
        length: int = 32,
        seed: int = 0,
        ignore_frac: float = 0.1,
    ):
        self.trans_func = trans_func
        self.mode = mode
        self.n_cats = n_cats
        self.size = tuple(size)
        self.length = length
        self.seed = seed
        self.ignore_frac = ignore_frac
        self.spec = None

    def __len__(self) -> int:
        return self.length

    def read(self, idx: int, rng: Optional[np.random.Generator] = None) -> dict:
        g = np.random.default_rng(self.seed * 100003 + idx)
        h, w = self.size
        # label = voronoi-ish blocks of classes
        n_blocks = 4
        lb = np.zeros((h, w), dtype=np.uint8)
        for _ in range(n_blocks):
            cls = g.integers(0, self.n_cats)
            y0, x0 = g.integers(0, h), g.integers(0, w)
            bh, bw = g.integers(h // 4, h), g.integers(w // 4, w)
            lb[y0 : y0 + bh, x0 : x0 + bw] = cls
        if self.ignore_frac > 0:
            mask = g.random((h, w)) < self.ignore_frac
            lb = np.where(mask, np.uint8(255), lb)
        # image = class color + noise (so the mapping is learnable)
        colors = np.random.default_rng(self.seed).integers(
            0, 256, size=(256, 3), dtype=np.int64
        )
        im = colors[lb] + g.normal(0, 8, size=(h, w, 3))
        im = np.clip(im, 0, 255).astype(np.uint8)
        im_lb = dict(im=im, lb=lb)
        if self.trans_func is not None:
            im_lb = self.trans_func(im_lb, rng or np.random.default_rng())
        return im_lb

    __getitem__ = read

# MSeg relabeled variants (reference *_mseg readers; e.g.
# lib/ade2016_data.py:370-385, lib/coco_data.py:341-354, lib/Mapi.py:216)
MapiMseg = DATASETS.register("Mapiv1_mseg")(_make_reader("mapillary_mseg"))
Ade2016Mseg = DATASETS.register("ade2016_mseg")(_make_reader("ade20k_mseg"))
CocoMseg = DATASETS.register("Coco_data_mseg")(_make_reader("cocostuff_mseg"))
