"""Concatenated multi-dataset readers and unified-label single readers.

Reference: lib/MultiSetReader.py:14-39 (`MultiSetReader` — concatenates N
readers, items come back as (sample, dataset_id)) and
lib/all_datasets_reader.py:589 (`AllDatasetsReader` — one ann file whose
labels are already in the unified space), plus the static cross-dataset
label translators lib/a2d2_to_cam.py / lib/city_to_cam.py (fixed trainId→
trainId maps for the CamVid-centric ablations).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from mds_tpu.data.base import AnnFileDataset
from mds_tpu.registry import DATASETS


@DATASETS.register("MultiSetReader")
class MultiSetReader:
    """Concatenate N readers; read() returns (sample, dataset_id)
    (lib/MultiSetReader.py:26-34)."""

    def __init__(self, readers: Sequence):
        self.readers = list(readers)
        self._offsets = np.cumsum([0] + [len(r) for r in self.readers])

    def __len__(self) -> int:
        return int(self._offsets[-1])

    def reader_index(self, idx: int) -> Tuple[int, int]:
        ds = int(np.searchsorted(self._offsets, idx, side="right") - 1)
        return ds, idx - int(self._offsets[ds])

    def read(self, idx: int, rng: Optional[np.random.Generator] = None):
        ds, local = self.reader_index(idx)
        sample = self.readers[ds].read(local, rng)
        sample = dict(sample)
        sample["dataset_id"] = ds
        return sample

    __getitem__ = read


@DATASETS.register("AllDatasetsReader")
class AllDatasetsReader(AnnFileDataset):
    """Single ann file over pre-unified labels (lib/all_datasets_reader.py:589):
    label files already carry unified ids, so no LUT is applied."""

    def __init__(self, dataroot, annpath, trans_func=None, mode="train",
                 n_cats: int = 0):
        # bypass spec LUT: identity map
        from mds_tpu.data.labels import DatasetSpec

        ident = np.arange(256, dtype=np.uint8)
        spec = DatasetSpec(
            name="unified", n_cats=n_cats or 255,
            mean=np.zeros(3, np.float32), std=np.ones(3, np.float32),
            lut_eval=ident, lut_train=ident,
            class_names=[str(i) for i in range(n_cats or 255)],
            palette=np.random.default_rng(123).integers(0, 256, (256, 3),
                                                        np.uint8),
        )
        super().__init__(dataroot, annpath, spec, trans_func, mode)


def build_translation_lut(pairs, default: int = 255) -> np.ndarray:
    """trainId→trainId LUT from (src, dst) pairs (the a2d2_to_cam /
    city_to_cam pattern)."""
    lut = np.full(256, default, np.uint8)
    lut[255] = 255
    for src, dst in pairs:
        lut[src] = dst
    return lut


# Cityscapes trainId → CamVid trainId (lib/city_to_cam.py Cityid_to_Camid):
# sky, building, pole, road, sidewalk, vegetation, sign, fence, car,
# pedestrian, bicycle map onto CamVid's 11; unmatched → ignore.
CITY_TO_CAMVID = build_translation_lut([
    (10, 0),   # sky
    (2, 1),    # building
    (5, 2),    # pole
    (0, 3),    # road
    (1, 4),    # sidewalk
    (8, 5),    # vegetation
    (7, 6),    # traffic sign
    (4, 7),    # fence
    (13, 8),   # car
    (11, 9),   # person → pedestrian
    (18, 10),  # bicycle
])


def translate_labels(labels: np.ndarray, lut: np.ndarray) -> np.ndarray:
    return lut[labels]
