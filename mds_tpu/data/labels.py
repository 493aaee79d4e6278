"""Per-dataset label specs: id→trainId LUTs, class names, palettes, stats.

The tables in `label_specs.json` were extracted from the reference's reader
modules (see tools/gen_label_specs.py for the file:line provenance). This
module turns them into:

  * eval LUT  — 256-entry uint8 id→trainId map (reference builds it in each
    reader __init__, e.g. lib/cityscapes_cv2.py:156-165);
  * train LUT — same but entries with trainId==255 are remapped to `n_cats`
    when the reader runs in train mode with an extra "ignore" class
    (lib/cityscapes_cv2.py:160-164, lib/bdd100k_data.py:64-68);
  * class names per trainId and a color palette for demo rendering.

Negative ids (Cityscapes' license-plate id=-1) replicate the reference's
uint8-wraparound behavior: `lb_map[-1] = trainId` writes index 255.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional

import numpy as np

_SPEC_PATH = os.path.join(os.path.dirname(__file__), "label_specs.json")
_CACHE: Optional[Dict[str, dict]] = None


def _raw_specs() -> Dict[str, dict]:
    global _CACHE
    if _CACHE is None:
        with open(_SPEC_PATH, "r") as f:
            _CACHE = json.load(f)
    return _CACHE


@dataclasses.dataclass(frozen=True)
class DatasetSpec:
    name: str
    n_cats: int
    mean: np.ndarray  # (3,) rgb in [0,1]
    std: np.ndarray  # (3,)
    lut_eval: np.ndarray  # (256,) uint8
    lut_train: np.ndarray  # (256,) uint8 (255→n_cats variant)
    class_names: List[str]  # indexed by trainId, length n_cats
    palette: np.ndarray  # (256, 3) uint8 color per trainId

    @property
    def ignore_label(self) -> int:
        return 255


def _build_spec(name: str, raw: dict) -> DatasetSpec:
    n_cats = int(raw["n_cats"])
    lut_eval = np.arange(256, dtype=np.uint8)
    lut_train = np.arange(256, dtype=np.uint8)
    names = [""] * n_cats
    rng = np.random.default_rng(123)
    palette = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    for el in raw["labels_info"]:
        idx = el["id"]  # may be -1 → wraps to 255 like the reference
        tid = el["trainId"]
        # trainId may be -1 (Cityscapes license plate) — wrap like torch uint8
        lut_eval[idx] = np.uint8(tid & 0xFF)
        lut_train[idx] = np.uint8(n_cats if tid in (255, -1) else tid & 0xFF)
        if 0 <= tid < n_cats:
            if not names[tid]:
                names[tid] = el["name"]
            if el.get("color") is not None:
                palette[tid] = np.asarray(el["color"], dtype=np.uint8)
    return DatasetSpec(
        name=name,
        n_cats=n_cats,
        mean=np.asarray(raw["mean"], dtype=np.float32),
        std=np.asarray(raw["std"], dtype=np.float32),
        lut_eval=lut_eval,
        lut_train=lut_train,
        class_names=names,
        palette=palette,
    )


def load_specs() -> Dict[str, DatasetSpec]:
    return {k: _build_spec(k, v) for k, v in _raw_specs().items()}


def get_spec(name: str) -> DatasetSpec:
    raw = _raw_specs()
    if name not in raw:
        raise KeyError(f"unknown dataset {name!r}; have {sorted(raw)}")
    return _build_spec(name, raw[name])


def apply_lut(label: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """Vectorized id→trainId remap (reference: lib/base_dataset.py:81-83)."""
    return lut[label]
