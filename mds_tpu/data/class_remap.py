"""Config-driven per-dataset class → unified-class remapping.

Reference: lib/class_remap.py (596 LoC). The config carries `class_remap{i}`
dicts mapping each dataset class id to one or more unified class ids
(configs/*.json). This module reproduces:

  * SegRemapping (:52-67) — k masked label maps, one per mapping alternative
    (ignore elsewhere);
  * SingleSegRemapping (:33-50) — only uniquely-mapped classes;
  * IsSingleRemaplb (:26-31);
  * GetEqWeightMask (:126-147) — (B,H,W,U) 0/1 multi-hot target masks;
  * ReverseSegRemap (:189-204) — unified predictions → dataset label space;
  * remap matrices (:176-183) and per-class reweighting (:210-230).

All remaps are LUT gathers (jit-friendly): the per-alternative maps are
256-entry uint8 LUTs built once from the config.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np


class ClassRemap:
    def __init__(self, configer):
        self.configer = configer
        self.ignore_index = int(configer.get("loss", "ignore_index", default=255))
        self.num_unify_classes = int(configer.get("num_unify_classes", default=0))
        self.n_datasets = configer.n_datasets
        self.reweight = bool(configer.get("loss", "reweight", default=False))
        self.remapList: List[Dict[int, List[int]]] = []
        self.maxMapNums: List[int] = []
        self.class_weight: List[np.ndarray] = []
        self._unpack()

    def _unpack(self):
        for i in range(1, self.n_datasets + 1):
            raw = self.configer.get(f"class_remap{i}")
            if raw is None:
                raise KeyError(f"class_remap{i} missing from config")
            remap: Dict[int, List[int]] = {}
            class_id = 0
            max_map = 0
            while str(class_id) in raw:
                remap[class_id] = list(raw[str(class_id)])
                max_map = max(max_map, len(remap[class_id]))
                class_id += 1
            self.remapList.append(remap)
            self.maxMapNums.append(max_map)
        if self.reweight:
            for i in range(1, self.n_datasets + 1):
                w = self.configer.get(f"class_weight{i}")
                self.class_weight.append(
                    np.asarray([w[str(j)] for j in range(self.num_unify_classes)],
                               np.float32)
                )
        # per-alternative LUTs: lut[alt][class_id] = unified id or ignore
        self._luts: List[np.ndarray] = []
        self._single_luts: List[np.ndarray] = []
        self._matrices: List[np.ndarray] = []
        for i in range(self.n_datasets):
            n_alt = self.maxMapNums[i]
            lut = np.full((max(n_alt, 1), 256), self.ignore_index, np.int32)
            single = np.full(256, self.ignore_index, np.int32)
            n_cats = self.configer.n_cats(i)
            mat = np.zeros((n_cats, self.num_unify_classes), np.float32)
            for k, v in self.remapList[i].items():
                for a, uid in enumerate(v):
                    lut[a, k] = uid
                if len(v) == 1:
                    single[k] = v[0]
                if k < n_cats:
                    mat[k, v] = 1.0
            self._luts.append(lut)
            self._single_luts.append(single)
            self._matrices.append(mat)

    # ----------------------------------------------------------------- API
    def IsSingleRemaplb(self, lb: int) -> bool:
        for remap in self.remapList:
            for v in remap.values():
                if len(v) == 1 and v[0] == lb:
                    return True
        return False

    def SegRemapping(self, labels, dataset_id: int):
        """k masked maps, one per mapping alternative (ref :52-67)."""
        labels = jnp.asarray(labels, jnp.int32)
        lut = jnp.asarray(self._luts[dataset_id])
        return [lut[a][labels] for a in range(self.maxMapNums[dataset_id])]

    def SingleSegRemapping(self, labels, dataset_id: int):
        """Unique mappings only (ref :33-50)."""
        labels = jnp.asarray(labels, jnp.int32)
        return jnp.asarray(self._single_luts[dataset_id])[labels]

    def GetEqWeightMask(self, labels, dataset_id: int):
        """(B,H,W,U) multi-hot mask of admissible unified classes (ref :126)."""
        labels = jnp.asarray(labels, jnp.int32)
        table = np.zeros((256, self.num_unify_classes), np.float32)
        for k, v in self.remapList[dataset_id].items():
            table[k, v] = 1.0
        return jnp.asarray(table)[labels]

    def ReverseSegRemap(self, preds, dataset_id: int):
        """Unified prediction ids → dataset label ids (ref :189-204)."""
        preds = jnp.asarray(preds, jnp.int32)
        rev = np.zeros(self.num_unify_classes, np.int32)
        for k, v in self.remapList[dataset_id].items():
            if k >= self.configer.n_cats(dataset_id):
                break
            for lb in v:
                if lb < self.num_unify_classes:
                    rev[lb] = k
        return jnp.asarray(rev)[preds]

    def getAnyClassRemap(self, lb_id: int, dataset_id: int):
        return self.remapList[dataset_id][lb_id]

    def getRemapMatrix(self, dataset_id: int):
        return jnp.asarray(self._matrices[dataset_id])

    def getReweightMatrix(self, lb, dataset_id: int):
        """Per-pixel weights for uniquely-mapped reweighted classes (ref :222)."""
        lut = np.ones(256, np.float32)
        for k, v in self.remapList[dataset_id].items():
            if len(v) == 1 and self.class_weight[dataset_id][v[0]] != 1:
                lut[k] = self.class_weight[dataset_id][v[0]]
        return jnp.asarray(lut)[jnp.asarray(lb, jnp.int32)]
