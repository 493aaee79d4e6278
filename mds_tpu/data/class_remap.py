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

import jax
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


class ClassRemapOneHotLabel(ClassRemap):
    """One-hot / multi-prototype remapping (ref lib/class_remap.py:234-560).

    The contrast-era losses supervise with **multi-hot masks** over the
    unified space instead of single labels: uniquely-mapped dataset classes
    become one-hot rows, multi-mapped classes become multi-hot rows that
    `ContrastRemapping` sharpens into one-hot rows using prototype
    similarity (confidence threshold `contrast.update_sim_thresh` + an
    iteration-annealed per-class keep-ratio, ref :278-422).

    TPU-native redesign: the reference's per-class python loops with boolean
    fancy-indexing become 256-row LUTs + one masked argmax/sort — everything
    static-shape and jit-safe.
    """

    def __init__(self, configer):
        super().__init__(configer)
        g = lambda *k, d=None: configer.get(*k, default=d)
        self.update_sim_thresh = float(
            g("contrast", "update_sim_thresh", d=0.6)
        )
        self.network_stride = int(g("network", "stride", d=8))
        self.max_iter = int(g("lr", "max_iter", d=1))
        self.num_prototype = int(g("contrast", "num_prototype", d=1))
        U = self.num_unify_classes
        # LUTs over the 256 possible label bytes
        self._single_onehot: List[np.ndarray] = []  # unique-map one-hot rows
        self._multi_hot: List[np.ndarray] = []  # all mappings multi-hot
        self._multi_only_hot: List[np.ndarray] = []  # multi-mapped rows only
        self._is_multi: List[np.ndarray] = []
        for i in range(self.n_datasets):
            single = np.zeros((256, U), bool)
            multi = np.zeros((256, U), bool)
            multi_only = np.zeros((256, U), bool)
            is_multi = np.zeros(256, bool)
            for k, v in self.remapList[i].items():
                multi[k, v] = True
                if len(v) == 1:
                    single[k, v[0]] = True
                else:
                    is_multi[k] = True
                    multi_only[k, v] = True
            self._single_onehot.append(single)
            self._multi_hot.append(multi)
            self._multi_only_hot.append(multi_only)
            self._is_multi.append(is_multi)

    def SingleSegRemappingOneHot(self, labels, dataset_id: int):
        """(B,H,W,U) bool one-hot, unique mappings only (ref :239-258)."""
        labels = jnp.asarray(labels, jnp.int32)
        return jnp.asarray(self._single_onehot[dataset_id])[labels]

    def SegRemappingOneHot(self, labels, dataset_id: int):
        """(B,H,W,U) bool multi-hot over ALL admissible unified classes
        (ref ClassRemapOneHotLabel.SegRemapping :260-276)."""
        labels = jnp.asarray(labels, jnp.int32)
        return jnp.asarray(self._multi_hot[dataset_id])[labels]

    def KMeansRemapping(self, labels, dataset_id: int):
        """(cluster_mask bool, constraint multi-hot) for multi-mapped pixels
        (ref :424-444)."""
        labels = jnp.asarray(labels, jnp.int32)
        return (
            jnp.asarray(self._is_multi[dataset_id])[labels],
            jnp.asarray(self._multi_only_hot[dataset_id])[labels],
        )

    def ContrastRemapping(self, labels, embed, proto, dataset_id: int,
                          cur_iter: int = 0, sim=None):
        """→ (contrast_mask (B,h,w,U·P) bool, seg_mask (B,H,W,U) bool).

        Multi-mapped pixels take the prototype-similarity argmax within
        their admissible set when the max similarity clears
        update_sim_thresh AND the pixel is in the top `min(1.25·iter/
        max_iter, 1)` fraction of its assigned class (ref :278-422); the
        rest keep the full multi-hot. P = contrast.num_prototype expands
        each unified class into P prototype slots (MultiProtoRemapping,
        ref :446-560, via ExpendRemapByPrototypeNum :205)."""
        U = self.num_unify_classes
        P = self.num_prototype
        stride = self.network_stride
        labels = jnp.asarray(labels, jnp.int32)
        clb = labels[:, ::stride, ::stride]
        B, h, w = clb.shape

        single = jnp.asarray(self._single_onehot[dataset_id])  # (256,U)
        multi_only = jnp.asarray(self._multi_only_hot[dataset_id])
        is_multi = jnp.asarray(self._is_multi[dataset_id])[clb]  # (B,h,w)
        adm = multi_only[clb]  # (B,h,w,U) admissible set per pixel
        adm_p = jnp.repeat(adm, P, axis=-1)  # (B,h,w,U·P)

        if sim is None:
            embed = jax.lax.stop_gradient(jnp.asarray(embed, jnp.float32))
            proto = jax.lax.stop_gradient(jnp.asarray(proto, jnp.float32))
            sim = jnp.einsum("bhwd,ud->bhwu", embed, proto)  # (B,h,w,U·P)
        else:
            # caller-precomputed logits (the reference passes proto_logits
            # into MultiProtoRemapping, loss_cross_datasets.py:449-455)
            sim = jax.lax.stop_gradient(jnp.asarray(sim, jnp.float32))
        sim = jnp.where(adm_p, sim, -jnp.inf)
        max_sim = jnp.max(sim, axis=-1)
        assign = jnp.argmax(sim, axis=-1)  # slot in [0, U·P)
        confident = max_sim >= self.update_sim_thresh

        # annealed per-class keep-ratio: for each assigned slot keep the top
        # ratio fraction by similarity (ref top-k loop :391-404)
        # cur_iter may be a traced scalar (the jitted contrast step passes
        # the iteration in as data so the keep-ratio anneal doesn't recompile)
        ratio = jnp.minimum(
            1.25 * jnp.asarray(cur_iter, jnp.float32) / max(self.max_iter, 1),
            1.0,
        )
        flat_sim = max_sim.reshape(-1)
        flat_assign = assign.reshape(-1)
        valid = (confident & is_multi).reshape(-1)
        slot_mask = (
            jax.nn.one_hot(flat_assign, U * P, dtype=jnp.float32)
            * valid[:, None]
        )  # (N, U·P)
        counts = jnp.sum(slot_mask, axis=0)  # per-slot pixel counts
        keep_n = jnp.maximum(jnp.ceil(counts * ratio), 1.0)
        scores = jnp.where(slot_mask.T > 0, flat_sim[None, :], -jnp.inf)
        order = jnp.sort(scores, axis=1)[:, ::-1]  # desc per slot
        idx = jnp.clip(keep_n.astype(jnp.int32) - 1, 0, order.shape[1] - 1)
        thr = jnp.take_along_axis(order, idx[:, None], axis=1)[:, 0]
        keep = valid & (flat_sim >= thr[flat_assign])
        keep = keep.reshape(B, h, w)

        onehot_assign = jax.nn.one_hot(assign, U * P, dtype=jnp.bool_)
        single_p = jnp.repeat(single[clb], P, axis=-1)
        contrast_mask = jnp.where(
            is_multi[..., None],
            jnp.where(keep[..., None], onehot_assign, adm_p),
            single_p,
        )

        # seg mask at full resolution (nearest upsample + overrides)
        cm_u = jnp.any(
            contrast_mask.reshape(B, h, w, U, P), axis=-1
        )  # collapse prototype slots → (B,h,w,U)
        seg = jnp.repeat(jnp.repeat(cm_u, stride, axis=1), stride, axis=2)
        seg = seg[:, : labels.shape[1], : labels.shape[2]]
        seg = jnp.where(
            jnp.asarray(self._single_onehot[dataset_id]).any(-1)[labels][..., None],
            single[labels], seg,
        )
        full_multi = multi_only[labels]
        empty = ~jnp.any(seg, axis=-1)
        seg = jnp.where(
            (jnp.asarray(self._is_multi[dataset_id])[labels] & empty)[..., None],
            full_multi, seg,
        )
        seg = jnp.where(
            (labels == self.ignore_index)[..., None], False, seg
        )
        return contrast_mask, seg
