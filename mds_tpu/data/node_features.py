"""Graph node features per dataset class.

Reference: lib/module/gen_graph_node_feature.py — CLIP ViT-B/32 **text**
embedding of "a photo of {label}." (:408-422) concatenated with averaged CLIP
**image** embeddings of class-cropped training pixels (:192-264), cached to
`graph_node_features_{reader}.pt` (:424-458); nfeat = 512+512 = 1024.

This environment has zero egress, so CLIP weights may be absent. Resolution
order:
  1. a cached feature file (``.npy`` or torch ``.pt``) if configured/present;
  2. local CLIP weights via transformers, if available (same prompt text);
  3. a deterministic fallback: unit-normalized features seeded by the class
     name string — stable across runs, so training/tests are reproducible and
     real CLIP features can be dropped in later without code changes.
"""

from __future__ import annotations

import hashlib
import os
from typing import List, Optional, Sequence

import numpy as np


def _hash_feature(name: str, dim: int) -> np.ndarray:
    seed = int.from_bytes(hashlib.sha256(name.encode()).digest()[:8], "little")
    v = np.random.default_rng(seed).normal(0, 1, dim).astype(np.float32)
    return v / np.linalg.norm(v)


def _clip_text_features(names: Sequence[str], model_name: str) -> Optional[np.ndarray]:
    try:
        import torch
        from transformers import CLIPModel, CLIPProcessor

        model = CLIPModel.from_pretrained(model_name, local_files_only=True)
        proc = CLIPProcessor.from_pretrained(model_name, local_files_only=True)
    except Exception:
        return None
    prompts = [f"a photo of {n}." for n in names]  # gen_graph_node_feature.py:412
    with torch.no_grad():
        inputs = proc(text=prompts, return_tensors="pt", padding=True)
        feats = model.get_text_features(**inputs)
    return feats.numpy().astype(np.float32)


def gen_graph_node_features(
    configer=None,
    class_names: Optional[List[List[str]]] = None,
    nfeat: int = 1024,
    cache_path: Optional[str] = None,
    clip_model: str = "openai/clip-vit-base-patch32",
) -> np.ndarray:
    """(Σ n_cats, nfeat) node feature matrix in dataset order."""
    if cache_path is None and configer is not None:
        cache_path = configer.get("GNN", "node_features_path", default=None)
    if cache_path and os.path.exists(cache_path):
        if cache_path.endswith(".npy"):
            return np.load(cache_path).astype(np.float32)
        import torch

        return torch.load(cache_path, map_location="cpu").numpy().astype(np.float32)

    if class_names is None:
        assert configer is not None
        from mds_tpu.data.labels import get_spec

        class_names = []
        for i in range(configer.n_datasets):
            spec_name = configer.dataset_cfg(i).get("spec")
            n_cats = configer.n_cats(i)
            if spec_name:
                names = get_spec(spec_name).class_names
            else:
                names = [f"dataset{i}_class{j}" for j in range(n_cats)]
            class_names.append(list(names)[:n_cats])

    flat = [n for ds in class_names for n in ds]
    text = _clip_text_features(flat, clip_model)
    if text is not None:
        # image half: averaged CLIP embeddings of class-cropped training
        # pixels when both CLIP weights and datasets are present
        # (gen_graph_node_feature.py:192-330); mirror of the text half
        # otherwise — keeping the 1024-d text‖image layout of the cache
        image = None
        if configer is not None:
            image = _clip_image_features_for_config(configer, clip_model)
        if image is None:
            image = text
        out = np.concatenate([text, image], axis=1)[:, :nfeat]
        if out.shape[1] < nfeat:
            out = np.pad(out, ((0, 0), (0, nfeat - out.shape[1])))
        return out.astype(np.float32)

    return np.stack([_hash_feature(n, nfeat) for n in flat])


def crop_image_by_label_value(img: np.ndarray, label: np.ndarray,
                              label_value: int) -> np.ndarray:
    """Class-crop for CLIP image-feature mining
    (gen_graph_node_feature.py:192-264): binarize the class mask, 3×3
    morphological close, take the largest connected component's bbox, crop,
    gray(128)-fill pixels outside the 5×5-dilated mask, pad to square."""
    from scipy import ndimage

    binary = (label == label_value).astype(np.uint8)
    closed = ndimage.binary_closing(binary, structure=np.ones((3, 3)))
    lbl, n = ndimage.label(closed)
    if n == 0:
        return np.zeros_like(img)
    sizes = ndimage.sum(closed, lbl, index=np.arange(1, n + 1))
    # largest component by bbox area (reference iterates contour bboxes)
    best, best_area = None, -1
    for sl in ndimage.find_objects(lbl):
        if sl is None:
            continue
        area = (sl[0].stop - sl[0].start) * (sl[1].stop - sl[1].start)
        if area > best_area:
            best, best_area = sl, area
    del sizes
    y0, y1 = best[0].start, best[0].stop
    x0, x1 = best[1].start, best[1].stop
    cropped = np.array(img[y0:y1, x0:x1, :])
    roi = binary[y0:y1, x0:x1].astype(bool)
    dilated = ndimage.binary_dilation(roi, structure=np.ones((5, 5)))
    cropped[~dilated] = 128
    h, w = cropped.shape[:2]
    if h < w:
        top = (w - h) // 2
        cropped = np.pad(cropped, ((top, w - h - top), (0, 0), (0, 0)),
                         constant_values=128)
    elif h > w:
        left = (h - w) // 2
        cropped = np.pad(cropped, ((0, 0), (left, h - w - left), (0, 0)),
                         constant_values=128)
    return cropped


def _load_clip(model_name: str):
    """(model, processor) or None when CLIP weights are absent (zero-egress).
    Loaded ONCE per mining pass — the reference keeps one clip.load too
    (gen_image_features, ref :272-273)."""
    try:
        from transformers import CLIPModel, CLIPProcessor

        model = CLIPModel.from_pretrained(model_name, local_files_only=True)
        proc = CLIPProcessor.from_pretrained(model_name, local_files_only=True)
        return model, proc
    except Exception:
        return None


def clip_image_features_from_crops(crops, model_name: str,
                                   clip=None) -> Optional[np.ndarray]:
    """Mean CLIP image embedding of a list of HWC uint8 crops
    (gen_image_features, ref :264-311). None if CLIP weights absent.
    Pass `clip=(model, processor)` to reuse an already-loaded model."""
    if clip is None:
        clip = _load_clip(model_name)
    if clip is None:
        return None
    import torch

    model, proc = clip
    feats = []
    with torch.no_grad():
        for c in crops:
            inputs = proc(images=c, return_tensors="pt")
            feats.append(model.get_image_features(**inputs))
        return torch.cat(feats).mean(0, keepdim=True).numpy().astype(
            np.float32
        )


def _clip_image_features_for_config(configer, model_name: str
                                    ) -> Optional[np.ndarray]:
    """Per-class averaged CLIP image features mined from each dataset's
    training images (get_img_for_everyclass + gen_image_features roles,
    ref :25-133,264-311). Returns None when CLIP weights or the datasets
    are absent (zero-egress environments) — the caller falls back to the
    text half; drop weights + data into the image and this activates with
    no code changes."""
    import cv2

    clip = _load_clip(model_name)
    if clip is None:
        return None  # no CLIP weights — caller falls back to the text half
    rows = []
    try:
        for i in range(configer.n_datasets):
            cfg_i = configer.dataset_cfg(i)
            ann = cfg_i.get("train_im_anns")
            root = cfg_i.get("im_root", ".")
            if not ann or not os.path.exists(ann):
                return None
            from mds_tpu.data.labels import get_spec

            spec = get_spec(cfg_i["spec"]) if cfg_i.get("spec") else None
            lut = spec.lb_map if spec is not None else None
            per_class: dict = {}
            with open(ann) as f:
                pairs = [ln.strip().split(",") for ln in f if ln.strip()]
            for imp, lbp in pairs[:200]:  # bounded mining pass
                img = cv2.imread(os.path.join(root, imp))
                lb = cv2.imread(os.path.join(root, lbp), 0)
                if img is None or lb is None:
                    continue
                if lut is not None:
                    lb = np.asarray(lut)[lb]
                for c in np.unique(lb):
                    if c == 255 or len(per_class.get(int(c), ())) >= 4:
                        continue
                    per_class.setdefault(int(c), []).append(
                        crop_image_by_label_value(img[:, :, ::-1], lb, int(c))
                    )
            for c in range(configer.n_cats(i)):
                crops = per_class.get(c, [])
                if not crops:
                    rows.append(None)
                    continue
                feat = clip_image_features_from_crops(
                    crops, model_name, clip=clip
                )
                rows.append(feat[0])
    except Exception:
        return None
    if any(r is None for r in rows):
        dim = next((len(r) for r in rows if r is not None), None)
        if dim is None:
            return None
        rows = [r if r is not None else np.zeros(dim, np.float32)
                for r in rows]
    return np.stack(rows) if rows else None
