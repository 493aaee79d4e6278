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
        dim_t = text.shape[1]
        # image half unavailable offline → mirror the text half (unit norm),
        # keeping the 1024-d layout of the reference cache
        out = np.concatenate([text, text], axis=1)[:, :nfeat]
        if out.shape[1] < nfeat:
            out = np.pad(out, ((0, 0), (0, nfeat - out.shape[1])))
        return out.astype(np.float32)

    return np.stack([_hash_feature(n, nfeat) for n in flat])
