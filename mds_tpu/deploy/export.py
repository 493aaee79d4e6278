"""Model export for deployment: serialized StableHLO via jax.export.

TPU-native counterpart of the reference's deploy exporters
(tools/export_onnx.py: E2EModel with normalize-in-graph, fixed input size,
input name 'input_image' [1,H,W,3] uint8-scale, output 'preds' [1,H,W] int;
tensorrt/trt_dep.cpp:44-139 engine build + (de)serialize). The exported
artifact is a serialized StableHLO module that any PJRT runtime (C++ or
Python) can load and run; `load_exported` round-trips it in-process.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_e2e_fn(model, variables, mean, std, dataset: int = 0):
    """E2E graph: uint8 NHWC image → normalize → net → argmax label map
    (reference: tools/demo.py E2EModel :646-710 — normalization lives inside
    the deployed graph)."""
    mean = jnp.asarray(mean, jnp.float32).reshape(1, 1, 1, 3)
    std = jnp.asarray(std, jnp.float32).reshape(1, 1, 1, 3)

    def fn(image_u8):
        x = image_u8.astype(jnp.float32) / 255.0
        x = (x - mean) / std
        return model.apply(variables, x, dataset=dataset, method=model.pred).astype(
            jnp.int32
        )

    return fn


def export_model(model, variables, input_hw: Tuple[int, int],
                 mean=None, std=None, dataset: int = 0,
                 platform: Optional[str] = None) -> bytes:
    """Serialize the e2e graph at a fixed input size (the reference fixes the
    export size too; tensorrt README 'cropsize (1024,2048)')."""
    from jax import export as jexport

    mean = mean if mean is not None else np.zeros(3, np.float32)
    std = std if std is not None else np.ones(3, np.float32)
    fn = make_e2e_fn(model, variables, mean, std, dataset)
    h, w = input_hw
    spec = jax.ShapeDtypeStruct((1, h, w, 3), jnp.uint8)
    platforms = [platform] if platform else None
    exported = jexport.export(jax.jit(fn), platforms=platforms)(spec)
    return exported.serialize()


def save_exported(blob: bytes, path: str) -> None:
    with open(path, "wb") as f:
        f.write(blob)


def load_exported(path: str):
    """Deserialize and return a callable (the 'deserialize engine' role,
    trt_dep.cpp:118-139)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return exported.call


def stablehlo_text(model, variables, input_hw: Tuple[int, int],
                   dataset: int = 0) -> str:
    """Human-readable StableHLO for inspection/native compilation."""
    fn = make_e2e_fn(model, variables, np.zeros(3), np.ones(3), dataset)
    h, w = input_hw
    spec = jax.ShapeDtypeStruct((1, h, w, 3), jnp.uint8)
    return jax.jit(fn).lower(spec).as_text()
