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


def load_exported_obj(path: str):
    """Deserialize to the jax.export Exported object (exposes .call and
    .in_avals — one read serves both execution and shape queries)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(f.read())


def load_exported(path: str):
    """Deserialize and return a callable (the 'deserialize engine' role,
    trt_dep.cpp:118-139)."""
    return load_exported_obj(path).call


def stablehlo_text(model, variables, input_hw: Tuple[int, int],
                   dataset: int = 0) -> str:
    """Human-readable StableHLO for inspection/native compilation."""
    fn = make_e2e_fn(model, variables, np.zeros(3), np.ones(3), dataset)
    h, w = input_hw
    spec = jax.ShapeDtypeStruct((1, h, w, 3), jnp.uint8)
    return jax.jit(fn).lower(spec).as_text()


def export_pjrt_artifact(model, variables, input_hw: Tuple[int, int],
                         out_dir: str, mean=None, std=None,
                         dataset: int = 0) -> str:
    """Write a directory artifact the standalone C++ PJRT runner
    (cpp/pjrt_runner.cpp) consumes — the native-deploy analog of the
    reference's ONNX file for tensorrt/segment.cpp:

      module.mlir        — StableHLO module, textual MLIR (PJRT 'mlir' format)
      compile_options.pb — serialized CompileOptionsProto (1 replica/partition)
      meta.json          — input/output shapes + dtypes

    jax.export's own serialization is jax-internal; the C API path takes the
    raw MLIR + options proto instead.
    """
    import json

    from jax._src.lib import xla_client as xc

    mean = mean if mean is not None else np.zeros(3, np.float32)
    std = std if std is not None else np.ones(3, np.float32)
    fn = make_e2e_fn(model, variables, mean, std, dataset)
    h, w = input_hw
    spec = jax.ShapeDtypeStruct((1, h, w, 3), jnp.uint8)
    lowered = jax.jit(fn).lower(spec)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "module.mlir"), "w") as f:
        f.write(lowered.as_text())
    co = xc.CompileOptions()
    co.num_replicas = 1
    co.num_partitions = 1
    with open(os.path.join(out_dir, "compile_options.pb"), "wb") as f:
        f.write(co.SerializeAsString())
    out_aval = jax.eval_shape(fn, spec)
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump({
            "input": {"shape": [1, h, w, 3], "dtype": "uint8",
                      "name": "input_image"},
            "output": {"shape": list(out_aval.shape),
                       "dtype": str(out_aval.dtype), "name": "preds"},
        }, f, indent=1)
    return out_dir
