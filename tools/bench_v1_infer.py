#!/usr/bin/env python
"""BiSeNetV1 1024×2048 bs1 bf16 end-to-end inference FPS.

The reference's OTHER headline deploy number: BiSeNetV1 at 68 FPS fp16 /
23 FPS fp32 on a Tesla T4 via TensorRT (README.md:9; tensorrt README tips).
Same pinned methodology as bench.py: uint8 input → normalize → net → argmax
label map, N iterations chained on-device, result fetched, median of 3.

  python tools/bench_v1_infer.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

T4_FP16_FPS = 68.0  # reference README.md:9


def main():
    from mds_tpu.models.bisenetv1 import BiSeNetV1
    from mds_tpu.models.layers import set_stem_impl

    # Pallas 7×7 stem kernel with folded bn1 (ops/pallas/stem.py
    # stem7_conv_bn_relu_s2): XLA's lowering of the C=3 conv1 cost
    # ~2.7 ms + ~2.4 ms of layout copies of an 11.45 ms graph
    # (profiled v5e 2026-08-18)
    set_stem_impl("pallas")
    model = BiSeNetV1(n_classes=(19,), aux=False, dtype=jnp.bfloat16)
    H, W = 1024, 2048
    x0 = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = jax.jit(
        lambda k: model.init({"params": k}, [x0], train=False)
    )(jax.random.PRNGKey(0))

    mean = jnp.asarray([0.3257, 0.3690, 0.3223], jnp.float32)
    std = jnp.asarray([0.2112, 0.2148, 0.2115], jnp.float32)

    @jax.jit
    def pred(v, im_u8):
        x = im_u8.astype(jnp.float32) / 255.0
        x = (x - mean.reshape(1, 1, 1, 3)) / std.reshape(1, 1, 1, 3)
        return model.apply(v, x, dataset=0, method=model.pred)

    im = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (1, H, W, 3)), jnp.uint8
    )
    n_iters = 30

    @jax.jit
    def pred_loop(v, im, seed):
        def body(i, carry):
            p = pred(v, im + carry)
            return (p.sum() % 2).astype(jnp.uint8)

        return jax.lax.fori_loop(0, n_iters, body, seed)

    float(pred_loop(variables, im, jnp.uint8(0)))  # compile + warmup
    runs = []
    for rep in range(3):
        t0 = time.perf_counter()
        float(pred_loop(variables, im, jnp.uint8(rep + 1)))
        runs.append(n_iters / (time.perf_counter() - t0))
    fps = sorted(runs)[1]
    print(json.dumps({
        "metric": "bisenetv1_1024x2048_bf16_inference_fps",
        "value": round(fps, 2),
        "unit": "fps/chip",
        "vs_baseline": round(fps / T4_FP16_FPS, 3),
        "runs": [round(r, 2) for r in runs],
    }))


if __name__ == "__main__":
    main()
