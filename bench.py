"""Headline benchmark: BiSeNetV2 1024×2048 bf16 end-to-end inference FPS.

Mirrors the reference's deploy benchmark (tensorrt/trt_dep.cpp
test_fps_with_engine; README.md:10 — BiSeNetV2 59 FPS fp16 on a Tesla T4 at
1024×2048, bs=1). Ours measures the full exported graph: uint8-scale input →
normalize → BiSeNetV2 → argmax label map, jitted in bf16 on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline = FPS / 59 (reference T4 fp16 FPS; BASELINE.md).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

T4_FP16_FPS = 59.0  # reference README.md:10


def main():
    from mds_tpu.models.bisenetv2 import BiSeNetV2
    from mds_tpu.models.layers import set_stem_impl

    # Pallas stem kernel: the two full-res RGB stem convs cost 3.6 ms of a
    # 9.0 ms graph under XLA's emitter (profiled 2026-08-16); the kernel is
    # bit-exact vs the plain conv (err 0.0 on chip). In eval graphs the BN
    # and ReLU are folded into the kernel (bf16 out) — together 93.7 (r1)
    # → 121.9 FPS.
    set_stem_impl("pallas")
    model = BiSeNetV2(n_classes=(19,), n_bn=1, aux=False, dtype=jnp.bfloat16)
    H, W = 1024, 2048
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = jax.jit(lambda k: model.init({"params": k}, [x0], train=False))(rng)

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

    # Honest device-side timing for this remote-tunnel backend: N iterations
    # chained on-device inside one dispatch (each step's input depends on the
    # previous prediction), and the result is FETCHED to host (float()) —
    # block_until_ready alone does not actually wait on this backend, and
    # repeated identical dispatches can be served from a content-hash cache.
    n_iters = 30

    @jax.jit
    def pred_loop(v, im, seed):
        def body(i, carry):
            p = pred(v, im + carry)
            return (p.sum() % 2).astype(jnp.uint8)

        return jax.lax.fori_loop(0, n_iters, body, seed)

    float(pred_loop(variables, im, jnp.uint8(0)))  # compile + warmup
    # pinned methodology (since r2): 3 chained-loop runs, report the MEDIAN
    # and include every run so the tunnel jitter is visible, not hidden
    runs = []
    for rep in range(3):
        t0 = time.perf_counter()
        float(pred_loop(variables, im, jnp.uint8(rep + 1)))
        runs.append(n_iters / (time.perf_counter() - t0))
    fps = sorted(runs)[1]

    print(
        json.dumps(
            {
                "metric": "bisenetv2_1024x2048_bf16_inference_fps",
                "value": round(fps, 2),
                "unit": "fps/chip",
                "vs_baseline": round(fps / T4_FP16_FPS, 3),
                "runs": [round(r, 2) for r in runs],
            }
        )
    )


if __name__ == "__main__":
    main()
