#!/usr/bin/env python
"""Eval-protocol throughput: seconds per 1024×2048 image for ss/msf/ssc/mscf.

The README's four mIoU columns come from these protocols (reference
evaluate.py: MscEvalV0 :46-99, MscEvalCrop :650-753). The crop protocols
batch ALL windows of a scale into one jitted call with on-device
scatter-add (evaluation/evaluator.py MscEvalCrop._batched_crop_fn) — this
bench pins the wall-clock per image so regressions are visible
(VERDICT r2 #8 target: <2 s/chip for one mscf image).

  python tools/bench_eval.py [--modes ss,msf,ssc,mscf] [--tiny] [--cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="ss,msf,ssc,mscf")
    ap.add_argument("--tiny", action="store_true", help="128×256 CPU smoke")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from mds_tpu.evaluation.evaluator import MscEvalCrop, MscEvalV0
    from mds_tpu.models.bisenetv2 import BiSeNetV2

    H, W = (128, 256) if args.tiny else (1024, 2048)
    crop = (64, 64) if args.tiny else (1024, 1024)
    scales = (0.5, 0.75, 1.0, 1.25, 1.5, 1.75)

    model = BiSeNetV2(n_classes=(19,), n_bn=1, aux=False, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = jax.jit(
        lambda k: model.init({"params": k}, [x0], train=False)
    )(jax.random.PRNGKey(0))

    def logits_fn(im, dataset):
        return model.apply(variables, im, dataset=dataset,
                           method=model.eval_logits)

    rng = np.random.default_rng(0)
    im = rng.integers(0, 256, (1, H, W, 3)).astype(np.float32)
    lb = rng.integers(0, 19, (1, H, W)).astype(np.int64)

    protos = {
        "ss": MscEvalV0(scales=(1.0,), flip=False),
        "msf": MscEvalV0(scales=scales, flip=True),
        "ssc": MscEvalCrop(cropsize=crop, cropstride=2 / 3, flip=False,
                           scales=(1.0,)),
        "mscf": MscEvalCrop(cropsize=crop, cropstride=2 / 3, flip=True,
                            scales=scales),
    }

    class OneImage:
        def __iter__(self):
            yield {"im": im, "lb": lb}

    for mode in args.modes.split(","):
        ev = protos[mode]
        ev(logits_fn, OneImage(), 19, 0)  # compile + warmup
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            ev(logits_fn, OneImage(), 19, 0)
            runs.append(time.perf_counter() - t0)
        sec = sorted(runs)[1]
        print(json.dumps({
            "metric": f"eval_{mode}_sec_per_image",
            "value": round(sec, 3),
            "unit": "s/img/chip",
            "size": f"{H}x{W}",
            "runs": [round(r, 3) for r in runs],
        }), flush=True)


if __name__ == "__main__":
    main()
