#!/usr/bin/env python
"""Microbench: max-pool 3×3/s2 backward — SelectAndScatter vs mask/pad VJP.

Shapes: the BiSeNetV2 StemBlock pool (bs16, /2 res ×16ch) and the
SwiftNet/ResNet18 stem pool (bs16, /2 res ×64ch) from the train graphs.

Usage: python tools/microbench_maxpool.py [--iters 30]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

SHAPES = [("stemblock", 16, 256, 512, 16), ("rn18stem", 16, 256, 512, 64)]


def time_fn(f, *args, iters=30):
    @jax.jit
    def loop(seed, *a):
        def body(i, carry):
            outs = f(a[0] + carry.astype(a[0].dtype), *a[1:])
            s = 0.0
            for o in jax.tree_util.tree_leaves(outs):
                s = s + o.astype(jnp.float32).sum()
            return (s % 2.0)

        return jax.lax.fori_loop(0, iters, body, seed)

    float(loop(jnp.float32(0.0), *args))
    best = 1e9
    for rep in range(3):
        t0 = time.perf_counter()
        float(loop(jnp.float32(rep + 1.0), *args))
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    from mds_tpu.ops.maxpool import max_pool_3x3_s2_fast

    def sas(x):
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)

    rng = np.random.default_rng(0)
    for name, B, H, W, C in SHAPES:
        x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
        cells = []
        for tag, f in (("sas", sas), ("fast", max_pool_3x3_s2_fast)):
            t_f = time_fn(f, x, iters=args.iters)
            t_g = time_fn(
                jax.grad(lambda x_, f=f: f(x_).astype(jnp.float32).sum()),
                x, iters=args.iters)
            cells.append(f"{tag} f/f+g = {t_f:.3f}/{t_g:.3f}")
        print(f"{name:10s} ({B},{H},{W},{C}): " + " ms | ".join(cells) + " ms")


if __name__ == "__main__":
    main()
