#!/usr/bin/env python
"""Microbench: stem-conv cost in TRAIN mode — XLA vs Pallas forward.

The eval/deploy graph already runs the full-res 3-channel stems through the
Pallas kernel (3.6 ms → in-kernel at bs1 1024×2048; ops/pallas/stem.py).
Training still uses XLA's conv. This times, at the bs16 512×1024 train
shapes, for each stem (detail S1_1 3→64, segment stem 3→16):

  fwd          — forward alone (XLA conv vs Pallas kernel)
  fwd+gw       — jax.grad w.r.t. the kernel (the image carries no gradient,
                 so dx is dead-code; wgrad is what training pays)

Usage: python tools/microbench_stem_train.py [--iters 30]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

SHAPES = [("D.S1_1", 16, 512, 1024, 64), ("S.stem", 16, 512, 1024, 16)]


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

    from mds_tpu.ops.pallas.stem import stem_conv3x3_s2
    from mds_tpu.ops.space_to_depth import conv3x3_s2_via_planes

    def xla_conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    # pallas forward + planes-im2col matmul weight-grad (no XLA conv
    # anywhere in the backward; dx is the planes autodiff, dead in training)
    @jax.custom_vjp
    def pallas_planesbwd(x, k):
        return stem_conv3x3_s2(x, k)

    def _fw(x, k):
        return stem_conv3x3_s2(x, k), (x, k)

    def _bw(res, g):
        x, k = res
        _, vjp = jax.vjp(conv3x3_s2_via_planes, x, k)
        return vjp(g.astype(x.dtype))

    pallas_planesbwd.defvjp(_fw, _bw)

    variants = [
        ("xla", xla_conv),
        ("planes", conv3x3_s2_via_planes),
        ("pallas", stem_conv3x3_s2),
        ("pal+pl", pallas_planesbwd),
    ]
    rng = np.random.default_rng(0)
    for name, B, H, W, O in SHAPES:
        x = jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((3, 3, 3, O)) * 0.2, jnp.bfloat16)

        cells = []
        for tag, f in variants:
            t_f = time_fn(f, x, k, iters=args.iters)
            # grad w.r.t. kernel only — mirrors training (image grad is dead)
            t_g = time_fn(
                jax.grad(
                    lambda k_, x_, f=f: f(x_, k_).astype(jnp.float32).sum()
                ),
                k, x, iters=args.iters)
            cells.append(f"{tag} {t_f:.3f}/{t_g:.3f}")
        print(f"{name:8s} ({B},{H},{W},3->{O}) f/f+gw ms: " + " | ".join(cells))


if __name__ == "__main__":
    main()
