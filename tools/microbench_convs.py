#!/usr/bin/env python
"""Microbench: dense-conv fwd/bwd cost at BiSeNetV2 bs16 512×1024 train shapes.

Companion to microbench_dw_bwd.py: times every non-depthwise conv in the
bench train graph (detail branch, stem, GELayer 3×3/1×1 convs, BGA, heads)
under jax.grad, to map where the remaining step time lives. The axon
tunnel's profiler is unreliable (identical replayed traces observed
2026-08-17), so chained-loop microbenches are the ground truth here.

Usage: python tools/microbench_convs.py [--iters 30]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

# (name, B, H, W, Cin, Cout, k, stride) for the bs16 512×1024 train graph
SHAPES = [
    # detail branch (bisenetv2.py DetailBranch)
    ("D.S1_1", 16, 512, 1024, 3, 64, 3, 2),
    ("D.S1_2", 16, 256, 512, 64, 64, 3, 1),
    ("D.S2_1", 16, 256, 512, 64, 64, 3, 2),
    ("D.S2_2", 16, 128, 256, 64, 64, 3, 1),  # ×2 in graph
    ("D.S3_1", 16, 128, 256, 64, 128, 3, 2),
    ("D.S3_2", 16, 64, 128, 128, 128, 3, 1),  # ×2 in graph
    # segment stem
    ("S.stem", 16, 512, 1024, 3, 16, 3, 2),
    ("S.left1", 16, 256, 512, 16, 8, 1, 1),
    ("S.left2", 16, 256, 512, 8, 16, 3, 2),
    ("S.fuse", 16, 128, 256, 32, 16, 3, 1),
    # GELayer conv1 3×3 + conv2 1×1 (S3 level; S4/S5 shrink 4×/16×)
    ("GE3.c1", 16, 128, 256, 16, 16, 3, 1),
    ("GE3.c2", 16, 64, 128, 96, 32, 1, 1),
    ("GE3b.c1", 16, 64, 128, 32, 32, 3, 1),
    ("GE3b.c2", 16, 64, 128, 192, 32, 1, 1),
    # CEBlock + BGA main convs (/8, /32)
    ("CE.conv", 16, 16, 32, 128, 128, 1, 1),
    ("BGA.l2", 16, 64, 128, 128, 128, 3, 1),
    ("BGA.out", 16, 64, 128, 128, 128, 3, 1),
    # heads: main (mid 1024) + aux2 (mid 128)
    ("H.main", 16, 64, 128, 128, 1024, 3, 1),
    ("H.main.cls", 16, 64, 128, 1024, 19, 1, 1),
    ("H.aux2", 16, 128, 256, 16, 128, 3, 1),
    ("H.aux2.cls", 16, 128, 256, 128, 76, 1, 1),  # 19·4 pre-shuffle
]


def conv(x, w, stride):
    k = w.shape[0]
    pad = k // 2
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


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

    rng = np.random.default_rng(0)
    tot = {"fwd": 0.0, "gx": 0.0, "gw": 0.0}
    for name, B, H, W, Ci, Co, k, S in SHAPES:
        x = jnp.asarray(rng.standard_normal((B, H, W, Ci)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, k, Ci, Co)) * 0.1, jnp.bfloat16)

        def f(x, w, S=S):
            return conv(x, w, S)

        t_f = time_fn(f, x, w, iters=args.iters)
        t_gx = time_fn(
            jax.grad(lambda x, w: f(x, w).astype(jnp.float32).sum(), argnums=0),
            x, w, iters=args.iters)
        t_gw = time_fn(
            jax.grad(lambda x, w: f(x, w).astype(jnp.float32).sum(), argnums=1),
            x, w, iters=args.iters)
        tot["fwd"] += t_f
        tot["gx"] += t_gx
        tot["gw"] += t_gw
        gflop = 2 * B * (H // S) * (W // S) * k * k * Ci * Co / 1e9
        print(f"{name:12s} ({B},{H},{W},{Ci}->{Co})k{k}s{S} "
              f"[{gflop:7.1f} GF]: f/gx/gw = {t_f:.3f}/{t_gx:.3f}/{t_gw:.3f} ms "
              f"(fwd {gflop / t_f:.1f} TF/s)")
    print(f"TOTALS f={tot['fwd']:.2f} gx={tot['gx']:.2f} gw={tot['gw']:.2f} ms")


if __name__ == "__main__":
    main()
