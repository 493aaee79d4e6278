#!/usr/bin/env python
"""Microbench: depthwise-conv backward cost at BiSeNetV2 train shapes.

The bs16 512×1024 train-step profile (2026-08-17) showed ~12 ms/step of
depthwise weight-grad ops. This times, per GELayer dwconv shape:
  fwd        — grouped conv forward alone
  grad_x     — backward w.r.t. input only
  grad_w     — backward w.r.t. weights only
  grad_both  — full vjp
for impl ∈ {xla (grouped conv), taps (9-tap custom vjp)} on the current
backend, using chained fori_loop timing (tunnel-honest).

Usage: python tools/microbench_dw_bwd.py [--iters 30]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

# (B, H, W, C_in, mult, stride) for every dwconv in the bench train graph
# (bs16 512×1024): SegmentBranch S3/S4/S5 GELayerS2 dwconv1 (mult 6, s2),
# dwconv2 (mult 1), GELayerS1 dwconv (mult 6, s1).
SHAPES = [
    ("S3.ge1.dw1", 16, 128, 256, 16, 6, 2),
    ("S3.ge1.dw2", 16, 64, 128, 96, 1, 1),
    ("S3.ge2.dw", 16, 64, 128, 32, 6, 1),
    ("S4.ge1.dw1", 16, 64, 128, 32, 6, 2),
    ("S4.ge1.dw2", 16, 32, 64, 192, 1, 1),
    ("S4.ge2.dw", 16, 32, 64, 64, 6, 1),
    ("S5.ge1.dw1", 16, 32, 64, 64, 6, 2),
    ("S5.ge1.dw2", 16, 16, 32, 384, 1, 1),
    ("S5.ge2.dw", 16, 16, 32, 128, 6, 1),
]


def dw_xla(x, w_hwio, stride):
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, w_hwio, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def time_fn(f, *args, iters=30):
    """Chained on-device loop; returns ms/iter. The first argument is
    perturbed by the carry each iteration so XLA cannot hoist the op out
    of the loop as loop-invariant."""
    @jax.jit
    def loop(seed, *a):
        def body(i, carry):
            outs = f(a[0] + carry.astype(a[0].dtype), *a[1:])
            s = 0.0
            for o in jax.tree_util.tree_leaves(outs):
                s = s + o.astype(jnp.float32).sum()
            return (s % 2.0)

        return jax.lax.fori_loop(0, iters, body, seed)

    float(loop(jnp.float32(0.0), *args))  # compile+warm
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


    from mds_tpu.ops.depthwise import (
        depthwise_conv3x3,
        depthwise_conv3x3_hybrid,
        kernel_from_hwio,
    )

    rng = np.random.default_rng(0)
    tot = {"fwd": 0.0, "gx": 0.0, "gw": 0.0}
    tot_taps = {"fwd": 0.0, "gx": 0.0, "gw": 0.0}
    tot_gw = {"einsum": 0.0}
    for name, B, H, W, C, M, S in SHAPES:
        x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, 1, C * M)), jnp.bfloat16)

        def fwd(x, w, S=S):
            return dw_xla(x, w, S)

        def fwd_taps(x, w, S=S, C=C):
            return depthwise_conv3x3(x, kernel_from_hwio(w, C), S)

        # hybrid weight-grad (einsum sweeps — the only backend; the Pallas
        # wgrad kernel was retired in r5, see ops/pallas/depthwise.py)
        gw_ms = {}
        gw_ms["einsum"] = time_fn(
            jax.grad(
                lambda x, w, S=S: depthwise_conv3x3_hybrid(x, w, S)
                .astype(jnp.float32).sum(),
                argnums=1,
            ),
            x, w, iters=args.iters,
        )
        tot_gw["einsum"] += gw_ms["einsum"]
        print(f"{name:12s} wgrad einsum = {gw_ms['einsum']:.3f} ms")

        rows = {}
        for tag, f in (("xla", fwd), ("taps", fwd_taps)):
            t_f = time_fn(f, x, w, iters=args.iters)
            t_gx = time_fn(jax.grad(lambda x, w: f(x, w).astype(jnp.float32).sum(), argnums=0), x, w, iters=args.iters)
            t_gw = time_fn(jax.grad(lambda x, w: f(x, w).astype(jnp.float32).sum(), argnums=1), x, w, iters=args.iters)
            rows[tag] = (t_f, t_gx, t_gw)
            d = tot if tag == "xla" else tot_taps
            d["fwd"] += t_f; d["gx"] += t_gx; d["gw"] += t_gw
        print(f"{name:12s} ({B},{H},{W},{C})xm{M}s{S}: "
              f"xla f/gx/gw = {rows['xla'][0]:.3f}/{rows['xla'][1]:.3f}/{rows['xla'][2]:.3f} ms | "
              f"taps = {rows['taps'][0]:.3f}/{rows['taps'][1]:.3f}/{rows['taps'][2]:.3f} ms")
    print(f"TOTALS xla  f={tot['fwd']:.2f} gx={tot['gx']:.2f} gw={tot['gw']:.2f} ms")
    print(f"TOTALS taps f={tot_taps['fwd']:.2f} gx={tot_taps['gx']:.2f} gw={tot_taps['gw']:.2f} ms")
    print(f"TOTALS hybrid-wgrad einsum={tot_gw['einsum']:.2f} ms")


if __name__ == "__main__":
    main()
