#!/usr/bin/env python
"""Microbench: per-head upsample→OHEM-CE cost at bs16 512×1024 train shapes.

The five BiSeNetV2 heads emit (B, H/f, W/f, 19) logits that are bilinearly
upsampled to full label resolution and fed to OhemCELoss — the full-res
19-channel volumes are the largest tensors in the train graph. This times
fwd and fwd+grad per head factor to decide whether a fused
upsample+CE Pallas kernel pays.

Usage: python tools/microbench_ohem.py [--iters 20]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

B, H, W, NC = 16, 512, 1024, 19
FACTORS = [8, 8, 8, 16, 32]  # main + aux2..aux5_4 residual factors


def time_fn(f, *args, iters=20):
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
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from mds_tpu.losses.ohem_ce import OhemCELoss

    criteria = OhemCELoss(0.7)
    rng = np.random.default_rng(0)
    lb = jnp.asarray(rng.integers(0, NC, (B, H, W)), jnp.int32)

    tot_f = tot_g = 0.0
    for f in FACTORS:
        x = jnp.asarray(
            rng.standard_normal((B, H // f, W // f, NC)), jnp.bfloat16
        )

        def head_loss(x, lb, f=f):
            b, h, w, c = x.shape
            up = jax.image.resize(x, (b, h * f, w * f, c), method="linear")
            return criteria(up, lb)

        t_f = time_fn(head_loss, x, lb, iters=args.iters)
        t_g = time_fn(
            jax.grad(lambda x, lb, f=f: head_loss(x, lb, f)), x, lb,
            iters=args.iters)
        tot_f += t_f
        tot_g += t_g
        print(f"factor {f:2d}: fwd {t_f:.3f} ms, fwd+grad {t_g:.3f} ms")
    print(f"TOTAL 5 heads: fwd {tot_f:.2f} ms, fwd+grad {tot_g:.2f} ms")


if __name__ == "__main__":
    main()
