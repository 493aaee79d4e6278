#!/usr/bin/env python
"""A/B the train-step backward optimizations on the real chip.

Runs bench.bench_train (bs16 512×1024 bf16, chained+fetched median-of-3)
under each switch combination and prints imgs/s per config:

  base        einsum dw-wgrad · fast maxpool bwd · resize loss  (defaults)
  xla-pool    … but SelectAndScatter maxpool bwd (pre-r3 behavior)
  pal-wgrad   … + single-pass Pallas dw weight-grad
  fused-loss  … + phase-decomposed upsample+OHEM (no full-res volumes)
  all         pal-wgrad + fused-loss

Usage: python tools/bench_train_ab.py
"""

import sys

sys.path.insert(0, ".")

import jax

import bench
from mds_tpu.models import layers
from mds_tpu.ops import depthwise as dwm


def run(name, *, wgrad="einsum", pool="fast", fused=False):
    dwm.set_dw_wgrad_impl(wgrad)
    layers.set_maxpool_impl(pool)
    try:
        ips = bench.bench_train(fused_up_loss=fused, quiet=True)
        print(f"{name:12s}: {ips:7.2f} imgs/s", flush=True)
    finally:
        dwm.set_dw_wgrad_impl("einsum")
        layers.set_maxpool_impl("fast")
        jax.clear_caches()


if __name__ == "__main__":
    run("base")
    run("xla-pool", pool="xla")
    run("pal-wgrad", wgrad="pallas")
    run("fused-loss", fused=True)
    run("all", wgrad="pallas", fused=True)
