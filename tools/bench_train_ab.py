#!/usr/bin/env python
"""A/B the train-step backward optimizations on the real chip.

Runs bench.bench_train (bs16 512×1024 bf16, chained+fetched median-of-3)
under each switch combination and prints imgs/s per config:

  base        einsum dw-wgrad · xla maxpool bwd · resize loss  (defaults)
  fast-pool   … but mask/pad maxpool VJP (documented in-graph negative)
  pal-wgrad   … + single-pass Pallas dw weight-grad
  fused-loss  … + phase-decomposed upsample+OHEM (no full-res volumes)
  all         pal-wgrad + fused-loss

Measured 2026-08-18 (v5e), full sweep at production defaults:
  base 102.08 · fused-loss 86.15 · planes-stem 93.42 · pallas-stem 95.28
  fast-pool 62.73 · pal-wgrad + all FAILED (Mosaic scoped-vmem stack OOM —
  see ops/pallas/depthwise.py wgrad STATUS note; that kernel stays
  CPU-interpret-verified only).
`base` wins every A/B: the production defaults are the measured optimum.
Orthogonal to this sweep, HW-PRNG dropout masks (ops/pallas/dropout.py,
now the Trainer/bench default on TPU) lift base 102.08 → 103.05.

Usage: python tools/bench_train_ab.py [config ...]
"""

import sys

sys.path.insert(0, ".")

import jax

import bench
from mds_tpu.models import layers
from mds_tpu.ops import depthwise as dwm


def run(name, *, wgrad="einsum", pool="xla", fused=False, stem="plain"):
    dwm.set_dw_wgrad_impl(wgrad)
    layers.set_maxpool_impl(pool)
    layers.set_stem_impl(stem)
    try:
        ips = bench.bench_train(fused_up_loss=fused, quiet=True)
        print(f"{name:12s}: {ips:7.2f} imgs/s", flush=True)
    except Exception as e:  # keep the sweep going past one bad config
        print(f"{name:12s}: FAILED {type(e).__name__}: {e}", flush=True)
    finally:
        dwm.set_dw_wgrad_impl("einsum")
        layers.set_maxpool_impl("xla")
        layers.set_stem_impl("plain")
        jax.clear_caches()


if __name__ == "__main__":
    import sys as _sys

    only = _sys.argv[1:] or None
    cfgs = {
        "base": {},
        "fast-pool": {"pool": "fast"},
        "pal-wgrad": {"wgrad": "pallas"},
        "fused-loss": {"fused": True},
        "planes-stem": {"stem": "planes"},
        "pallas-stem": {"stem": "pallas"},
        "all": {"wgrad": "pallas", "fused": True, "stem": "planes"},
    }
    for name, kw in cfgs.items():
        if only and name not in only:
            continue
        run(name, **kw)
