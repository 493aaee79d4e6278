#!/usr/bin/env python
"""A/B the train-step backward optimizations on the real chip.

Runs bench.bench_train (bs16 512×1024 bf16, chained+fetched median-of-3)
under each switch combination and prints imgs/s per config:

  base        einsum dw-wgrad · xla maxpool bwd · resize loss  (defaults)
  fast-pool   … but mask/pad maxpool VJP (documented in-graph negative)
  fused-loss  … + phase-decomposed upsample+OHEM (no full-res volumes)

Measured 2026-08-18 (v5e), full sweep at production defaults:
  base 102.08 · fused-loss 86.15 · planes-stem 93.42 · pallas-stem 95.28
  fast-pool 62.73.
`base` wins every A/B: the production defaults are the measured optimum.
(The Pallas dw weight-grad variant was retired in r5 after a measured
~346 s/call at the first GELayer shape — see ops/pallas/depthwise.py.)
Orthogonal to this sweep, HW-PRNG dropout masks (ops/pallas/dropout.py,
now the Trainer/bench default on TPU) lift base 102.08 → 103.05.

Usage: python tools/bench_train_ab.py [config ...]
"""

import sys

sys.path.insert(0, ".")

import jax

import bench
from mds_tpu.models import layers


def run(name, *, pool="xla", fused=False, stem="plain"):
    layers.set_maxpool_impl(pool)
    layers.set_stem_impl(stem)
    try:
        ips = bench.bench_train(fused_up_loss=fused, quiet=True)
        print(f"{name:12s}: {ips:7.2f} imgs/s", flush=True)
    except Exception as e:  # keep the sweep going past one bad config
        print(f"{name:12s}: FAILED {type(e).__name__}: {e}", flush=True)
    finally:
        layers.set_maxpool_impl("xla")
        layers.set_stem_impl("plain")
        jax.clear_caches()


if __name__ == "__main__":
    import sys as _sys

    only = _sys.argv[1:] or None
    cfgs = {
        "base": {},
        "fast-pool": {"pool": "fast"},
        "fused-loss": {"fused": True},
        "planes-stem": {"stem": "planes"},
        "pallas-stem": {"stem": "pallas"},
    }
    for name, kw in cfgs.items():
        if only and name not in only:
            continue
        run(name, **kw)
