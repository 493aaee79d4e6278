"""Max-pool 3×3/s2/p1 with a mask/dilate custom backward (NOT the default).

XLA lowers the max-pool gradient as SelectAndScatter (~2.2 ms at the
BiSeNetV2 StemBlock shape, bs16 256×512×16, on v5e). This custom VJP keeps
the reduce-window FORWARD (identical HLO, fuses with producers; see the
measured negative result on changing the forward in
models/layers.py:max_pool_3x3_s2) and rewrites the BACKWARD as nine
mask/dilate passes:

  dx = Σ_{ky,kx} interior_pad( dy · 1[tap_{ky,kx} == y ∧ first] , ky, kx)

where "first" reproduces SelectAndScatter's first-maximum-in-window-order
tie-breaking via a cumulative claimed mask. Each pass is an elementwise
sweep XLA fuses into one output loop — no scatter.

MEASURED IN-GRAPH NEGATIVE (v5e, 2026-08-18, full bs16 512×1024 train
step): the nine interior-pad sweeps materialize nine f32 (16,258,514,16)
buffers whose 16-lane layout starves the VPU — ~8.4 ms EACH in the jitted
step (~75 ms/step total; 62.8 vs 102.1 img/s). The standalone microbench
(tools/microbench_maxpool.py) that motivated this kernel did not reproduce
the in-graph layouts. Default is therefore "xla"
(models/layers.py:set_maxpool_impl); this path is kept as a documented
negative result and for shapes/backends where SelectAndScatter degrades.

Reference role: torch MaxPool2d(3, stride=2, padding=1) in the StemBlock
(lib/models/bisenetv2.py:192-227); cuDNN has a dedicated pooling-backward
kernel, XLA does not.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _pool_fwd_raw(x: jax.Array) -> jax.Array:
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])


@jax.custom_vjp
def max_pool_3x3_s2_fast(x: jax.Array) -> jax.Array:
    """torch MaxPool2d(3, stride=2, padding=1, ceil_mode=False) equivalent."""
    return _pool_fwd_raw(x)


def _fwd(x):
    y = _pool_fwd_raw(x)
    return y, (x, y)


def _bwd(res, dy):
    x, y = res
    b, h, w, c = x.shape
    ho, wo = y.shape[1], y.shape[2]
    neg = jnp.asarray(-jnp.inf, x.dtype)
    # padded-space accumulation: xp rows/cols = [0, h+2)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=neg)
    dyf = dy.astype(jnp.float32)
    claimed = jnp.zeros(dy.shape, jnp.bool_)
    acc = None
    for ky in range(3):
        for kx in range(3):
            tap = jax.lax.slice(
                xp,
                (0, ky, kx, 0),
                (b, ky + 2 * (ho - 1) + 1, kx + 2 * (wo - 1) + 1, c),
                (1, 2, 2, 1),
            )
            is_max = jnp.logical_and(tap == y, jnp.logical_not(claimed))
            claimed = jnp.logical_or(claimed, is_max)
            contrib = jnp.where(is_max, dyf, 0.0)
            # place window-origin (ky,kx) contributions back into xp-space:
            # row i of contrib lands at xp row ky + 2·i  (interior pad = 1)
            part = jax.lax.pad(
                contrib,
                jnp.float32(0),
                (
                    (0, 0, 0),
                    (ky, (h + 2) - (ky + 2 * (ho - 1) + 1), 1),
                    (kx, (w + 2) - (kx + 2 * (wo - 1) + 1), 1),
                    (0, 0, 0),
                ),
            )
            acc = part if acc is None else acc + part
    dx = acc[:, 1 : h + 1, 1 : w + 1, :]
    return (dx.astype(x.dtype),)


max_pool_3x3_s2_fast.defvjp(_fwd, _bwd)
