"""Manual-DMA variant of the Pallas depthwise kernel (stride 1).

Avoids the XLA-side halo restacking of mds_tpu.ops.pallas.depthwise (which
costs an extra read+write of the activation): the padded input stays in HBM
(ANY memory) and each grid step DMAs its overlapping (TH+2, W+2, C) window
into VMEM scratch directly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_BYTES = 3 * 1024 * 1024


def _kernel(x_hbm, w_ref, out_ref, scratch, sem, *, th: int, w_out: int,
            c: int, mult: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * th, th + 2)], scratch, sem
    )
    dma.start()
    dma.wait()
    x = scratch[...]
    acc = None
    for dy in range(3):
        for dx in range(3):
            tap = jax.lax.slice(
                x, (dy, dx, 0), (dy + th, dx + w_out, c)
            ).astype(jnp.float32)
            wk = w_ref[dy * 3 + dx].astype(jnp.float32)
            term = tap * wk[:, 0] if mult == 1 else tap[:, :, None, :] * wk.T[None, None]
            acc = term if acc is None else acc + term
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=())
def depthwise3x3_dma(x: jax.Array, w: jax.Array) -> jax.Array:
    """stride-1 depthwise; x (B,H,W,C), w (3,3,C,mult)."""
    b, h, w_in, c = x.shape
    _, _, wc, mult = w.shape
    assert wc == c
    itemsize = x.dtype.itemsize
    in_row = (w_in + 2) * c * itemsize
    out_row = w_in * c * mult * itemsize
    th = h
    while th > 1 and ((th + 2) * in_row > _BLOCK_BYTES or th * out_row > _BLOCK_BYTES):
        th = -(-th // 2)
    n_t = -(-h // th)
    pad_bot = 1 + (n_t * th - h)
    xp = jnp.pad(x, ((0, 0), (1, pad_bot), (1, 1), (0, 0)))
    wf = w.reshape(9, c, mult)
    kern = functools.partial(_kernel, th=th, w_out=w_in, c=c, mult=mult)
    if mult == 1:
        out_spec = pl.BlockSpec((1, th, w_in, c), lambda bi, ti: (bi, ti, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, n_t * th, w_in, c), x.dtype)
    else:
        out_spec = pl.BlockSpec((1, th, w_in, mult, c),
                                lambda bi, ti: (bi, ti, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, n_t * th, w_in, mult, c), x.dtype)
    out = pl.pallas_call(
        kern,
        grid=(b, n_t),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((th + 2, w_in + 2, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xp, wf)
    out = out[:, :h]
    if mult != 1:
        out = out.transpose(0, 1, 2, 4, 3).reshape(b, h, w_in, c * mult)
    return out
