"""Pallas TPU kernel: depthwise / channel-multiplied 3×3 convolution.

XLA's grouped-conv lowering runs BiSeNetV2's depthwise convs at ~0.2 TFLOP/s
(see mds_tpu.ops.depthwise; the reference hit the same wall in TensorRT —
tensorrt/README tip 4 blames the depthwise convs). This kernel streams
row-tiles of the input through VMEM and does the 9 shifted multiply-adds on
the VPU — memory-bound by ~one read + one write.

Design notes (Mosaic constraints shaped all of this):
  * overlapping blocks aren't expressible in a BlockSpec, so halo rows are
    materialized in XLA: the padded input is restacked into overlapping row
    tiles (B, nT, TH+2, W+2, C) before the call;
  * Mosaic has no strided vector slice, so stride 2 is handled by splitting
    the input into 4 parity planes in XLA; in-kernel taps become plain
    slices of the planes;
  * Mosaic can't reshape the lane dim, so the channel-multiplier path
    (GELayer expansion: groups=C, C_out=m·C) emits (…, m, C) and the
    group-major interleave happens outside.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-block VMEM budget (Pallas double-buffers in+out blocks)
_BLOCK_BYTES = 3 * 1024 * 1024

try:  # renamed in newer jax
    _CompilerParams = pltpu.CompilerParams
except AttributeError:  # pragma: no cover
    _CompilerParams = pltpu.TPUCompilerParams



def _accum(tap, wk, mult, acc):
    tap = tap.astype(jnp.float32)
    if mult == 1:
        term = tap * wk[:, 0]  # (h, w, CB)
    else:
        term = tap[:, :, None, :] * wk.T[None, None, :, :]  # (h, w, m, CB)
    return term if acc is None else acc + term


def _kernel_s1(x_ref, w_ref, out_ref, *, th: int, w_out: int, cb: int, mult: int):
    x = x_ref[0, 0]  # (TH+2, W+2, CB)
    acc = None
    for dy in range(3):
        for dx in range(3):
            tap = jax.lax.slice(x, (dy, dx, 0), (dy + th, dx + w_out, cb))
            acc = _accum(tap, w_ref[dy * 3 + dx].astype(jnp.float32), mult, acc)
    out_ref[0, 0] = acc.astype(out_ref.dtype)


def _kernel_s2(p00, p01, p10, p11, w_ref, out_ref, *, th: int, w_out: int,
               cb: int, mult: int):
    planes = ((p00, p01), (p10, p11))
    acc = None
    for dy in range(3):
        for dx in range(3):
            pr = planes[dy % 2][dx % 2][0, 0]  # (TH+1, Wq+1, CB)
            tap = jax.lax.slice(
                pr, (dy // 2, dx // 2, 0), (dy // 2 + th, dx // 2 + w_out, cb)
            )
            acc = _accum(tap, w_ref[dy * 3 + dx].astype(jnp.float32), mult, acc)
    out_ref[0, 0] = acc.astype(out_ref.dtype)


def _row_tiles(xp: jax.Array, th: int, halo: int, n_t: int, step: int):
    """(B, H', W', C) → (B, nT, th·step? + halo, W', C) overlapping tiles."""
    tiles = [
        jax.lax.slice_in_dim(xp, i * th * step, i * th * step + th * step + halo,
                             axis=1)
        for i in range(n_t)
    ]
    return jnp.stack(tiles, axis=1)


def _pick(h_out: int, w_bytes_per_row_in: int, w_bytes_per_row_out: int) -> int:
    th = h_out
    while th > 1 and (
        (th + 2) * w_bytes_per_row_in > _BLOCK_BYTES
        or th * w_bytes_per_row_out > _BLOCK_BYTES
    ):
        th = -(-th // 2)
    return th


# ---------------------------------------------------------------------------
# RETIRED (r5): a single-pass weight-grad kernel (read x and dy once,
# accumulate the (9·m, C) result across the whole grid into one
# VMEM-resident output block) lived here through r4-r5. r4's version hit
# Mosaic scoped-vmem stack OOM at several train shapes; the r5 row-chunk
# rewrite compiled fine (2.1 s) but EXECUTED at ~346 s for ONE call at the
# first GELayer production shape (16,128,256,C16,m6,s2) on v5e — vs ~0.6 ms
# for the nine-sweep einsum weight-grad (ops/depthwise.py), which remains
# the production default (itself ~2× faster than XLA's batch-group-count
# lowering). Root cause: the constant-index-map output block makes every
# grid step read-modify-write the same VMEM block, serializing the grid and
# defeating Pallas' double-buffered pipeline; per-block partial outputs
# reduced outside would be required, at which point the kernel IS the
# einsum formulation XLA already fuses. Measured 2026-08-21
# (tools/microbench_dw_bwd.py shapes).
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("stride",))
def depthwise3x3_pallas(x: jax.Array, w: jax.Array, stride: int = 1) -> jax.Array:
    """x (B,H,W,C); w (3,3,C,mult); symmetric padding 1 (torch padding=1).
    Returns (B, ceil(H/s), ceil(W/s), C·mult)."""
    b, h, w_in, c = x.shape
    _, _, wc, mult = w.shape
    assert wc == c, (w.shape, x.shape)
    h_out = -(-h // stride)
    w_out = -(-w_in // stride)
    itemsize = x.dtype.itemsize
    wf = w.reshape(9, c, mult)

    if stride == 1:
        in_row = (w_in + 2) * c * itemsize
        out_row = w_out * c * mult * itemsize
        th = _pick(h_out, in_row, out_row)
        n_t = -(-h_out // th)
        # pad: +1 top halo, bottom halo + tile remainder
        pad_bot = 1 + (n_t * th - h_out)
        xp = jnp.pad(x, ((0, 0), (1, pad_bot), (1, 1), (0, 0)))
        tiles = _row_tiles(xp, th, 2, n_t, 1)  # (B, nT, TH+2, W+2, C)
        inputs = (tiles, wf)
        kern = functools.partial(_kernel_s1, th=th, w_out=w_out, cb=c, mult=mult)
        in_specs = [
            pl.BlockSpec((1, 1, th + 2, w_in + 2, c),
                         lambda bi, ti: (bi, ti, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
    else:
        in_row = (w_out + 1) * c * itemsize * 4
        out_row = w_out * c * mult * itemsize
        th = _pick(h_out, in_row, out_row)
        n_t = -(-h_out // th)
        rows_needed = 2 * (n_t * th + 1)  # plane rows n_t·th+1, ×2 parity
        pad_bot = max(rows_needed - (h + 1), 1)
        cols_needed = 2 * (w_out + 1)
        pad_right = max(cols_needed - (w_in + 1), 1)
        xp = jnp.pad(x, ((0, 0), (1, pad_bot), (1, pad_right), (0, 0)))
        planes = [
            _row_tiles(
                xp[:, p::2, q::2, :][:, : n_t * th + 1, : w_out + 1, :],
                th, 1, n_t, 1,
            )
            for p in (0, 1) for q in (0, 1)
        ]  # each (B, nT, TH+1, Wq+1, C)
        inputs = (*planes, wf)
        kern = functools.partial(_kernel_s2, th=th, w_out=w_out, cb=c, mult=mult)
        plane_spec = pl.BlockSpec(
            (1, 1, th + 1, w_out + 1, c), lambda bi, ti: (bi, ti, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        in_specs = [plane_spec] * 4 + [pl.BlockSpec(memory_space=pltpu.VMEM)]

    grid = (b, n_t)
    if mult == 1:
        out = pl.pallas_call(
            kern, grid=grid, in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, 1, th, w_out, c), lambda bi, ti: (bi, ti, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((b, n_t, th, w_out, c), x.dtype),
        )(*inputs)
        return out.reshape(b, n_t * th, w_out, c)[:, :h_out]
    out = pl.pallas_call(
        kern, grid=grid, in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, th, w_out, mult, c), lambda bi, ti: (bi, ti, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_t, th, w_out, mult, c), x.dtype),
    )(*inputs)
    out = out.reshape(b, n_t * th, w_out, mult, c)[:, :h_out]
    # group-major interleave: output channel index = c·mult + j
    return out.transpose(0, 1, 2, 4, 3).reshape(b, h_out, w_out, c * mult)
