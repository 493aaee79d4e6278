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
# Weight-grad kernel: gw[ky,kx,c,j] = Σ_{b,h,w} x_tap[...,c] · dy[...,c·m+j].
#
# The hybrid VJP's nine einsum sweeps (ops/depthwise.py _dw_hybrid_bwd) each
# re-read the f32-upcast dy from HBM — ~9×(x+dy) of traffic. This kernel
# reads each x row-tile and dy row-tile ONCE, forms all nine taps in VMEM,
# and accumulates the (9, m, C) f32 result across the whole grid into a
# single VMEM-resident output block (constant index map → Pallas keeps it
# on-chip until the last step). dy arrives pre-transposed to (..., m, C)
# because Mosaic cannot reshape the lane dim (see module docstring).
# ---------------------------------------------------------------------------


def _wgrad_taps(x, dyt, out_ref, *, th, w_out, cb, tap_of):
    dyt = dyt.astype(jnp.float32)  # (th, Wo, m, C)
    parts = []
    for ky in range(3):
        for kx in range(3):
            tap = tap_of(x, ky, kx).astype(jnp.float32)  # (th, Wo, C)
            parts.append((tap[:, :, None, :] * dyt).sum((0, 1)))  # (m, C)
    acc = jnp.stack(parts)  # (9, m, C)
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        out_ref[...] = acc

    @pl.when(jnp.logical_not(first))
    def _accum():
        out_ref[...] += acc


def _wgrad_s1(x_ref, dy_ref, out_ref, *, th, w_out, cb):
    def tap_of(x, ky, kx):
        return jax.lax.slice(x, (ky, kx, 0), (ky + th, kx + w_out, cb))

    _wgrad_taps(x_ref[0, 0], dy_ref[0, 0], out_ref,
                th=th, w_out=w_out, cb=cb, tap_of=tap_of)


def _wgrad_s2(p00, p01, p10, p11, dy_ref, out_ref, *, th, w_out, cb):
    planes = ((p00, p01), (p10, p11))

    def tap_of(_, ky, kx):
        pr = planes[ky % 2][kx % 2][0, 0]  # (th+1, Wq+1, C)
        return jax.lax.slice(
            pr, (ky // 2, kx // 2, 0), (ky // 2 + th, kx // 2 + w_out, cb)
        )

    _wgrad_taps(None, dy_ref[0, 0], out_ref,
                th=th, w_out=w_out, cb=cb, tap_of=tap_of)


@functools.partial(jax.jit, static_argnames=("stride",))
def depthwise3x3_wgrad_pallas(
    x: jax.Array, dy: jax.Array, stride: int = 1
) -> jax.Array:
    """Weight-grad of the grouped 3×3 conv (symmetric padding 1).

    x (B,H,W,C); dy (B,Ho,Wo,C·mult) group-major (o = c·mult + j).
    Returns gw in HWIO layout (3, 3, 1, C·mult), f32.
    """
    b, h, w_in, c = x.shape
    _, h_out, w_out, cm = dy.shape
    mult = cm // c
    assert cm == c * mult and h_out == -(-h // stride), (x.shape, dy.shape)
    itemsize = x.dtype.itemsize

    # (..., c·m+j) → (..., m, C): lane dim stays C (Mosaic-reshapeable)
    if mult == 1:
        dyt = dy[:, :, :, None, :]
    else:
        dyt = dy.reshape(b, h_out, w_out, c, mult).transpose(0, 1, 2, 4, 3)

    # Budget rows by the kernel's f32 LIVE SET, not the bf16 block bytes:
    # _wgrad_taps keeps dyt upcast to f32 for all nine taps plus one f32
    # tap×dyt product of the same shape — ~2×(th·Wo·m·C·4) live at once.
    # Budgeting only the bf16 dy block (pre-2026-08-18) made Mosaic's
    # register allocator spill ~141 MB at the mult-6 GELayer shapes.
    #
    # STATUS (v5e libtpu, 2026-08-18): even with the f32-aware budget,
    # Mosaic stack-OOMs at some train shapes — e.g. (th=32,Wo=128,C=96,m=1)
    # allocates a 70.4 MB kernel stack vs its 16 MB scoped-vmem limit; its
    # layout for the rank-4 tap×dyt reduction materializes far more than
    # the analytic live set (a 2-D per-m row-reduction rewrite compiled
    # >10 min without finishing — worse). The hybrid VJP therefore treats
    # impl="pallas" as CPU-interpret-verified but not production on this
    # toolchain (ops/depthwise.py keeps "einsum" the default).
    dy_row = w_out * mult * c * 4 * 2
    if stride == 1:
        in_row = (w_in + 2) * c * itemsize
        th = _pick(h_out, in_row, dy_row)
        n_t = -(-h_out // th)
        pad_bot = 1 + (n_t * th - h_out)
        xp = jnp.pad(x, ((0, 0), (1, pad_bot), (1, 1), (0, 0)))
        tiles = _row_tiles(xp, th, 2, n_t, 1)  # (B, nT, th+2, W+2, C)
        x_inputs = (tiles,)
        kern = functools.partial(_wgrad_s1, th=th, w_out=w_out, cb=c)
        x_specs = [
            pl.BlockSpec((1, 1, th + 2, w_in + 2, c),
                         lambda bi, ti: (bi, ti, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    else:
        in_row = (w_out + 1) * c * itemsize * 4
        th = _pick(h_out, in_row, dy_row)
        n_t = -(-h_out // th)
        rows_needed = 2 * (n_t * th + 1)
        pad_bot = max(rows_needed - (h + 1), 1)
        cols_needed = 2 * (w_out + 1)
        pad_right = max(cols_needed - (w_in + 1), 1)
        xp = jnp.pad(x, ((0, 0), (1, pad_bot), (1, pad_right), (0, 0)))
        x_inputs = tuple(
            _row_tiles(
                xp[:, p::2, q::2, :][:, : n_t * th + 1, : w_out + 1, :],
                th, 1, n_t, 1,
            )
            for p in (0, 1) for q in (0, 1)
        )
        kern = functools.partial(_wgrad_s2, th=th, w_out=w_out, cb=c)
        plane_spec = pl.BlockSpec(
            (1, 1, th + 1, w_out + 1, c), lambda bi, ti: (bi, ti, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        x_specs = [plane_spec] * 4

    # zero-pad dy rows to the tile grid (zeros contribute nothing to gw)
    dyt = jnp.pad(dyt, ((0, 0), (0, n_t * th - h_out), (0, 0), (0, 0), (0, 0)))
    dyt = dyt.reshape(b, n_t, th, w_out, mult, c)
    dy_spec = pl.BlockSpec(
        (1, 1, th, w_out, mult, c), lambda bi, ti: (bi, ti, 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )

    out = pl.pallas_call(
        kern,
        grid=(b, n_t),
        in_specs=x_specs + [dy_spec],
        out_specs=pl.BlockSpec(
            (9, mult, c), lambda bi, ti: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((9, mult, c), jnp.float32),
    )(*x_inputs, dyt)
    # (9, m, C) → (3, 3, 1, C·m), group-major o = c·mult + j
    return out.transpose(0, 2, 1).reshape(3, 3, 1, c * mult)


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
