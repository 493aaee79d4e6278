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

# The wgrad kernel's f32 chunk intermediates are lane-padded to 128, so at
# small C (GELayer stages run C=16..96) each (rc, Wo, C) f32 tile costs
# ceil(C/128)·128 lanes — ~4-8× its logical bytes. XLA's default 16 MB
# scoped-vmem budget rejects that ("kernel-vmem-stack-oom") even though the
# true footprint fits v5e's 128 MB VMEM easily; raise the per-kernel limit.
_WGRAD_VMEM_LIMIT = 100 * 1024 * 1024


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
# on-chip until the last step). dy arrives pre-transposed to per-multiplier
# slabs (B, m, Ho, Wo, C) because Mosaic cannot reshape the lane dim (see
# module docstring) and an (m, C) register tile would waste 8/m sublanes.
# ---------------------------------------------------------------------------


def _wgrad_taps(dy_ref, out_ref, *, th, cb, mult, rc, tap_chunk):
    """Accumulate gw rows over this block in row chunks of rc.

    Every intermediate is rank-3 (rc, Wo, C) — lane dim C, sublane dim Wo —
    so Mosaic tiles it densely. (The pre-2026-08-20 version formed nine
    rank-4 (th, Wo, m, C) tap×dy products whose (m, C) register tile wasted
    8/m of every sublane AND kept all nine live at once: a 70 MB kernel
    stack at (th=32, Wo=128, C=96, m=1) vs the 16 MB scoped-vmem limit.
    Chunking bounds the f32 live set to ~(9+m)·rc·Wo·C·4 for any th.)"""

    def body(i, acc):
        r0 = i * rc
        dyjs = [
            dy_ref[0, j, 0, pl.ds(r0, rc)].astype(jnp.float32)  # (rc, Wo, C)
            for j in range(mult)
        ]
        parts = []
        for ky in range(3):
            for kx in range(3):
                tap = tap_chunk(ky, kx, r0).astype(jnp.float32)  # (rc, Wo, C)
                for dyj in dyjs:
                    parts.append((tap * dyj).sum((0, 1)))  # (C,)
        return acc + jnp.stack(parts)  # (9·m, C)

    acc = jax.lax.fori_loop(
        0, th // rc, body, jnp.zeros((9 * mult, cb), jnp.float32)
    )
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        out_ref[...] = acc

    @pl.when(jnp.logical_not(first))
    def _accum():
        out_ref[...] += acc


def _wgrad_s1(x_ref, dy_ref, out_ref, *, th, w_out, cb, mult, rc):
    def tap_chunk(ky, kx, r0):  # x block (1, 1, th+2, W+2, C)
        return x_ref[0, 0, pl.ds(r0 + ky, rc), pl.ds(kx, w_out), :]

    _wgrad_taps(dy_ref, out_ref, th=th, cb=cb, mult=mult,
                rc=rc, tap_chunk=tap_chunk)


def _wgrad_s2(p00, p01, p10, p11, dy_ref, out_ref, *, th, w_out, cb, mult,
              rc):
    planes = ((p00, p01), (p10, p11))

    def tap_chunk(ky, kx, r0):  # plane blocks (1, 1, th+1, Wq+1, C)
        pr = planes[ky % 2][kx % 2]
        return pr[0, 0, pl.ds(r0 + ky // 2, rc), pl.ds(kx // 2, w_out), :]

    _wgrad_taps(dy_ref, out_ref, th=th, cb=cb, mult=mult,
                rc=rc, tap_chunk=tap_chunk)


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

    # (..., c·m+j) → (B, m, Ho, Wo, C): each per-j slab keeps C on lanes and
    # Wo on sublanes so in-kernel products are dense rank-3 tiles (the f32
    # live set is bounded by the kernel's row-chunk loop — see _wgrad_taps).
    if mult == 1:
        dyt = dy[:, None]
    else:
        dyt = dy.reshape(b, h_out, w_out, c, mult).transpose(0, 4, 1, 2, 3)

    dy_row = w_out * mult * c * dy.dtype.itemsize * 2
    if stride == 1:
        in_row = (w_in + 2) * c * itemsize
        th = _pick(h_out, in_row, dy_row)
        rc = min(8, th)
        th = max(rc, th // rc * rc)  # chunk loop needs rc | th
        n_t = -(-h_out // th)
        pad_bot = 1 + (n_t * th - h_out)
        xp = jnp.pad(x, ((0, 0), (1, pad_bot), (1, 1), (0, 0)))
        tiles = _row_tiles(xp, th, 2, n_t, 1)  # (B, nT, th+2, W+2, C)
        x_inputs = (tiles,)
        kern = functools.partial(_wgrad_s1, th=th, w_out=w_out, cb=c,
                                 mult=mult, rc=rc)
        x_specs = [
            pl.BlockSpec((1, 1, th + 2, w_in + 2, c),
                         lambda bi, ti: (bi, ti, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    else:
        in_row = (w_out + 1) * c * itemsize * 4
        th = _pick(h_out, in_row, dy_row)
        rc = min(8, th)
        th = max(rc, th // rc * rc)
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
        kern = functools.partial(_wgrad_s2, th=th, w_out=w_out, cb=c,
                                 mult=mult, rc=rc)
        plane_spec = pl.BlockSpec(
            (1, 1, th + 1, w_out + 1, c), lambda bi, ti: (bi, ti, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        x_specs = [plane_spec] * 4

    # zero-pad dy rows to the tile grid (zeros contribute nothing to gw)
    dyt = jnp.pad(dyt, ((0, 0), (0, 0), (0, n_t * th - h_out), (0, 0), (0, 0)))
    dyt = dyt.reshape(b, mult, n_t, th, w_out, c)
    dy_spec = pl.BlockSpec(
        (1, mult, 1, th, w_out, c), lambda bi, ti: (bi, 0, ti, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )

    out = pl.pallas_call(
        kern,
        grid=(b, n_t),
        in_specs=x_specs + [dy_spec],
        out_specs=pl.BlockSpec(
            (9 * mult, c), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((9 * mult, c), jnp.float32),
        compiler_params=_CompilerParams(vmem_limit_bytes=_WGRAD_VMEM_LIMIT),
    )(*x_inputs, dyt)
    # (9·m, C) → (3, 3, 1, C·m), group-major o = c·mult + j
    return out.reshape(9, mult, c).transpose(0, 2, 1).reshape(3, 3, 1, c * mult)


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
