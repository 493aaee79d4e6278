"""Pallas TPU kernel: fused 3×3 conv (+BN affine + ReLU), stride 1, NHWC.

Motivation: on this v5e backend XLA's convolutions measure far off roofline
(64-channel 3×3 convs ~18 TFLOP/s, the BiSeNetV2 detail branch spends ~6 ms
at deploy resolution), while plain matmuls reach ~104 TFLOP/s. This kernel
turns the conv into MXU matmuls: per row-tile, the 9 shifted taps are
concatenated along channels in VMEM (im2col with K = 9·C_in) and multiplied
against the (9·C_in, C_out) weight matrix, then the folded BN affine and
ReLU apply in-register before the single output write.

Same halo strategy as the depthwise kernel: overlapping row tiles are
restacked in XLA (overlapping BlockSpecs aren't expressible).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_BYTES = 3 * 1024 * 1024


def _kernel(x_ref, w_ref, scale_ref, bias_ref, out_ref, *, th: int, w_out: int,
            cin: int, cout: int, relu: bool):
    # Static per-output-row loop (same shape as the stem kernel): each row is
    # 9 accumulated MXU matmuls (W, Cin) @ (Cin, Cout) on lane-aligned row
    # slices. The previous version materialized full (TH, W, Cin) tap
    # tensors per (dy, dx) — 9 multi-MB VMEM copies per tile — and measured
    # ~4x slower than XLA's conv; row-at-a-time keeps every operand in
    # registers/VMEM-resident slices.
    s = scale_ref[0]
    b = bias_ref[0]
    for y in range(th):
        # K-packing: rows y+0 and y+1 concatenate on channels so their taps
        # share one K=2·Cin MXU pass (a 128-wide contraction at Cin=64 —
        # the bare per-tap dot is only K=64/N=64 ≈ 25% MXU util); row y+2
        # keeps its own K=Cin dots.
        row01 = jnp.concatenate(
            [x_ref[0, 0, y], x_ref[0, 0, y + 1]], axis=-1
        )  # (W+2, 2·Cin)
        row2 = x_ref[0, 0, y + 2]
        acc = None
        for dx in range(3):
            tap01 = jax.lax.slice(row01, (dx, 0), (dx + w_out, 2 * cin))
            part = jax.lax.dot_general(
                tap01, w_ref[0, dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            tap2 = jax.lax.slice(row2, (dx, 0), (dx + w_out, cin))
            part = part + jax.lax.dot_general(
                tap2, w_ref[1, dx, :cin],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
        acc = acc * s + b
        if relu:
            acc = jnp.maximum(acc, 0.0)
        out_ref[0, 0, y] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("relu",))
def conv3x3_bn_relu_pallas(
    x: jax.Array,          # (B, H, W, Cin)
    w: jax.Array,          # (3, 3, Cin, Cout) HWIO
    scale: Optional[jax.Array] = None,  # (Cout,) folded BN scale
    bias: Optional[jax.Array] = None,   # (Cout,) folded BN bias
    relu: bool = True,
) -> jax.Array:
    """Fused conv3×3(s=1, pad=1) → ·scale + bias → ReLU. Returns (B,H,W,Cout)."""
    b, h, w_in, cin = x.shape
    _, _, wc, cout = w.shape
    assert wc == cin
    scale = jnp.ones((cout,), jnp.float32) if scale is None else scale
    bias = jnp.zeros((cout,), jnp.float32) if bias is None else bias

    itemsize = x.dtype.itemsize
    in_row = (w_in + 2) * cin * itemsize
    out_row = w_in * cout * itemsize
    acc_row = w_in * cout * 4  # f32 accumulator
    tap_rows = w_in * cin * 4 * 3  # 3 materialized taps per dy iteration
    th = h
    while th > 1 and (
        (th + 2) * in_row > _BLOCK_BYTES
        or th * out_row > _BLOCK_BYTES
        or th * acc_row > _BLOCK_BYTES
        or th * tap_rows > _BLOCK_BYTES
    ):
        th = -(-th // 2)
    n_t = -(-h // th)
    pad_bot = 1 + (n_t * th - h)
    xp = jnp.pad(x, ((0, 0), (1, pad_bot), (1, 1), (0, 0)))
    tiles = jnp.stack(
        [jax.lax.slice_in_dim(xp, i * th, i * th + th + 2, axis=1)
         for i in range(n_t)],
        axis=1,
    )  # (B, nT, TH+2, W+2, Cin)
    # (2, 3, 2·Cin, Cout): slot 0 = rows dy∈{0,1} channel-concatenated per
    # dx (the K-packed pass); slot 1 = row dy=2 in the first Cin rows
    wf = jnp.zeros((2, 3, 2 * cin, cout), x.dtype)
    for dx in range(3):
        wf = wf.at[0, dx, :cin].set(w[0, dx].astype(x.dtype))
        wf = wf.at[0, dx, cin:].set(w[1, dx].astype(x.dtype))
        wf = wf.at[1, dx, :cin].set(w[2, dx].astype(x.dtype))
    out = pl.pallas_call(
        functools.partial(_kernel, th=th, w_out=w_in, cin=cin, cout=cout,
                          relu=relu),
        grid=(b, n_t),
        in_specs=[
            pl.BlockSpec((1, 1, th + 2, w_in + 2, cin),
                         lambda bi, ti: (bi, ti, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, th, w_in, cout), lambda bi, ti: (bi, ti, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_t, th, w_in, cout), x.dtype),
    )(tiles, wf, scale.reshape(1, cout).astype(jnp.float32),
      bias.reshape(1, cout).astype(jnp.float32))
    return out.reshape(b, n_t * th, w_in, cout)[:, :h]
