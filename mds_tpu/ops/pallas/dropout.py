"""Pallas TPU kernel: dropout via the hardware PRNG.

The SegmentHead dropout (reference lib/models/bisenetv2.py:493-539 uses
nn.Dropout(0.1) on the mid=1024 head input) is the single biggest RNG cost
in the train step: even with uint8 threefry draws (models/layers.py
FastDropout) the mask generation showed up as a ~2.8 ms/step
xor_convert_fusion at bs16 512×1024 (v5e profile 2026-08-18), because
threefry is ~20 ALU rounds per 32-bit block on the VPU. The TPU's per-core
hardware PRNG (pltpu.prng_random_bits) generates the same bits for ~free,
so this kernel fuses draw + compare + scale into one pass over x.

Semantics match FastDropout: keep probability quantized to 1/256
(keep ⇔ top-8-bits(u32 draw) >= round(rate·256)), scale 256/(256-drop).
The mask is NOT derived from the jax threefry key — it is seeded from
(key-word0, key-word1, tile index) into the hardware generator — so runs
are reproducible for a fixed key but produce a different (equally valid)
mask stream than the threefry path. Backward regenerates the identical
mask from the same seeds instead of storing a 134 MB u8 mask tensor
(custom_vjp below), saving the mask round-trip HBM traffic too.

CPU note: pallas interpret mode stubs prng_random_bits to zeros, so the
statistical behavior is only testable on a real TPU
(tests/test_pallas_dropout.py gates on the device platform); the VJP
mask-identity and the drop-everything/keep-everything edge cases are what
interpret mode can check.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 1024  # flatten everything to (rows, 1024): dropout is elementwise
_ROWS = 256  # per-tile rows: bf16 tile 512KB in + 512KB out + 1MB u32 bits


def _kernel(seed_ref, x_ref, o_ref, *, drop: int, scale: float):
    # Mosaic caps prng_seed at 2 words — fold the tile index into word 0
    # (Knuth multiplicative hash) to decorrelate tile streams.
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + i * jnp.int32(-1640531535), seed_ref[1])
    bits = pltpu.bitcast(pltpu.prng_random_bits(x_ref.shape), jnp.uint32)
    keep = (bits >> 24) >= jnp.uint32(drop)
    x = x_ref[...]
    o_ref[...] = jnp.where(keep, x * jnp.asarray(scale, x.dtype),
                           jnp.zeros((), x.dtype))


@functools.partial(jax.jit, static_argnames=("drop", "interpret"))
def _apply(x2d, seed, *, drop: int, interpret: bool = False):
    rows = x2d.shape[0]
    scale = 256.0 / (256.0 - drop)
    return pl.pallas_call(
        functools.partial(_kernel, drop=drop, scale=scale),
        grid=(rows // _ROWS,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed, x2d)


def _flatten(x):
    """(…) → (rows, 1024) view + the padded-row count (free bitcast when
    total is a multiple of 1024·_ROWS; otherwise one XLA pad)."""
    total = x.size
    cols = _LANES
    tile = cols * _ROWS
    pad = (-total) % tile
    flat = x.reshape(-1)
    if pad:
        flat = jnp.pad(flat, (0, pad))
    return flat.reshape(-1, cols), total


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def dropout_u8_pallas(x, seed, rate: float, interpret: bool = False):
    """Elementwise dropout with hardware-PRNG masks.

    x: any shape/float dtype; seed: int32[2] (e.g. jax.random.key_data of a
    threefry key); rate: python float drop probability (quantized to 1/256).
    """
    drop = int(round(rate * 256))
    if drop <= 0:
        return x
    if drop >= 256:
        return jnp.zeros_like(x)
    x2d, total = _flatten(x)
    out = _apply(x2d, seed, drop=drop, interpret=interpret)
    return out.reshape(-1)[:total].reshape(x.shape)


def _fwd(x, seed, rate, interpret):
    return dropout_u8_pallas(x, seed, rate, interpret), seed


def _bwd(rate, interpret, seed, g):
    # same seeds + same tile grid ⇒ the regenerated mask is bit-identical,
    # so masking the cotangent equals d/dx of the forward.
    return dropout_u8_pallas(g, seed, rate, interpret), None


dropout_u8_pallas.defvjp(_fwd, _bwd)
