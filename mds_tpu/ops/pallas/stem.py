"""Pallas TPU kernel: full-resolution stride-2 3×3 stem convolution (RGB in).

BiSeNetV2's two stem convs (DetailBranch S1_1 3→64 and StemBlock conv 3→16,
reference lib/models/bisenetv2.py:162,199) cost 3.6 ms of a 9.0 ms deploy
graph on v5e: XLA's conv emitter keeps the 3-wide channel dim on the
128-lane minor axis (2.3% lane utilization) and inserts full-image layout
copies around it. This kernel avoids small-channel layouts entirely:

  * channel planes (H, W) are full-lane layouts built in XLA;
  * the stride-2 **column** access — the part Mosaic has no strided vector
    slice for and XLA lowers to s32 gather machinery — is done with a bit
    trick: the padded bf16 plane is bitcast to u32 so each lane holds a
    (col 2j, col 2j+1) pair; `u << 16` / `u & 0xffff0000` bitcast back to
    f32 are exactly the even/odd columns widened to f32 (bf16 is truncated
    f32). Zero shuffles, zero gathers, pure VPU bit ops;
  * the stride-2 **row** access is static Python-unrolled sublane indexing
    inside the row tile;
  * the conv itself is one 27-row patch matrix per output row (taps
    (dy,dx,c) on sublanes) contracted on the MXU against the (27, O) weight
    matrix — `dot_general(((0,),(0,)))`, the MXU's native lhs-T layout.

Forward-only as a primitive, wrapped in jax.custom_vjp: the backward pass
uses XLA's conv transpose (the stems' backward is off the deploy hot path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xu0, xu1, xu2, w_ref, out_ref, a_ref, *, th: int, w2: int, o: int,
            relu: bool = False):
    """One grid step: th output rows × full output width.

    xu{c}: (1, 1, 2·th+11, w2+1) u32 — bf16 column pairs of the padded
    plane in the SHARED tile geometry (top pad 7 — see _make_tiles; sharing
    one geometry lets XLA CSE this prep across every stem-family kernel
    reading the same image).
    w_ref: (32, No) f32 — rows are taps (dy, dx, c) row-major, zero-padded;
    when BN is folded, row 27 holds the bias (the patch matrix's pad row 27
    is set to ones). out_ref: (1, 1, th, w2, o) f32, or bf16 when fused.
    a_ref: (32, w2) f32 scratch (patch matrix)."""
    planes = []
    for xu in (xu0, xu1, xu2):
        u = xu[0, 0]  # (2th+5, w2+1) u32
        ev = pltpu.bitcast(u << 16, jnp.float32)
        od = pltpu.bitcast(u & jnp.uint32(0xFFFF0000), jnp.float32)
        planes.append((ev, od))
    w = w_ref[:]
    fused = out_ref.dtype == jnp.bfloat16
    # pad rows: kill garbage; row 27 = 1 ⇒ dot adds w[27] = folded BN bias
    a_ref[27:32, :] = jnp.zeros((5, w2), jnp.float32)
    if fused:
        a_ref[27:28, :] = jnp.ones((1, w2), jnp.float32)
    for y in range(th):
        k = 0
        for dy in range(3):
            r = 2 * y + dy + _TILE_PAD_TOP - 1  # shared-tile row base
            for dx in (-1, 0, 1):
                for c in range(3):
                    ev, od = planes[c]
                    if dx == -1:
                        tap = jax.lax.slice(ev, (r, 0), (r + 1, w2))
                    elif dx == 0:
                        tap = jax.lax.slice(od, (r, 0), (r + 1, w2))
                    else:
                        tap = jax.lax.slice(ev, (r, 1), (r + 1, w2 + 1))
                    a_ref[k : k + 1, :] = tap
                    k += 1
        out = jax.lax.dot_general(
            a_ref[:], w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (w2, No)
        if fused:
            # BN scale pre-folded into w; bias added via the ones row; the
            # ReLU rides along and the store truncates to bf16 — no f32
            # full-image intermediate ever reaches HBM
            if relu:
                out = jnp.maximum(out, 0.0)
            out_ref[0, 0, y] = out[:, :o].astype(jnp.bfloat16)
        else:
            # f32 output: the consumer is BatchNorm, which computes in f32 —
            # a bf16 output here forces XLA to materialize a full-image f32
            # convert + layout copy (profiled 1.3 ms); writing f32 costs only
            # the extra HBM bytes (~0.1 ms)
            out_ref[0, 0, y] = out[:, :o]


# Shared tile geometry: top pad 7 image rows, tile height 2·th+11. Sized for
# the deepest consumer (stemblock_fused needs stem rows 8ti−3 … 8ti+9, i.e.
# image rows 16ti−7 … 16ti+19); _kernel reads taps at row base +6 and
# _pair_kernel at +4. ONE geometry for every stem-family kernel so XLA CSE
# collapses the prep chains when multiple kernels consume the same image
# (profiled v5e 2026-08-17: two geometries cost a second full
# pad+bitcast+stack chain + its HBM copy, ~0.9 ms/iter at 1024×2048).
#
# MEASURED NEGATIVE (v5e 2026-08-18): porting _kernel7's row-parity batched
# patch build to this 3×3 family (parity-split tiles + one (32, rows, w2)
# rank-3 stage-A dot replacing the per-row loop) made detail_s1s2_fused
# 1.46 → 1.92 ms and the deploy graph 158 → 148 FPS — at K=32/27 taps the
# per-row patch build is NOT instruction-bound, and the rank-3 dot's
# non-8-aligned free dims (10/12/13 rows) relayout through VMEM. The trick
# only pays at the 7×7 kernel's 147-tap/K=160 scale.
_TILE_PAD_TOP = 7
_TILE_EXTRA = 11  # tile height = 2·th + _TILE_EXTRA


def _make_tiles(x: jax.Array, th: int):
    """Shared tile prep: per-channel padded planes → u32 column pairs →
    overlapping row tiles (stride 2·th; BlockSpec can't express overlap)."""
    b, h, w, _ = x.shape
    h2, w2 = h // 2, w // 2
    n_t = -(-h2 // th)
    height = 2 * th + _TILE_EXTRA
    rows_need = 2 * th * (n_t - 1) + height
    pad_bot = rows_need - (h + _TILE_PAD_TOP)
    tiles_c = []
    for ci in range(3):
        p = jnp.pad(x[..., ci],
                    ((0, 0), (_TILE_PAD_TOP, max(pad_bot, 1)), (1, 1)))
        pu = jax.lax.bitcast_convert_type(
            p.reshape(b, p.shape[1], w2 + 1, 2), jnp.uint32
        )  # (B, Hp, w2+1)
        tiles = jnp.stack(
            [
                jax.lax.slice_in_dim(pu, i * 2 * th, i * 2 * th + height,
                                     axis=1)
                for i in range(n_t)
            ],
            axis=1,
        )  # (B, nT, 2th+11, w2+1)
        tiles_c.append(tiles)
    return tiles_c, n_t, w2


@functools.partial(jax.jit, static_argnames=("th", "interpret", "relu"))
def _stem_fwd(x: jax.Array, k: jax.Array, th: int = 8,
              interpret: bool = False, scale=None, bias=None,
              relu: bool = False) -> jax.Array:
    b, h, w, c = x.shape
    _, _, kc, o = k.shape
    assert c == 3 and kc == 3, (x.shape, k.shape)
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    assert x.dtype == jnp.bfloat16, x.dtype
    fused = scale is not None
    h2, w2 = h // 2, w // 2
    tiles_c, n_t, _ = _make_tiles(x, th)

    no = max(32, -(-o // 32) * 32)
    wm_rows = [k[dy, (dx + 1), ci] for dy in range(3) for dx in (-1, 0, 1)
               for ci in range(3)]
    wm = jnp.stack(wm_rows).astype(jnp.float32)  # (27, O)
    if fused:
        # fold BN: conv·scale + bias ≡ (K·scale-per-O) conv, bias injected
        # through the all-ones pad row 27 of the patch matrix
        wm = wm * scale.astype(jnp.float32)[None, :]
        wm = jnp.concatenate([wm, bias.astype(jnp.float32)[None, :]], axis=0)
    wm = jnp.pad(wm, ((0, 32 - wm.shape[0]), (0, no - o)))

    in_spec = pl.BlockSpec(
        (1, 1, 2 * th + _TILE_EXTRA, w2 + 1), lambda bi, ti: (bi, ti, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_dtype = jnp.bfloat16 if fused else jnp.float32
    out = pl.pallas_call(
        functools.partial(_kernel, th=th, w2=w2, o=o, relu=relu),
        grid=(b, n_t),
        in_specs=[in_spec] * 3 + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (1, 1, th, w2, o), lambda bi, ti: (bi, ti, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_t, th, w2, o), out_dtype),
        scratch_shapes=[pltpu.VMEM((32, w2), jnp.float32)],
        interpret=interpret,
    )(*tiles_c, wm)
    return out.reshape(b, n_t * th, w2, o)[:, :h2]


def _kernel_dma(xu0, xu1, xu2, w_ref, out_ref, b0, b1, b2, a_ref, sems,
                *, th: int, w2: int, o: int, relu: bool, n_t: int):
    """DMA variant: the padded u32 planes stay in HBM (pltpu.ANY); each grid
    step copies its OVERLAPPING (2·th+1)-row window into VMEM itself —
    BlockSpec can't express overlap, and materializing stacked overlapping
    tiles in XLA cost ~64 dynamic-update-slices + 2× HBM traffic per plane
    (profiled: the prep dominated the kernel). Double-buffered: each step
    prefetches tile ti+1 into the other buffer slot before computing, so the
    copies overlap the MXU work (the pipelining BlockSpec would have done)."""
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    rows = b0.shape[1]  # (2·th+1) rounded up to 8 (DMA row alignment)
    bufs = (b0, b1, b2)

    def start(tile, slot):
        for c, xu in enumerate((xu0, xu1, xu2)):
            pltpu.make_async_copy(
                xu.at[bi, pl.ds(tile * 2 * th, rows)], bufs[c].at[slot],
                sems.at[slot],
            ).start()

    def wait(tile, slot):
        for c, xu in enumerate((xu0, xu1, xu2)):
            pltpu.make_async_copy(
                xu.at[bi, pl.ds(tile * 2 * th, rows)], bufs[c].at[slot],
                sems.at[slot],
            ).wait()

    slot = jax.lax.rem(ti, 2)
    nxt = jax.lax.rem(ti + 1, 2)

    @pl.when(ti == 0)
    def _first():
        start(ti, slot)

    @pl.when(ti + 1 < n_t)
    def _prefetch():
        start(ti + 1, nxt)

    w = w_ref[:]
    fused = out_ref.dtype == jnp.bfloat16
    a_ref[27:32, :] = jnp.zeros((5, w2), jnp.float32)
    if fused:
        a_ref[27:28, :] = jnp.ones((1, w2), jnp.float32)
    wait(ti, slot)
    planes = []
    for c in range(3):
        u = bufs[c][slot]
        ev = pltpu.bitcast(u << 16, jnp.float32)
        od = pltpu.bitcast(u & jnp.uint32(0xFFFF0000), jnp.float32)
        planes.append((ev, od))
    for y in range(th):
        k = 0
        for dy in range(3):
            r = 2 * y + dy
            for dx in (-1, 0, 1):
                for c in range(3):
                    ev, od = planes[c]
                    if dx == -1:
                        tap = jax.lax.slice(ev, (r, 0), (r + 1, w2))
                    elif dx == 0:
                        tap = jax.lax.slice(od, (r, 0), (r + 1, w2))
                    else:
                        tap = jax.lax.slice(ev, (r, 1), (r + 1, w2 + 1))
                    a_ref[k : k + 1, :] = tap
                    k += 1
        out = jax.lax.dot_general(
            a_ref[:], w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if fused:
            if relu:
                out = jnp.maximum(out, 0.0)
            out_ref[0, 0, y] = out[:, :o].astype(jnp.bfloat16)
        else:
            out_ref[0, 0, y] = out[:, :o]


@functools.partial(jax.jit, static_argnames=("th", "interpret", "relu"))
def _stem_fwd_dma(x: jax.Array, k: jax.Array, th: int = 8,
                  interpret: bool = False, scale=None, bias=None,
                  relu: bool = False) -> jax.Array:
    b, h, w, c = x.shape
    _, _, kc, o = k.shape
    assert c == 3 and kc == 3, (x.shape, k.shape)
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    assert x.dtype == jnp.bfloat16, x.dtype
    fused = scale is not None
    h2, w2 = h // 2, w // 2
    n_t = -(-h2 // th)

    rows = -(-(2 * th + 1) // 8) * 8  # DMA rows must be 8-aligned
    pad_rows = 2 * (n_t - 1) * th + rows - (h + 1)
    wcols = -(-(w2 + 1) // 128) * 128  # DMA minor dim must be 128-aligned
    planes = []
    for ci in range(3):
        p = jnp.pad(x[..., ci], ((0, 0), (1, 1 + pad_rows), (1, 1)))
        pu = jax.lax.bitcast_convert_type(
            p.reshape(b, p.shape[1], w2 + 1, 2), jnp.uint32
        )  # (B, Hp, w2+1) — stays in HBM, no tile stacking
        pu = jnp.pad(pu, ((0, 0), (0, 0), (0, wcols - (w2 + 1))))
        planes.append(pu)

    no = max(32, -(-o // 32) * 32)
    wm_rows = [k[dy, (dx + 1), ci] for dy in range(3) for dx in (-1, 0, 1)
               for ci in range(3)]
    wm = jnp.stack(wm_rows).astype(jnp.float32)
    if fused:
        wm = wm * scale.astype(jnp.float32)[None, :]
        wm = jnp.concatenate([wm, bias.astype(jnp.float32)[None, :]], axis=0)
    wm = jnp.pad(wm, ((0, 32 - wm.shape[0]), (0, no - o)))

    out_dtype = jnp.bfloat16 if fused else jnp.float32
    out = pl.pallas_call(
        functools.partial(_kernel_dma, th=th, w2=w2, o=o, relu=relu, n_t=n_t),
        grid=(b, n_t),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 3
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (1, 1, th, w2, o), lambda bi, ti: (bi, ti, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_t, th, w2, o), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, rows, wcols), jnp.uint32),
            pltpu.VMEM((2, rows, wcols), jnp.uint32),
            pltpu.VMEM((2, rows, wcols), jnp.uint32),
            pltpu.VMEM((32, w2), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(*planes, wm)
    return out.reshape(b, n_t * th, w2, o)[:, :h2]


def _pair_kernel(xu0, xu1, xu2, w1_ref, w2_ref, b2_ref, out_ref, a_ref, s1_ref,
                 *, th: int, w2: int, n_t: int, relu2: bool):
    """Fused detail-stem pair: S1_1 (3→64, s2, BN+ReLU folded) THEN S1_2
    (64→64, s1, BN+ReLU folded) in one grid step — the S1_1 activation
    never leaves VMEM (profiled v5e: the XLA boundary between the stem
    custom-call and the S1_2 conv cost ~1 ms of layout copies + a 134 MB
    HBM roundtrip, trace 2026-08-17).

    xu{c}: (1, 1, 2·th+11, w2+1) u32 input tiles (shared geometry).
    w1_ref: (32, 64) f32 stage-A patch weights (+ ones-row bias, as in
    _kernel). w2_ref: (9, 64, 64) stage-B tap weights (BN scale folded).
    b2_ref: (1, 64) f32 stage-B bias. s1_ref: (th+2, w2+2, 64) bf16 scratch.
    """
    ti = pl.program_id(1)
    planes = []
    for xu in (xu0, xu1, xu2):
        u = xu[0, 0]
        ev = pltpu.bitcast(u << 16, jnp.float32)
        od = pltpu.bitcast(u & jnp.uint32(0xFFFF0000), jnp.float32)
        planes.append((ev, od))
    w1 = w1_ref[:]
    a_ref[27:32, :] = jnp.zeros((5, w2), jnp.float32)
    a_ref[27:28, :] = jnp.ones((1, w2), jnp.float32)  # folded-BN bias row
    # column halo (S1_2's pad=1)
    s1_ref[:, 0:1, :] = jnp.zeros((th + 2, 1, 64), jnp.bfloat16)
    s1_ref[:, w2 + 1 : w2 + 2, :] = jnp.zeros((th + 2, 1, 64), jnp.bfloat16)
    # stage A: th+2 rows of S1_1 (row j covers S1_1 row 8·ti − 1 + j)
    for j in range(th + 2):
        k = 0
        for dy in range(3):
            r = 2 * j + dy + _TILE_PAD_TOP - 3  # shared-tile row base
            for dx in (-1, 0, 1):
                for c in range(3):
                    ev, od = planes[c]
                    if dx == -1:
                        tap = jax.lax.slice(ev, (r, 0), (r + 1, w2))
                    elif dx == 0:
                        tap = jax.lax.slice(od, (r, 0), (r + 1, w2))
                    else:
                        tap = jax.lax.slice(ev, (r, 1), (r + 1, w2 + 1))
                    a_ref[k : k + 1, :] = tap
                    k += 1
        row = jax.lax.dot_general(
            a_ref[:], w1, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (w2, 64)
        row = jnp.maximum(row, 0.0)
        s1_ref[j, 1 : w2 + 1, :] = row.astype(jnp.bfloat16)
    # row halos outside the image are S1_2 ZERO padding, not conv output
    @pl.when(ti == 0)
    def _top():
        s1_ref[0, :, :] = jnp.zeros((w2 + 2, 64), jnp.bfloat16)

    @pl.when(ti == n_t - 1)
    def _bot():
        s1_ref[th + 1, :, :] = jnp.zeros((w2 + 2, 64), jnp.bfloat16)

    # stage B over the VMEM-resident S1_1 rows. Taps are PAIRED on the
    # contraction axis (two (·,64) taps lane-concatenated into one (·,128)
    # operand): a K=64 dot wastes half the 128-deep MXU, so 9 singles cost
    # 9 array passes where 4 pairs + 1 single cost 5.
    def tap(dy, dx):
        return s1_ref[dy : dy + th, dx : dx + w2, :]

    acc = jnp.broadcast_to(b2_ref[0], (th * w2, 64)).astype(jnp.float32)
    # pairs share dx (same sublane offset — Mosaic can't concat operands
    # whose non-concat offsets differ); dy offsets live on the leading dim
    for dx in range(3):
        lhs = jnp.concatenate([tap(0, dx), tap(1, dx)], axis=-1).reshape(
            th * w2, 128
        )
        w_pair = jnp.concatenate([w2_ref[0 + dx], w2_ref[3 + dx]], axis=0)
        acc = acc + jax.lax.dot_general(
            lhs, w_pair, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc + jax.lax.dot_general(
            tap(2, dx).reshape(th * w2, 64), w2_ref[6 + dx],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if relu2:
        acc = jnp.maximum(acc, 0.0)
    out_ref[0, 0] = acc.reshape(th, w2, 64).astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("th", "interpret", "relu2"))
def stem_s1_pair_fused(x: jax.Array, k1: jax.Array, scale1: jax.Array,
                       bias1: jax.Array, k2: jax.Array, scale2: jax.Array,
                       bias2: jax.Array, th: int = 8,
                       interpret: bool = False, relu2: bool = True) -> jax.Array:
    """DetailBranch S1 pair, deploy-fused: ReLU(BN2(conv3×3_s1(ReLU(BN1(
    conv3×3_s2(x, k1))), k2))) with both eval-BNs folded. x (B,H,W,3) bf16,
    H, W even; k1 (3,3,3,64); k2 (3,3,64,64). → (B,H/2,W/2,64) bf16."""
    b, h, w, c = x.shape
    assert c == 3 and k1.shape == (3, 3, 3, 64) and k2.shape == (3, 3, 64, 64)
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    assert x.dtype == jnp.bfloat16, x.dtype
    h2, w2 = h // 2, w // 2
    n_t = -(-h2 // th)

    # tile ti needs padded input rows [16·ti, 16·ti + 2·th + 5) — top pad 3
    # (1 conv pad + 2 S1_1-halo rows); shared geometry with _stem_fwd
    tiles_c, _, _ = _make_tiles(x, th)

    w1_rows = [k1[dy, (dx + 1), ci] for dy in range(3) for dx in (-1, 0, 1)
               for ci in range(3)]
    w1 = jnp.stack(w1_rows).astype(jnp.float32) * scale1.astype(jnp.float32)
    w1 = jnp.concatenate([w1, bias1.astype(jnp.float32)[None, :]], axis=0)
    w1 = jnp.pad(w1, ((0, 32 - w1.shape[0]), (0, 0)))
    w2m = (
        k2.astype(jnp.float32) * scale2.astype(jnp.float32)
    ).reshape(9, 64, 64).astype(jnp.bfloat16)
    b2 = bias2.astype(jnp.float32).reshape(1, 64)

    in_spec = pl.BlockSpec(
        (1, 1, 2 * th + _TILE_EXTRA, w2 + 1), lambda bi, ti: (bi, ti, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        functools.partial(_pair_kernel, th=th, w2=w2, n_t=n_t, relu2=relu2),
        grid=(b, n_t),
        in_specs=[in_spec] * 3 + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(
            (1, 1, th, w2, 64), lambda bi, ti: (bi, ti, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_t, th, w2, 64), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((32, w2), jnp.float32),
            pltpu.VMEM((th + 2, w2 + 2, 64), jnp.bfloat16),
        ],
        interpret=interpret,
    )(*tiles_c, w1, w2m, b2)
    return out.reshape(b, n_t * th, w2, 64)[:, :h2]


def _detail_kernel(xu0, xu1, xu2, w1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                   out_ref, a_ref, s1_ref, s2_ref,
                   *, th: int, w2: int, n_t: int):
    """Fused detail-branch head: S1_1 (3→64, s2) → S1_2 (64→64, s1) →
    S2_1 (64→64, s2), all with folded eval-BN+ReLU, one grid pass. The
    S1_1 AND S1_2 activations never touch HBM — the unfused graph wrote
    S1_2's 134 MB and paid ~0.54 ms of layout copies at the custom-call ↔
    conv boundary plus the S2_1 conv itself (profiled v5e 2026-08-17).

    Geometry: shared tiles (top pad 7). Stage A computes S1_1 rows
    8ti−2 … 8ti+9 (th+4 rows, j ↔ row 8ti−2+j, tile row base 2);
    stage B computes S1_2 rows 8ti−1 … 8ti+8 (th+2 rows) into a f32
    scratch (strided loads need 32-bit); stage C emits S2_1 rows
    4ti … 4ti+th/2−1. s2_ref cols are shifted +1 (zero halo)."""
    ti = pl.program_id(1)
    th4 = th // 2
    w4 = w2 // 2
    na = th + 4  # S1_1 rows
    nb = th + 2  # S1_2 rows
    planes = []
    for xu in (xu0, xu1, xu2):
        u = xu[0, 0]
        ev = pltpu.bitcast(u << 16, jnp.float32)
        od = pltpu.bitcast(u & jnp.uint32(0xFFFF0000), jnp.float32)
        planes.append((ev, od))
    w1 = w1_ref[:]
    a_ref[27:32, :] = jnp.zeros((5, w2), jnp.float32)
    a_ref[27:28, :] = jnp.ones((1, w2), jnp.float32)  # folded-BN bias row
    s1_ref[:, 0:1, :] = jnp.zeros((na, 1, 64), jnp.bfloat16)
    s1_ref[:, w2 + 1 : w2 + 2, :] = jnp.zeros((na, 1, 64), jnp.bfloat16)
    # stage A: S1_1 row 8ti−2+j reads image rows 16ti−5+2j … 16ti−3+2j =
    # tile rows 2j+2 … 2j+4
    for j in range(na):
        k = 0
        for dy in range(3):
            r = 2 * j + dy + 2
            for dx in (-1, 0, 1):
                for c in range(3):
                    ev, od = planes[c]
                    if dx == -1:
                        tap = jax.lax.slice(ev, (r, 0), (r + 1, w2))
                    elif dx == 0:
                        tap = jax.lax.slice(od, (r, 0), (r + 1, w2))
                    else:
                        tap = jax.lax.slice(ev, (r, 1), (r + 1, w2 + 1))
                    a_ref[k : k + 1, :] = tap
                    k += 1
        row = jax.lax.dot_general(
            a_ref[:], w1, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (w2, 64)
        row = jnp.maximum(row, 0.0)
        s1_ref[j, 1 : w2 + 1, :] = row.astype(jnp.bfloat16)
    # S1_1 rows outside the image are S1_2's ZERO padding
    @pl.when(ti == 0)
    def _top():
        s1_ref[0:2, :, :] = jnp.zeros((2, w2 + 2, 64), jnp.bfloat16)

    @pl.when(ti == n_t - 1)
    def _bot():
        s1_ref[th + 2 :, :, :] = jnp.zeros((2, w2 + 2, 64), jnp.bfloat16)

    # stage B: S1_2 rows (taps PAIRED on the contraction axis — K=64 dots
    # waste half the 128-deep MXU; pairs MUST share dx: a 4-pairs+1-single
    # cross-dx packing was tried in r5 and Mosaic rejects it — "result/
    # input offset mismatch on non-concat dimension" — taps at different
    # column offsets cannot be concatenated on the channel axis without an
    # aligning copy that would cost the saved MXU passes)
    def tap(dy, dx):
        return s1_ref[dy : dy + nb, dx : dx + w2, :]

    acc = jnp.broadcast_to(b2_ref[0], (nb * w2, 64)).astype(jnp.float32)
    for dx in range(3):
        lhs = jnp.concatenate([tap(0, dx), tap(1, dx)], axis=-1).reshape(
            nb * w2, 128
        )
        w_pair = jnp.concatenate([w2_ref[0 + dx], w2_ref[3 + dx]], axis=0)
        acc = acc + jax.lax.dot_general(
            lhs, w_pair, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc + jax.lax.dot_general(
            tap(2, dx).reshape(nb * w2, 64), w2_ref[6 + dx],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    s2_rows = jnp.maximum(acc, 0.0).reshape(nb, w2, 64)
    s2_ref[:, 1 : w2 + 1, :] = s2_rows
    s2_ref[:, 0:1, :] = jnp.zeros((nb, 1, 64), jnp.float32)
    s2_ref[:, w2 + 1 :, :] = jnp.zeros((nb, 1, 64), jnp.float32)
    # S1_2 rows outside the image are S2_1's ZERO padding
    @pl.when(ti == 0)
    def _top2():
        s2_ref[0:1, :, :] = jnp.zeros((1, w2 + 2, 64), jnp.float32)

    @pl.when(ti == n_t - 1)
    def _bot2():
        s2_ref[nb - 1 :, :, :] = jnp.zeros((1, w2 + 2, 64), jnp.float32)

    # stage C: S2_1 (3×3, s2) — /4 row q needs S1_2 rows 2q−1 … 2q+1 =
    # s2_ref rows 2q+dy, col 2p+dx−1 = s2_ref col 2p+dx; taps via
    # (2,2,1)-strided f32 loads, dx∈{0,1} paired to K=128 dots
    acc = jnp.broadcast_to(b3_ref[0], (th4 * w4, 64)).astype(jnp.float32)
    rows3 = lambda dy: slice(dy, dy + 2 * th4 - 1, 2)
    for dy in range(3):
        ta = s2_ref[rows3(dy), 0 : 2 * w4 - 1 : 2, :]  # dx=−1
        tb = s2_ref[rows3(dy), 1 : 2 * w4 : 2, :]      # dx=0
        lhs = jnp.concatenate([ta, tb], axis=-1).astype(jnp.bfloat16)
        w_pair = jnp.concatenate([w3_ref[3 * dy], w3_ref[3 * dy + 1]], axis=0)
        acc = acc + jax.lax.dot_general(
            lhs.reshape(th4 * w4, 128), w_pair, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        t2 = s2_ref[rows3(dy), 2 : 2 + 2 * w4 - 1 : 2, :]  # dx=+1
        acc = acc + jax.lax.dot_general(
            t2.astype(jnp.bfloat16).reshape(th4 * w4, 64), w3_ref[3 * dy + 2],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out = jnp.maximum(acc, 0.0)
    out_ref[0, 0] = out.reshape(th4, w4, 64).astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("th", "interpret"))
def detail_s1s2_fused(x: jax.Array,
                      k1: jax.Array, scale1: jax.Array, bias1: jax.Array,
                      k2: jax.Array, scale2: jax.Array, bias2: jax.Array,
                      k3: jax.Array, scale3: jax.Array, bias3: jax.Array,
                      th: int = 8, interpret: bool = False) -> jax.Array:
    """DetailBranch S1_1+S1_2+S2_1, deploy-fused (see _detail_kernel).
    x (B,H,W,3) bf16, H % (2·th) == 0, W % 4 == 0; k1 (3,3,3,64),
    k2/k3 (3,3,64,64); scale/bias are folded eval-BN coefficients.
    → (B,H/4,W/4,64) bf16."""
    b, h, w, c = x.shape
    assert c == 3 and x.dtype == jnp.bfloat16, (x.shape, x.dtype)
    assert h % (2 * th) == 0 and w % 4 == 0, (h, w, th)
    assert th % 2 == 0, th
    assert k1.shape == (3, 3, 3, 64), k1.shape
    assert k2.shape == k3.shape == (3, 3, 64, 64)
    h4, w4 = h // 4, w // 4
    tiles_c, n_t, w2 = _make_tiles(x, th)

    f32 = jnp.float32
    w1_rows = [k1[dy, (dx + 1), ci] for dy in range(3) for dx in (-1, 0, 1)
               for ci in range(3)]
    w1 = jnp.stack(w1_rows).astype(f32) * scale1.astype(f32)
    w1 = jnp.concatenate([w1, bias1.astype(f32)[None, :]], axis=0)
    w1 = jnp.pad(w1, ((0, 32 - w1.shape[0]), (0, 0)))
    w2m = (
        k2.astype(f32) * scale2.astype(f32)
    ).reshape(9, 64, 64).astype(jnp.bfloat16)
    b2 = bias2.astype(f32).reshape(1, 64)
    w3m = (
        k3.astype(f32) * scale3.astype(f32)
    ).reshape(9, 64, 64).astype(jnp.bfloat16)
    b3 = bias3.astype(f32).reshape(1, 64)

    in_spec = pl.BlockSpec(
        (1, 1, 2 * th + _TILE_EXTRA, w2 + 1), lambda bi, ti: (bi, ti, 0, 0),
        memory_space=pltpu.VMEM,
    )
    w_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    th4 = th // 2
    out = pl.pallas_call(
        functools.partial(_detail_kernel, th=th, w2=w2, n_t=n_t),
        grid=(b, n_t),
        in_specs=[in_spec] * 3 + [w_spec] * 5,
        out_specs=pl.BlockSpec(
            (1, 1, th4, w4, 64), lambda bi, ti: (bi, ti, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_t, th4, w4, 64), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((32, w2), jnp.float32),
            pltpu.VMEM((th + 4, w2 + 2, 64), jnp.bfloat16),
            pltpu.VMEM((th + 2, w2 + 2, 64), jnp.float32),
        ],
        # th=16 at W=2048 needs ~27 MB of scoped VMEM (f32 S1_2 scratch
        # dominates) — above Mosaic's 16 MB default, well under the 128 MB
        # physical VMEM; the bigger tile halves the per-tile halo recompute
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=40 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*tiles_c, w1, w2m, b2, w3m, b3)
    return out.reshape(b, h4, w4, 64)


def _stemblock_kernel(xu0, xu1, xu2, wm_ref, l1w_ref, l1b_ref, l2w_ref,
                      l2b_ref, fw_ref, fb_ref, out_ref, a_ref, st_ref,
                      c_ref, *, th4: int, w2: int, n_t: int):
    """Fully fused BiSeNetV2 StemBlock (reference lib/models/bisenetv2.py:
    192-229), eval-mode: stem conv(3→16, s2) → {left: 1×1(16→8) →
    3×3 s2(8→16) ‖ right: maxpool 3×3 s2} → concat → fuse conv 3×3(32→16),
    every BN folded, every intermediate VMEM-resident. The unfused XLA
    graph pays ~1.3 ms at 1024×2048 on v5e for this block (8/16/32-channel
    ops are lane-starved and layout-copy-happy; profiled 2026-08-17).

    One grid step emits th4 rows at /4 resolution (th4 = th//2 of the
    shared tile geometry). Channels live on LANES; the stem + left_1
    activations sit UNSPLIT in one f32 scratch st_ref (rows, w2+2, 24)
    (lanes [s 16 | t 8], cols shifted +1 for the zero halo) because of a
    Mosaic constraint probed on v5e (2026-08-17): strided loads exist only
    for 32-bit data with unit lane stride — f32 (2,2,1)-strided taps are
    legal, while neither bf16 refs nor in-register values stride at all.

    c_ref (th4+2, w4+2, 32) bf16: concat [left2 | maxpool] rows + halo."""
    ti = pl.program_id(1)
    w4 = w2 // 2
    ns = 2 * th4 + 5  # stem rows per tile
    planes = []
    for xu in (xu0, xu1, xu2):
        u = xu[0, 0]
        ev = pltpu.bitcast(u << 16, jnp.float32)
        od = pltpu.bitcast(u & jnp.uint32(0xFFFF0000), jnp.float32)
        planes.append((ev, od))
    wm = wm_ref[:]
    l1w = l1w_ref[:]
    a_ref[27:32, :] = jnp.zeros((5, w2), jnp.float32)
    a_ref[27:28, :] = jnp.ones((1, w2), jnp.float32)  # folded-BN bias row
    # stage A: stem conv rows (stem row 8ti−3+j reads image rows 16ti−7+2j …
    # 16ti−5+2j = tile rows 2j … 2j+2; the shared tiles start at 16ti−7),
    # immediately followed by left_1
    for j in range(ns):
        k = 0
        for dy in range(3):
            r = 2 * j + dy
            for dx in (-1, 0, 1):
                for c in range(3):
                    ev, od = planes[c]
                    if dx == -1:
                        tap = jax.lax.slice(ev, (r, 0), (r + 1, w2))
                    elif dx == 0:
                        tap = jax.lax.slice(od, (r, 0), (r + 1, w2))
                    else:
                        tap = jax.lax.slice(ev, (r, 1), (r + 1, w2 + 1))
                    a_ref[k : k + 1, :] = tap
                    k += 1
        row = jax.lax.dot_general(
            a_ref[:], wm, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (w2, 32)
        s16 = jnp.maximum(row[:, :16], 0.0)
        # left_1: 1×1 conv 16→8 (+folded BN, ReLU); out-of-image rows are
        # zeroed below so left_2 sees its zero padding, not relu(b1)
        t8 = jax.lax.dot_general(
            s16.astype(jnp.bfloat16), l1w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + l1b_ref[0]
        t8 = jnp.maximum(t8, 0.0)
        st_ref[j, 1 : w2 + 1, :] = jnp.concatenate([s16, t8], axis=-1)
    # col halo (stem col −1 / w2 ≡ zero: conv pad for left_2/maxpool)
    st_ref[:, 0:1, :] = jnp.zeros((ns, 1, 24), jnp.float32)
    st_ref[:, w2 + 1 :, :] = jnp.zeros((ns, 1, 24), jnp.float32)
    # stem rows outside the image are zero (top/bottom edges), not
    # relu(folded-bias): first real stem row is j=3 at ti=0; rows ≥ 2·th4+3
    # of the LAST tile are past h2 (h2 % (2·th4) == 0 asserted by caller)
    @pl.when(ti == 0)
    def _top():
        st_ref[0:3, :, :] = jnp.zeros((3, w2 + 2, 24), jnp.float32)

    @pl.when(ti == n_t - 1)
    def _bot():
        st_ref[2 * th4 + 3 :, :, :] = jnp.zeros((2, w2 + 2, 24), jnp.float32)

    nm = th4 + 2  # /4 rows incl. fuse halo
    # taps: /4 row m, col p ← stem row 2m+dy−3+…, stem col 2p+dx−1 ↔
    # st_ref[2m+dy, 2p+dx] (col shift +1) — one (2,2,1)-strided f32 load
    # per (dy,dx), s-part → maxpool, t-part → left_2
    mp = None
    l2acc = jnp.broadcast_to(l2b_ref[0], (nm * w4, 16)).astype(jnp.float32)
    for dy in range(3):
        l2parts = []
        for dx in range(3):
            tap = st_ref[dy : dy + 2 * nm - 1 : 2,
                         dx : dx + 2 * w4 - 1 : 2, :]
            m = tap[:, :, :16]
            mp = m if mp is None else jnp.maximum(mp, m)
            l2parts.append(tap[:, :, 16:24].astype(jnp.bfloat16))
        # left_2 taps lane-concat per dy in (dx, c) order → (nm, w4, 24)
        l2acc = l2acc + jax.lax.dot_general(
            jnp.concatenate(l2parts, axis=-1).reshape(nm * w4, 24),
            l2w_ref[dy], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    l2 = jnp.maximum(l2acc, 0.0).astype(jnp.bfloat16).reshape(nm, w4, 16)
    c_ref[:, 1 : w4 + 1, :] = jnp.concatenate(
        [l2, mp.astype(jnp.bfloat16)], axis=-1
    )
    c_ref[:, 0:1, :] = jnp.zeros((nm, 1, 32), jnp.bfloat16)
    c_ref[:, w4 + 1 :, :] = jnp.zeros((nm, 1, 32), jnp.bfloat16)
    # fuse conv's top/bottom zero padding replaces the out-of-image halo row
    @pl.when(ti == 0)
    def _topc():
        c_ref[0:1, :, :] = jnp.zeros((1, w4 + 2, 32), jnp.bfloat16)

    @pl.when(ti == n_t - 1)
    def _botc():
        c_ref[nm - 1 :, :, :] = jnp.zeros((1, w4 + 2, 32), jnp.bfloat16)

    # fuse: 3×3 s1 conv 32→16 (+folded BN, ReLU)
    acc = jnp.broadcast_to(fb_ref[0], (th4 * w4, 16)).astype(jnp.float32)
    for dx in range(3):
        lhs = jnp.concatenate(
            [c_ref[dy : dy + th4, dx : dx + w4, :] for dy in range(3)],
            axis=-1,
        )
        acc = acc + jax.lax.dot_general(
            lhs.reshape(th4 * w4, 96), fw_ref[dx],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out = jnp.maximum(acc, 0.0)
    out_ref[0, 0] = out.reshape(th4, w4, 16).astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("th", "interpret"))
def stemblock_fused(x: jax.Array,
                    k_s: jax.Array, scale_s: jax.Array, bias_s: jax.Array,
                    k_l1: jax.Array, scale_l1: jax.Array, bias_l1: jax.Array,
                    k_l2: jax.Array, scale_l2: jax.Array, bias_l2: jax.Array,
                    k_f: jax.Array, scale_f: jax.Array, bias_f: jax.Array,
                    th: int = 8, interpret: bool = False) -> jax.Array:
    """BiSeNetV2 StemBlock, deploy-fused (see _stemblock_kernel). x
    (B,H,W,3) bf16, H % (2·th) == 0 and W % 4 == 0; k_s (3,3,3,16),
    k_l1 (1,1,16,8), k_l2 (3,3,8,16), k_f (3,3,32,16); scale/bias are the
    folded eval-BN coefficients per conv. → (B,H/4,W/4,16) bf16."""
    b, h, w, c = x.shape
    assert c == 3 and x.dtype == jnp.bfloat16, (x.shape, x.dtype)
    assert h % (2 * th) == 0 and w % 4 == 0, (h, w, th)
    assert k_s.shape == (3, 3, 3, 16) and k_l1.shape == (1, 1, 16, 8)
    assert k_l2.shape == (3, 3, 8, 16) and k_f.shape == (3, 3, 32, 16)
    assert th % 2 == 0, th
    th4 = th // 2
    h4, w4 = h // 4, w // 4
    tiles_c, n_t, w2 = _make_tiles(x, th)

    f32 = jnp.float32
    wm_rows = [k_s[dy, (dx + 1), ci] for dy in range(3) for dx in (-1, 0, 1)
               for ci in range(3)]
    wm = jnp.stack(wm_rows).astype(f32) * scale_s.astype(f32)
    wm = jnp.concatenate([wm, bias_s.astype(f32)[None, :]], axis=0)
    wm = jnp.pad(wm, ((0, 32 - wm.shape[0]), (0, 16)))  # (32, 32)

    l1w = (k_l1[0, 0].astype(f32) * scale_l1.astype(f32)).astype(jnp.bfloat16)
    l1b = bias_l1.astype(f32).reshape(1, 8)
    # left_2 taps are lane-concatenated per dy in (dx, c) order
    l2w = jnp.stack(
        [
            jnp.concatenate(
                [k_l2[dy, dx].astype(f32) * scale_l2.astype(f32)
                 for dx in range(3)], axis=0
            )
            for dy in range(3)
        ]
    ).astype(jnp.bfloat16)  # (3, 24, 16)
    l2b = bias_l2.astype(f32).reshape(1, 16)
    fw = jnp.stack(
        [
            jnp.concatenate(
                [k_f[dy, dx].astype(f32) * scale_f.astype(f32)
                 for dy in range(3)], axis=0
            )
            for dx in range(3)
        ]
    ).astype(jnp.bfloat16)  # (3, 96, 16)
    fb = bias_f.astype(f32).reshape(1, 16)

    in_spec = pl.BlockSpec(
        (1, 1, 2 * th + _TILE_EXTRA, w2 + 1), lambda bi, ti: (bi, ti, 0, 0),
        memory_space=pltpu.VMEM,
    )
    w_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_stemblock_kernel, th4=th4, w2=w2, n_t=n_t),
        grid=(b, n_t),
        in_specs=[in_spec] * 3 + [w_spec] * 7,
        out_specs=pl.BlockSpec(
            (1, 1, th4, w4, 16), lambda bi, ti: (bi, ti, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_t, th4, w4, 16), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((32, w2), jnp.float32),
            pltpu.VMEM((2 * th4 + 5, w2 + 2, 24), jnp.float32),
            pltpu.VMEM((th4 + 2, w4 + 2, 32), jnp.bfloat16),
        ],
        # th=16 at W=2048 needs ~18 MB scoped VMEM (f32 stem scratch);
        # above the 16 MB default, trivial vs 128 MB physical
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=40 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*tiles_c, wm, l1w, l1b, l2w, l2b, fw, fb)
    return out.reshape(b, h4, w4, 16)


def _kernel7(xe0, xo0, xe1, xo1, xe2, xo2, w_ref, out_ref, a_ref,
             *, th: int, w2: int, o: int, relu: bool):
    """7×7 stride-2 RGB stem conv (ResNet18 conv1 — reference
    lib/models/resnet.py:60-66, resnet_pyramid.py:267-300), folded eval-BN
    (+optional ReLU), bf16 out. Same u32 column-pair bit trick as _kernel,
    but a DEDICATED tile geometry (pad 3, height 2·th+5, u32 width w2+3):
    BiSeNetV1/SwiftNet graphs have no 3×3 stem consumer to CSE with, and
    XLA's own lowering of this conv costs ~2.7 ms + ~2.4 ms of layout
    copies at 1024×2048 on v5e (45% of the whole V1 deploy graph,
    profiled 2026-08-18) for a 10 GFLOP op.

    Patch rows are (dy, dx, c) row-major: 147 taps, row 147 = ones (folded
    bias), padded to 160. Input tiles come ROW-PARITY-SPLIT from XLA
    (xu{c} = (even, odd) row buffers), so the tap for (dy, dxi, c) is ONE
    (th, w2) unit-stride slice covering every output row at once — the
    first version's per-row patch build issued 147·th small slice/stores
    per tile and was instruction-bound at ~1.3 ms per 1024×2048 conv
    (~6× its dot-bound). Out row y reads parity dy%2 row y+dy//2; out col
    x reads padded col 2x+dxi ⇒ ev(x+dxi//2) / od(...) for even/odd dxi."""
    planes = []  # [c][parity] → (ev, od) column planes
    for xe, xo in ((xe0, xo0), (xe1, xo1), (xe2, xo2)):
        pr = []
        for xu in (xe, xo):
            u = xu[0, 0]
            pr.append(
                (
                    pltpu.bitcast(u << 16, jnp.float32),
                    pltpu.bitcast(u & jnp.uint32(0xFFFF0000), jnp.float32),
                )
            )
        planes.append(pr)
    w = w_ref[:]
    a_ref[147:148] = jnp.ones((1, th, w2), jnp.bfloat16)
    a_ref[148:160] = jnp.zeros((12, th, w2), jnp.bfloat16)
    k = 0
    for dy in range(7):
        ro = dy // 2
        for dxi in range(7):
            off = dxi // 2
            for c in range(3):
                ev, od = planes[c][dy % 2]
                pl_ = ev if dxi % 2 == 0 else od
                a_ref[k] = jax.lax.slice(
                    pl_, (ro, off), (ro + th, off + w2)
                ).astype(jnp.bfloat16)
                k += 1
    out = jax.lax.dot_general(
        a_ref[:], w, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (th, w2, No)
    if relu:
        out = jnp.maximum(out, 0.0)
    out_ref[0, 0] = out[:, :, :o].astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("th", "relu", "interpret"))
def stem7_conv_bn_relu_s2(x: jax.Array, k: jax.Array, scale: jax.Array,
                          bias: jax.Array, th: int = 8, relu: bool = True,
                          interpret: bool = False) -> jax.Array:
    """Fused 7×7/s2/p3 RGB conv + folded eval-BN (+ReLU), bf16.
    x (B,H,W,3) bf16 (H, W even); k (7,7,3,O≤128); → (B,H/2,W/2,O) bf16."""
    b, h, w, c = x.shape
    _, _, kc, o = k.shape
    assert c == 3 and kc == 3 and k.shape[:2] == (7, 7), (x.shape, k.shape)
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    assert x.dtype == jnp.bfloat16, x.dtype
    h2, w2 = h // 2, w // 2
    n_t = -(-h2 // th)
    # padded rows needed: out row Y reads padded rows 2Y+dy (pad_top 3);
    # Y_max = th·n_t−1 ⇒ Hp ≥ 2·th·n_t+5. Row-parity split: even buffer
    # row k ↔ padded row 2k (tile slice [th·ti, th·ti+th+3)), odd row k ↔
    # 2k+1 (tile slice [th·ti, th·ti+th+2)).
    pad_bot = max(2 * th * n_t + 5 - (h + 3), 3)
    tiles = []
    for ci in range(3):
        p = jnp.pad(x[..., ci], ((0, 0), (3, pad_bot), (3, 3)))
        pu = jax.lax.bitcast_convert_type(
            p.reshape(b, p.shape[1], w2 + 3, 2), jnp.uint32
        )  # (B, Hp, w2+3)
        for par, rows in ((0, th + 3), (1, th + 2)):
            pp = pu[:, par::2]
            tiles.append(
                jnp.stack(
                    [
                        jax.lax.slice_in_dim(
                            pp, i * th, i * th + rows, axis=1
                        )
                        for i in range(n_t)
                    ],
                    axis=1,
                )
            )

    f32 = jnp.float32
    no = max(32, -(-o // 32) * 32)
    wm_rows = [k[dy, dxi, ci] for dy in range(7) for dxi in range(7)
               for ci in range(3)]
    wm = jnp.stack(wm_rows).astype(f32) * scale.astype(f32)[None, :]
    wm = jnp.concatenate([wm, bias.astype(f32)[None, :]], axis=0)  # (148, O)
    wm = jnp.pad(wm, ((0, 160 - wm.shape[0]), (0, no - o)))
    wm = wm.astype(jnp.bfloat16)

    in_specs = [
        pl.BlockSpec(
            (1, 1, rows, w2 + 3), lambda bi, ti: (bi, ti, 0, 0),
            memory_space=pltpu.VMEM,
        )
        for _ in range(3)
        for rows in (th + 3, th + 2)
    ]
    out = pl.pallas_call(
        functools.partial(_kernel7, th=th, w2=w2, o=o, relu=relu),
        grid=(b, n_t),
        in_specs=in_specs + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (1, 1, th, w2, o), lambda bi, ti: (bi, ti, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_t, th, w2, o), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((160, th, w2), jnp.bfloat16)],
        interpret=interpret,
    )(*tiles, wm)
    return out.reshape(b, n_t * th, w2, o)[:, :h2]


def _tail_kernel(x_ref, w4_ref, b4_ref, w5_ref, b5_ref, w6_ref, b6_ref,
                 w7_ref, b7_ref, w8_ref, b8_ref, out_ref,
                 s22, s23, s31, s32, *, t8: int, w4: int, n_t: int):
    """Fused DetailBranch tail: S2_2 → S2_3 → S3_1(s2) → S3_2 → S3_3
    (reference lib/models/bisenetv2.py:156-189), every BN folded, every
    intermediate VMEM-resident. Consumes the /4-res 64-ch output of
    detail_s1s2_fused from HBM (column-padded tiles) and emits the /8-res
    128-ch detail feature the BGA consumes.

    One grid step emits t8 rows at /8. Row provenance (global indices):
      out m ∈ [t8·ti, t8·ti+t8) ← S3_2 rows [t8·ti−1, t8·ti+t8]
      ← S3_1 rows [t8·ti−2, t8·ti+t8+1] ← S2_3 /4 rows [2t8·ti−5, …+2t8+3]
      ← S2_2 [2t8·ti−6, …+2t8+4] ← input [2t8·ti−7, …+2t8+5] (2t8+13 rows).
    Scratch row j ↔ global (first row above) + j per stage. s23 is f32:
    S3_1's (2,2,1)-strided taps exist only for 32-bit data (Mosaic probe,
    see _stemblock_kernel docstring); the other scratches are bf16.
    Stage D/E run in 9-row chunks so the (rows·w4, 128) pair temporaries
    stay ~1 MB (VMEM is ~16 MB and the persistent scratches use ~9)."""
    ti = pl.program_id(1)
    w8w = w4 // 2
    nd, ne, nf, ng = 2 * t8 + 11, 2 * t8 + 9, t8 + 4, t8 + 2

    def dot(lhs, w):
        return jax.lax.dot_general(
            lhs, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # --- stages D/E: 3×3 s1 64→64 convs, dy-pairs on K=128, 9-row chunks.
    # (A K=192 lhs + (192,192) dx-block rhs variant — one dot per chunk,
    # 4 MXU passes instead of 6 — was MEASURED SLOWER standalone on v5e,
    # 2.01 vs 1.41 ms: the 64/128-lane-offset slice-adds it needs cost lane
    # rotations that outweigh the saved passes. Keep the pair scheme.)
    def conv64_pairs(read, w_ref, b_ref, n_rows, dst, dst_dtype):
        # dy-pairs on K=128, 9-row chunks. Two rejected alternatives,
        # both MEASURED on v5e 2026-08-18 (standalone chained loop,
        # (1,256,512,64) input): (a) K=192 lhs + (192,192) dx-block rhs —
        # 4 MXU passes instead of 6 but the 64/128-lane-offset slice-adds
        # relayout through VMEM: 2.01 vs 1.41 ms; (b) dy-pair × dx-pair
        # (K=128, N=128) with one 64-lane shifted add — Mosaic spills ~70 MB
        # of scoped VMEM on the misaligned N-half adds and refuses to
        # compile at 1024×2048. Plain pairs win.
        wp = [jnp.concatenate([w_ref[dx], w_ref[3 + dx]], axis=0)
              for dx in range(3)]
        chunk = 9
        for r0 in range(0, n_rows, chunk):
            rows = min(chunk, n_rows - r0)
            acc = jnp.broadcast_to(b_ref[0], (rows * w4, 64)).astype(
                jnp.float32
            )
            for dx in range(3):
                pair = jnp.concatenate(
                    [read(r0, dx, rows, w4), read(r0 + 1, dx, rows, w4)],
                    axis=-1,
                ).reshape(rows * w4, 128)
                acc = acc + dot(pair, wp[dx])
                acc = acc + dot(
                    read(r0 + 2, dx, rows, w4).reshape(rows * w4, 64),
                    w_ref[6 + dx],
                )
            # always round through bf16 (what the unfused chain emits);
            # f32 dst (s23, strided-load constraint) stores the widened
            # bf16-rounded value
            dst[r0 : r0 + rows, 1 : w4 + 1, :] = (
                jnp.maximum(acc, 0.0)
                .astype(jnp.bfloat16)
                .astype(dst_dtype)
                .reshape(rows, w4, 64)
            )

    conv64_pairs(
        lambda r, dx, rows, w: x_ref[0, 0, r : r + rows, dx : dx + w, :],
        w4_ref, b4_ref, nd, s22, jnp.bfloat16,
    )
    s22[:, 0:1, :] = jnp.zeros((nd, 1, 64), jnp.bfloat16)
    s22[:, w4 + 1 :, :] = jnp.zeros((nd, 1, 64), jnp.bfloat16)
    # rows computed from the stack's zero padding are relu(bias) garbage —
    # S2_3's out-of-image padding must be ZERO
    @pl.when(ti == 0)
    def _d_top():
        s22[0:6, :, :] = jnp.zeros((6, w4 + 2, 64), jnp.bfloat16)

    @pl.when(ti == n_t - 1)
    def _d_bot():
        s22[nd - 5 :, :, :] = jnp.zeros((5, w4 + 2, 64), jnp.bfloat16)

    # --- stage E: S2_3 (3×3 s1, 64→64) → f32 scratch for strided loads ---
    conv64_pairs(
        lambda r, dx, rows, w: s22[r : r + rows, dx : dx + w, :],
        w5_ref, b5_ref, ne, s23, jnp.float32,
    )
    s23[:, 0:1, :] = jnp.zeros((ne, 1, 64), jnp.float32)
    s23[:, w4 + 1 :, :] = jnp.zeros((ne, 1, 64), jnp.float32)

    @pl.when(ti == 0)
    def _e_top():
        s23[0:5, :, :] = jnp.zeros((5, w4 + 2, 64), jnp.float32)

    @pl.when(ti == n_t - 1)
    def _e_bot():
        # s23 row jj ↔ global /4 row 2t8·ti−5+jj ⇒ out-of-image starts at
        # jj = 2t8+5 = ne−4 on the last tile
        s23[ne - 4 :, :, :] = jnp.zeros((4, w4 + 2, 64), jnp.float32)

    # --- stage F: S3_1 (3×3 s2, 64→128) — (2,2,1)-strided f32 taps,
    # dx∈{0,1} paired to K=128 (same scheme as _detail_kernel stage C) ---
    rows3 = lambda dy: slice(dy, dy + 2 * nf - 1, 2)
    acc = jnp.broadcast_to(b6_ref[0], (nf * w8w, 128)).astype(jnp.float32)
    for dy in range(3):
        ta = s23[rows3(dy), 0 : 2 * w8w - 1 : 2, :]
        tb = s23[rows3(dy), 1 : 2 * w8w : 2, :]
        lhs = jnp.concatenate([ta, tb], axis=-1).astype(jnp.bfloat16)
        wp = jnp.concatenate([w6_ref[3 * dy], w6_ref[3 * dy + 1]], axis=0)
        acc = acc + dot(lhs.reshape(nf * w8w, 128), wp)
        t2 = s23[rows3(dy), 2 : 2 + 2 * w8w - 1 : 2, :]
        acc = acc + dot(
            t2.astype(jnp.bfloat16).reshape(nf * w8w, 64), w6_ref[3 * dy + 2]
        )
    s31[:, 1 : w8w + 1, :] = (
        jnp.maximum(acc, 0.0).reshape(nf, w8w, 128).astype(jnp.bfloat16)
    )
    s31[:, 0:1, :] = jnp.zeros((nf, 1, 128), jnp.bfloat16)
    s31[:, w8w + 1 :, :] = jnp.zeros((nf, 1, 128), jnp.bfloat16)

    @pl.when(ti == 0)
    def _f_top():
        s31[0:2, :, :] = jnp.zeros((2, w8w + 2, 128), jnp.bfloat16)

    @pl.when(ti == n_t - 1)
    def _f_bot():
        s31[nf - 2 :, :, :] = jnp.zeros((2, w8w + 2, 128), jnp.bfloat16)

    # --- stage G: S3_2 (3×3 s1, 128→128) — K=128 native, 9 plain dots ---
    acc = jnp.broadcast_to(b7_ref[0], (ng * w8w, 128)).astype(jnp.float32)
    for dy in range(3):
        for dx in range(3):
            acc = acc + dot(
                s31[dy : dy + ng, dx : dx + w8w, :].reshape(ng * w8w, 128),
                w7_ref[3 * dy + dx],
            )
    s32[:, 1 : w8w + 1, :] = (
        jnp.maximum(acc, 0.0).reshape(ng, w8w, 128).astype(jnp.bfloat16)
    )
    s32[:, 0:1, :] = jnp.zeros((ng, 1, 128), jnp.bfloat16)
    s32[:, w8w + 1 :, :] = jnp.zeros((ng, 1, 128), jnp.bfloat16)

    @pl.when(ti == 0)
    def _g_top():
        s32[0:1, :, :] = jnp.zeros((1, w8w + 2, 128), jnp.bfloat16)

    @pl.when(ti == n_t - 1)
    def _g_bot():
        s32[ng - 1 :, :, :] = jnp.zeros((1, w8w + 2, 128), jnp.bfloat16)

    # --- stage H: S3_3 (3×3 s1, 128→128) → output tile ---
    acc = jnp.broadcast_to(b8_ref[0], (t8 * w8w, 128)).astype(jnp.float32)
    for dy in range(3):
        for dx in range(3):
            acc = acc + dot(
                s32[dy : dy + t8, dx : dx + w8w, :].reshape(t8 * w8w, 128),
                w8_ref[3 * dy + dx],
            )
    out_ref[0, 0] = (
        jnp.maximum(acc, 0.0).reshape(t8, w8w, 128).astype(jnp.bfloat16)
    )


@functools.partial(jax.jit, static_argnames=("t8", "interpret"))
def detail_tail_fused(y: jax.Array,
                      k4: jax.Array, scale4: jax.Array, bias4: jax.Array,
                      k5: jax.Array, scale5: jax.Array, bias5: jax.Array,
                      k6: jax.Array, scale6: jax.Array, bias6: jax.Array,
                      k7: jax.Array, scale7: jax.Array, bias7: jax.Array,
                      k8: jax.Array, scale8: jax.Array, bias8: jax.Array,
                      t8: int = 8, interpret: bool = False) -> jax.Array:
    """DetailBranch S2_2+S2_3+S3_1+S3_2+S3_3, deploy-fused (_tail_kernel).
    y (B,H4,W4,64) bf16 (the detail_s1s2_fused output), H4 % (2·t8) == 0,
    W4 % 2 == 0; k4/k5 (3,3,64,64), k6 (3,3,64,128) stride-2,
    k7/k8 (3,3,128,128); scale/bias are folded eval-BN coefficients.
    → (B,H4/2,W4/2,128) bf16."""
    b, h4, w4, c = y.shape
    assert c == 64 and y.dtype == jnp.bfloat16, (y.shape, y.dtype)
    assert h4 % (2 * t8) == 0 and w4 % 2 == 0, (h4, w4, t8)
    assert k4.shape == k5.shape == (3, 3, 64, 64)
    assert k6.shape == (3, 3, 64, 128)
    assert k7.shape == k8.shape == (3, 3, 128, 128)
    h8, w8 = h4 // 2, w4 // 2
    n_t = h8 // t8
    height = 2 * t8 + 13
    # top pad 7 (see _tail_kernel row provenance); bottom always needs 6
    yp = jnp.pad(y, ((0, 0), (7, 6), (1, 1), (0, 0)))
    tiles = jnp.stack(
        [
            jax.lax.slice_in_dim(yp, i * 2 * t8, i * 2 * t8 + height, axis=1)
            for i in range(n_t)
        ],
        axis=1,
    )  # (B, n_t, 2t8+13, w4+2, 64)

    f32 = jnp.float32

    def wm(k, s):
        return (
            (k.astype(f32) * s.astype(f32))
            .reshape(9, k.shape[2], k.shape[3])
            .astype(jnp.bfloat16)
        )

    def bm(bias):
        return bias.astype(f32).reshape(1, -1)

    in_spec = pl.BlockSpec(
        (1, 1, height, w4 + 2, 64), lambda bi, ti: (bi, ti, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    w_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_tail_kernel, t8=t8, w4=w4, n_t=n_t),
        grid=(b, n_t),
        in_specs=[in_spec] + [w_spec] * 10,
        out_specs=pl.BlockSpec(
            (1, 1, t8, w8, 128), lambda bi, ti: (bi, ti, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_t, t8, w8, 128), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2 * t8 + 11, w4 + 2, 64), jnp.bfloat16),
            pltpu.VMEM((2 * t8 + 9, w4 + 2, 64), jnp.float32),
            pltpu.VMEM((t8 + 4, w8 + 2, 128), jnp.bfloat16),
            pltpu.VMEM((t8 + 2, w8 + 2, 128), jnp.bfloat16),
        ],
        # t8=8 at W=2048 peaks at ~19 MB of scoped VMEM (persistent
        # scratches ~9 MB + double-buffered input tiles + chunk
        # temporaries) — above Mosaic's 16 MB default but well under the
        # physical VMEM; raise the cap rather than shrink the tile (t8=4
        # costs ~30% redundant halo MACs)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=28 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        tiles, wm(k4, scale4), bm(bias4), wm(k5, scale5), bm(bias5),
        wm(k6, scale6), bm(bias6), wm(k7, scale7), bm(bias7),
        wm(k8, scale8), bm(bias8),
    )
    return out.reshape(b, h8, w8, 128)


def _plain(x, k):
    return jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@jax.custom_vjp
def stem_conv3x3_s2(x: jax.Array, k: jax.Array) -> jax.Array:
    """conv(k=3, s=2, pad=1) on a 3-channel bf16 NHWC input via the Pallas
    stem kernel. x (B,H,W,3) bf16, H,W even; k (3,3,3,O). → (B,H/2,W/2,O)."""
    return _stem_fwd(x, k, th=_STEM_TH,
                     interpret=jax.default_backend() != "tpu")


# Measured in-graph on v5e (bench.py, 2026-08-17): "tiles" 123.6 FPS vs
# "dma" 118.0 FPS end-to-end — XLA overlaps/fuses the stacked-tile prep
# better than the in-kernel window DMAs (which also pay a 1025→1152-col pad
# of the u32 planes). "dma" kept for shapes where the prep DUS chain blows
# up (very tall images).
_STEM_VARIANT = "tiles"  # "tiles" | "dma"

# Output rows per grid step (at the /2 resolution). One global so every
# stem-family kernel keeps the SAME tile geometry (the CSE contract above).
# th=16 since r5 (needs the raised scoped-vmem caps on the fused kernels):
# halves the per-tile halo recompute — measured in-graph on v5e 2026-08-21,
# BiSeNetV2 deploy 156.6 → 164.5 FPS, BiSeNetV1 ~157 → 161.4 FPS.
_STEM_TH = 16


def set_stem_variant(v: str) -> None:
    assert v in ("dma", "tiles"), v
    global _STEM_VARIANT
    _STEM_VARIANT = v


def set_stem_th(th: int) -> None:
    global _STEM_TH
    _STEM_TH = int(th)


def get_stem_th() -> int:
    return _STEM_TH


def stem_conv_bn_relu_s2(x: jax.Array, k: jax.Array, scale: jax.Array,
                         bias: jax.Array, relu: bool = True) -> jax.Array:
    """Deploy-fused stem: conv(3×3, s=2) → ·scale + bias → [ReLU], emitted
    directly as bf16 by the Pallas kernel (no f32 full-image intermediate —
    the eval-mode BN is folded into the conv weights, the bias rides the
    patch matrix's ones row, and the ReLU + bf16 store happen in-register).
    Eval/inference only (no VJP). scale/bias are the folded BN coefficients:
    scale = γ·rsqrt(var+eps), bias = β − mean·scale."""
    interp = jax.default_backend() != "tpu"
    impl = _stem_fwd_dma if (_STEM_VARIANT == "dma" and not interp) else _stem_fwd
    return impl(x, k, th=_STEM_TH, interpret=interp, scale=scale,
                bias=bias, relu=relu)


def _fwd(x, k):
    return stem_conv3x3_s2(x, k), (x, k)


def _bwd(res, g):
    x, k = res
    # backward through the equivalent XLA conv (off the deploy hot path)
    _, vjp = jax.vjp(lambda xx, kk: _plain(xx, kk), x, k)
    dx, dk = vjp(g.astype(x.dtype))
    return dx, dk


stem_conv3x3_s2.defvjp(_fwd, _bwd)
