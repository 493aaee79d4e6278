"""Fast depthwise / channel-multiplied 3×3 convolution for TPU.

XLA lowers `conv_general_dilated` with feature_group_count == C to a
non-MXU path that measures ~0.2 TFLOP/s on v5e — each depthwise conv in
BiSeNetV2's GELayers (reference: lib/models/bisenetv2.py:271-371) costs ~1 ms
at deploy resolution, dominating inference (the reference hit the same wall
in TensorRT: tensorrt/README tip 4 blames the depthwise convs).

This implements depthwise conv as 9 shifted multiply-adds on the VPU —
pure elementwise ops XLA fuses into one memory-bound pass:

    out[b, y, x, c·m + j] = Σ_{dy,dx} w[dy, dx, c, j] · x[b, y+dy−1, x+dx−1, c]

Supports stride 1/2 and channel multiplier m ≥ 1 (the GELayer expansion
convs use groups=C_in with C_out = 6·C_in). ~20× faster than the XLA
grouped-conv lowering at BiSeNetV2 shapes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def depthwise_conv3x3(x: jax.Array, w: jax.Array, stride: int = 1) -> jax.Array:
    """x (B,H,W,C); w (3,3,C,mult) [HWIO with I=1 reshaped to (3,3,C,mult)];
    'SAME' padding; returns (B,H',W',C*mult)."""
    b, h, w_in, c = x.shape
    kh, kw, wc, mult = w.shape
    assert (kh, kw) == (3, 3) and wc == c, (w.shape, x.shape)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    h_out = -(-h // stride)
    w_out = -(-w_in // stride)
    out = None
    for dy in range(3):
        for dx in range(3):
            tap = jax.lax.slice(
                xp,
                (0, dy, dx, 0),
                (b, dy + (h_out - 1) * stride + 1, dx + (w_out - 1) * stride + 1, c),
                (1, stride, stride, 1),
            )
            wk = w[dy, dx]  # (C, mult)
            if mult == 1:
                term = tap * wk[:, 0]
            else:
                term = tap[..., None] * wk  # (B,H',W',C,mult)
            out = term if out is None else out + term
    if mult != 1:
        out = out.reshape(b, h_out, w_out, c * mult)
    return out


def kernel_from_hwio(hwio: jax.Array, c_in: int) -> jax.Array:
    """Convert an HWIO grouped kernel (3,3,1,C_out) with feature_group_count
    C_in into the (3,3,C_in,mult) layout (torch group-major channel order)."""
    kh, kw, i, c_out = hwio.shape
    assert i == 1 and c_out % c_in == 0
    return hwio.reshape(kh, kw, c_in, c_out // c_in)


# ---------------------------------------------------------------------------
# Hybrid-VJP grouped conv: XLA forward + XLA input-grad, 9-tap weight-grad.
#
# MEASURED on v5e (tools/microbench_dw_bwd.py, 2026-08-17, bs16 512×1024
# train shapes, ~1.6 ms/iter tunnel floor subtracted): XLA's grouped-conv
# forward (~1.3 ms total over the 9 GELayer dwconvs) and input-grad
# (~0.4 ms) are fast, but its weight-grad lowering (batch_group_count conv)
# costs ~10.9 ms/step; the 9-tap fused multiply-reduce formulation below
# halves that (~5.6 ms). The reference hits the same wall in cuDNN —
# depthwise backward is the classic slow path (tensorrt/README tip 4).
# ---------------------------------------------------------------------------


# Weight-grad backend: the nine fused multiply-reduce sweeps below are the
# ONLY implementation. A single-pass Pallas VMEM kernel was tried through
# r4-r5 and retired — see the measured negative in ops/pallas/depthwise.py
# (346 s/call at the first GELayer shape vs ~0.6 ms here).


def _dw_conv_xla(x: jax.Array, w_hwio: jax.Array, stride: int) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x, w_hwio, (stride, stride), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def depthwise_conv3x3_hybrid(x: jax.Array, w_hwio: jax.Array, stride: int = 1):
    """Grouped 3×3 conv, SAME padding: value-identical to the XLA grouped
    conv (same forward lowering) but with the weight-grad computed as nine
    shifted multiply-reduces instead of XLA's slow batch-group-count conv."""
    return _dw_conv_xla(x, w_hwio, stride)


def _dw_hybrid_fwd(x, w_hwio, stride):
    return _dw_conv_xla(x, w_hwio, stride), (x, w_hwio)


def _dw_hybrid_bwd(stride, res, dy):
    x, w_hwio = res
    b, h, w_in, c = x.shape
    mult = w_hwio.shape[-1] // c
    # input-grad: XLA's transposed grouped conv is already fast — reuse it
    _, pullback = jax.vjp(lambda x_: _dw_conv_xla(x_, w_hwio, stride), x)
    dx = pullback(dy)[0]
    # weight-grad: gw[ky,kx,c,j] = Σ_{b,h,w} x_tap[...,c] · dy[...,c,j]
    # — nine strided-slice + multiply + full reduce passes that XLA fuses
    # into single memory-bound sweeps (f32 accumulation).
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    h_out, w_out = dy.shape[1], dy.shape[2]
    dy5 = dy.reshape(b, h_out, w_out, c, mult)
    taps = []
    for ky in range(3):
        for kx in range(3):
            tap = jax.lax.slice(
                xp,
                (0, ky, kx, 0),
                (b, ky + (h_out - 1) * stride + 1,
                 kx + (w_out - 1) * stride + 1, c),
                (1, stride, stride, 1),
            )
            taps.append(
                jnp.einsum(
                    "bhwc,bhwcj->cj", tap, dy5,
                    preferred_element_type=jnp.float32,
                )
            )
    gw = jnp.stack(taps).reshape(3, 3, c * mult).astype(w_hwio.dtype)
    return dx, gw[:, :, None, :]


depthwise_conv3x3_hybrid.defvjp(_dw_hybrid_fwd, _dw_hybrid_bwd)
