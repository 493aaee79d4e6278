"""Fast stride-2 3×3 stem convolutions on few-channel (RGB) inputs.

The two full-resolution stem convs of BiSeNetV2 — DetailBranch S1_1 (3→64,
lib/models/bisenetv2.py:162) and StemBlock conv (3→16, :199) — dominated the
deploy graph: XLA's conv emitter for a (1,1024,2048,3) NHWC input keeps the
3-wide channel dim on the 128-lane minor axis (2.3% lane utilization) and
spends 3.6 ms of a 9.0 ms graph in the two convs plus their layout copies
(profiled on v5e, 2026-08-16).

Two exact reformulations are provided:

* `conv3x3_s2_via_planes` (the default, and the fast one): split the image
  into C channel planes (full-lane (H, W) layouts), zero-pad, take the four
  stride-2 parity views, and build a 27-row patch matrix A[(dy,dx,c)] via
  contiguous slices; the conv is then one `dot_general` with the contraction
  dim on sublanes — MXU-friendly, no C-minor layouts anywhere, and fully
  differentiable. The patch matrix is shared by CSE when several stem convs
  consume the same input (BiSeNetV2's two stems).

* `conv3x3_s2_via_s2d`: the classic space-to-depth reparameterization
  (k=2/s=1 conv on the (H/2, W/2, 4C) block tensor). Measured 2× slower
  than the plain conv on v5e (the 6-D transpose lowers badly); kept for
  backends where it wins.

Derivation (s2d): out[i,j] = Σ_{dy,dx∈[-1..1]} K[dy+1,dx+1] · x[2i+dy, 2j+dx].
With blocks x_b[u,v,(p,q,c)] = x[2u+p, 2v+q, c], row 2i+dy lives in block
u = i−1+a (a∈{0,1}) with parity p, where dy = 2a+p−2. The k=2 block-space
kernel is K2[a,b,(p,q,c),o] = K[2a+p−2+1, 2b+q−2+1, c, o] (zero where
dy=−2), applied with block-space padding ((1,0),(1,0)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def space_to_depth_2x2(x: jax.Array) -> jax.Array:
    """(B,H,W,C) → (B,H/2,W/2,4C), channel layout (p,q,c)."""
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, H/2, W/2, p, q, C)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def s2d_kernel(k: jax.Array) -> jax.Array:
    """(3,3,C,O) stride-2 kernel → (2,2,4C,O) block-space kernel."""
    kh, kw, c, o = k.shape
    assert kh == 3 and kw == 3
    k2 = jnp.zeros((2, 2, 2, 2, c, o), k.dtype)  # (a, b, p, q, c, o)
    for a in range(2):
        for p in range(2):
            dy = 2 * a + p - 2
            if not (-1 <= dy <= 1):
                continue
            for bb in range(2):
                for q in range(2):
                    dx = 2 * bb + q - 2
                    if not (-1 <= dx <= 1):
                        continue
                    k2 = k2.at[a, bb, p, q].set(k[dy + 1, dx + 1])
    # flatten (p,q,c) → 4C, matching space_to_depth_2x2's channel layout
    return k2.reshape(2, 2, 4 * c, o)


def conv3x3_s2_via_s2d(x: jax.Array, k: jax.Array) -> jax.Array:
    """Exact replacement for conv(k=3, s=2, pad=1). x (B,H,W,C) H,W even;
    k (3,3,C,O) HWIO. Returns (B,H/2,W/2,O)."""
    xb = space_to_depth_2x2(x)
    k2 = s2d_kernel(k.astype(x.dtype))
    # no preferred_element_type: its f32 output under bf16 operands breaks
    # the conv VJP (mixed-dtype cotangents); the TPU MXU accumulates bf16
    # inputs in f32 internally regardless
    return jax.lax.conv_general_dilated(
        xb, k2, (1, 1), [(1, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv3x3_s2_via_planes(x: jax.Array, k: jax.Array) -> jax.Array:
    """Exact replacement for conv(k=3, s=2, pad=1) on few-channel inputs.

    x (B,H,W,C) with H,W even and small C; k (3,3,C,O) HWIO. Returns
    (B,H/2,W/2,O). Strategy: per-channel planes → padded parity views →
    27·C/3-row patch matrix by contiguous slices → one lhs-transposed
    dot_general (contraction on sublanes, M = B·H/2·W/2 on lanes)."""
    b, h, w, c = x.shape
    kh, kw, kc, o = k.shape
    assert (kh, kw) == (3, 3) and kc == c, (k.shape, x.shape)
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    h2, w2 = h // 2, w // 2

    # channel planes, zero-padded by 1 (pre-normalized input ⇒ zero pad ok)
    planes = [
        jnp.pad(x[:, :, :, ci], ((0, 0), (1, 1), (1, 1))) for ci in range(c)
    ]
    # stride-2 parity views P[p][q] per channel: (B, H/2+1, W/2+1)
    par = [
        [[p[:, pp::2, qq::2] for qq in (0, 1)] for pp in (0, 1)]
        for p in planes
    ]
    rows = []
    wrows = []
    for dy in (-1, 0, 1):
        p2, sy = (dy + 1) % 2, (dy + 1) // 2
        for dx in (-1, 0, 1):
            q2, sx = (dx + 1) % 2, (dx + 1) // 2
            for ci in range(c):
                tap = par[ci][p2][q2][:, sy : sy + h2, sx : sx + w2]
                rows.append(tap.reshape(-1))
                wrows.append(k[dy + 1, dx + 1, ci])
    a = jnp.stack(rows)  # (9C, B·H/2·W/2)
    wm = jnp.stack(wrows).astype(x.dtype)  # (9C, O)
    out = jax.lax.dot_general(
        a, wm, (((0,), (0,)), ((), ()))
    )  # (B·H/2·W/2, O)
    return out.reshape(b, h2, w2, o)
