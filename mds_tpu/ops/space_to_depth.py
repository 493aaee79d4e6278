"""Space-to-depth reparameterization of stride-2 3×3 stem convolutions.

A conv(k=3, s=2, pad=1) on a 3-channel full-resolution image runs at
~0.6 TFLOP/s on TPU (the MXU contraction dim is 3·9=27 — lanes idle).
The standard TPU fix: move the 2×2 spatial structure into channels and run
an exactly-equivalent conv(k=2, s=1) on the half-resolution 4·C-channel
tensor (contraction dim 4·C·4).

Derivation: out[i,j] = Σ_{dy,dx∈[-1..1]} K[dy+1,dx+1] · x[2i+dy, 2j+dx].
With blocks x_b[u,v,(p,q,c)] = x[2u+p, 2v+q, c], row 2i+dy lives in block
u = i−1+a (a∈{0,1}) with parity p, where dy = 2a+p−2. The k=2 block-space
kernel is K2[a,b,(p,q,c),o] = K[2a+p−2+1, 2b+q−2+1, c, o] (zero where
dy=−2), applied with block-space padding ((1,0),(1,0)).

Used for BiSeNetV2's DetailBranch S1_1 (3→64, lib/models/bisenetv2.py:162)
and StemBlock conv (3→16, :199) — the two full-resolution stem convs.
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
    return jax.lax.conv_general_dilated(
        xb, k2, (1, 1), [(1, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
