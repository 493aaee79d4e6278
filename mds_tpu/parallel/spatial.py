"""Spatially-parallel inference: shard an oversized image across the mesh.

SURVEY.md §2.7: the reference's "long-context" analog is spatial resolution —
1024×2048 deploy graphs and sliding-window MscEvalCrop (evaluate.py:650-753).
When one image exceeds a chip's HBM (or when latency should scale with the
mesh), split it into overlapping tiles with a context margin, run the tiles
as a device-sharded batch (one all-gather at the end — rides ICI), and
stitch the centers.

The margin plays the halo role: BiSeNetV2's receptive field is bounded, so a
margin ≥ the effective receptive-field radius makes tiled logits match
whole-image logits except for global-pooling paths (CEBlock/ARM gaps see a
tile-local context — same approximation every sliding-window evaluator
makes, including the reference's MscEvalCrop).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def plan_tiles(size: int, n_tiles: int, margin: int, multiple: int = 32):
    """Split `size` into n_tiles center-regions with symmetric margins.
    Returns (tile_extent, [(src_start, center_start, center_len)])."""
    center = -(-size // n_tiles)
    extent = center + 2 * margin
    extent = -(-extent // multiple) * multiple
    plans = []
    for i in range(n_tiles):
        c0 = i * center
        clen = min(center, size - c0)
        src = min(max(c0 - margin, 0), max(size - extent, 0))
        plans.append((src, c0, clen))
    return extent, plans


def halo_conv3x3(
    x: jax.Array,  # (B, H, W, C) — W sharded over the mesh axis
    kernel: jax.Array,  # (3, 3, C, O) HWIO
    mesh: Mesh,
    axis: str = "data",
) -> jax.Array:
    """EXACT spatially-sharded 3×3 s1 conv via halo exchange.

    The scaling-book recipe for spatial partitioning: shard W across the
    mesh, `jax.lax.ppermute` each shard's edge column to its neighbor (one
    hop — rides ICI), zero the halos at the global image border, and conv
    locally. Unlike `tiled_inference`'s margin approximation this is
    bit-equal to the unsharded conv — the building block for sharding
    whole backbones over images that exceed one chip's HBM.
    """
    from jax import shard_map

    n = int(mesh.shape[axis])

    def local(xs, k):
        # neighbor edge columns: shard i receives i-1's last col (left halo)
        # and i+1's first col (right halo)
        left = jax.lax.ppermute(
            xs[:, :, -1:, :], axis, [(i, (i + 1) % n) for i in range(n)]
        )
        right = jax.lax.ppermute(
            xs[:, :, :1, :], axis, [(i, (i - 1) % n) for i in range(n)]
        )
        idx = jax.lax.axis_index(axis)
        left = jnp.where(idx == 0, jnp.zeros_like(left), left)
        right = jnp.where(idx == n - 1, jnp.zeros_like(right), right)
        xp = jnp.concatenate([left, xs, right], axis=2)
        return jax.lax.conv_general_dilated(
            xp, k, (1, 1), [(1, 1), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None, axis, None), P()),
        out_specs=P(None, None, axis, None),
    )(x, kernel)


def tiled_inference(
    logits_fn: Callable,
    im: jax.Array,  # (1, H, W, C) preprocessed image
    n_classes: int,
    mesh: Optional[Mesh] = None,
    margin: int = 96,
    dataset: int = 0,
) -> jax.Array:
    """→ (1, H, W, n_classes) logits, computed as a W-sharded tile batch."""
    if mesh is None:
        from mds_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    n_dev = int(np.prod(mesh.devices.shape))
    _, h, w, c = im.shape
    extent, plans = plan_tiles(w, n_dev, margin)
    tiles = jnp.concatenate(
        [jax.lax.dynamic_slice(im, (0, 0, src, 0), (1, h, extent, c))
         for src, _, _ in plans],
        axis=0,
    )  # (n_dev, H, extent, C)
    sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
    tiles = jax.device_put(tiles, sharding)
    logits = logits_fn(tiles, dataset)  # (n_dev, H', extent', n_classes)
    logits = jax.device_put(logits, NamedSharding(mesh, P()))
    # stitch centers back (host-side sizes are static)
    scale_h = logits.shape[1] / h
    scale_w = logits.shape[2] / extent
    out = jnp.zeros((1, logits.shape[1], int(round(w * scale_w)), n_classes),
                    logits.dtype)
    for i, (src, c0, clen) in enumerate(plans):
        off = int(round((c0 - src) * scale_w))
        cl = int(round(clen * scale_w))
        piece = jax.lax.dynamic_slice(
            logits, (i, 0, off, 0), (1, logits.shape[1], cl, n_classes)
        )
        out = jax.lax.dynamic_update_slice(
            out, piece, (0, 0, int(round(c0 * scale_w)), 0)
        )
    return out
