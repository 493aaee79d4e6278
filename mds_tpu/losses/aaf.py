"""Adaptive Affinity Fields (AAF) loss.

Reference: lib/loss/Aff_losses.py (affinity_loss :7, adaptive_affinity_loss
:81-170), lib/loss/aff_layers.py (eightcorner_activation :44, edges/ignores
from label :85-200) and the AAF_Loss wrapper (lib/loss/lovasz_loss.py:349-
430: patch sizes 1..3, per-class edge/non-edge weights softmaxed over sizes,
kld_margin=3.0, λ₁=λ₂=1.0, decay dec=1e-2).

Per patch size k: for each pixel and each of its 8 corner neighbors at
distance k, the per-class binary KL divergence between center and neighbor
probabilities is computed; edge pairs (label differs) get hinge
max(0, margin − KL)·w_edge, non-edge pairs get KL·w_not_edge; pairs touching
ignore pixels are dropped. NHWC, fully vectorized (the reference gathers
indices host-side; here masks keep shapes static for jit).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def eight_corner(x: jax.Array, size: int, pad_value=0.0) -> jax.Array:
    """(B,H,W,C) → (B,H,W,C,8): the 8 corner neighbors of a (2k+1)² patch
    (aff_layers.py:44-83)."""
    b, h, w, c = x.shape
    p = size
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), constant_values=pad_value)
    groups = []
    for st_y in range(0, 2 * size + 1, size):
        for st_x in range(0, 2 * size + 1, size):
            if st_y == size and st_x == size:
                continue
            groups.append(xp[:, st_y : st_y + h, st_x : st_x + w, :])
    return jnp.stack(groups, axis=-1)


def adaptive_affinity_loss(
    labels: jax.Array,      # (B,H,W) int
    probs: jax.Array,       # (B,H,W,C) softmax probabilities
    size: int,
    kld_margin: float = 3.0,
    w_edge: Optional[jax.Array] = None,      # (C,)
    w_not_edge: Optional[jax.Array] = None,  # (C,)
    ignore: int = 255,
) -> Tuple[jax.Array, jax.Array]:
    """→ (edge_loss, not_edge_loss) means (Aff_losses.py:81-170)."""
    b, h, w, c = probs.shape
    labels = labels.astype(jnp.int32)
    valid = labels != ignore
    onehot = jax.nn.one_hot(jnp.where(valid, labels, 0), c)

    # neighbor maps
    lab_nb = eight_corner(labels[..., None].astype(jnp.float32), size,
                          pad_value=float(ignore))[..., 0, :]  # (B,H,W,8)
    valid_nb = (lab_nb != ignore) & valid[..., None]  # pair validity
    onehot_nb = eight_corner(onehot, size)  # (B,H,W,C,8)
    # edge: any class where neighbor one-hot differs from center
    edge = (onehot[..., None] != onehot_nb) & valid_nb[:, :, :, None, :]
    not_edge = (~(onehot[..., None] != onehot_nb)) & valid_nb[:, :, :, None, :]

    probs_nb = eight_corner(probs, size)  # (B,H,W,C,8)
    eps_lo, eps_hi = 1e-4, 1.0
    p = jnp.clip(probs[..., None], eps_lo, eps_hi)
    pn = jnp.clip(probs_nb, eps_lo, eps_hi)
    q = jnp.clip(1.0 - probs[..., None], eps_lo, eps_hi)
    qn = jnp.clip(1.0 - probs_nb, eps_lo, eps_hi)
    # per-class binary KL(center ‖ neighbor) (Aff_losses.py:150-165)
    kld = p * (jnp.log(p) - jnp.log(pn)) + q * (jnp.log(q) - jnp.log(qn))

    w_edge = jnp.ones((c,), jnp.float32) if w_edge is None else w_edge
    w_not_edge = jnp.ones((c,), jnp.float32) if w_not_edge is None else w_not_edge
    edge_term = jnp.maximum(0.0, kld_margin - kld) * w_edge[None, None, None, :, None]
    not_edge_term = kld * w_not_edge[None, None, None, :, None]

    e = edge.astype(jnp.float32)
    ne = not_edge.astype(jnp.float32)
    edge_loss = jnp.sum(edge_term * e) / jnp.maximum(jnp.sum(e), 1.0)
    not_edge_loss = jnp.sum(not_edge_term * ne) / jnp.maximum(jnp.sum(ne), 1.0)
    return edge_loss, not_edge_loss


class AAFLoss:
    """AAF_Loss wrapper (lovasz_loss.py:349-430): sizes (1,2,3), per-class
    per-size weights softmaxed over sizes, λ scaling and dec decay. The
    weights are parameters in the reference; pass them in (C,3) or leave
    uniform."""

    def __init__(self, num_classes: int, kld_margin: float = 3.0,
                 kld_lambda_1: float = 1.0, kld_lambda_2: float = 1.0,
                 dec: float = 1e-2, ignore: int = 255):
        self.num_classes = num_classes
        self.kld_margin = kld_margin
        self.l1 = kld_lambda_1
        self.l2 = kld_lambda_2
        self.dec = dec
        self.ignore = ignore

    def __call__(self, logits: jax.Array, labels: jax.Array,
                 w_edge: Optional[jax.Array] = None,
                 w_not_edge: Optional[jax.Array] = None) -> jax.Array:
        """logits (B,H,W,C) at label resolution."""
        c = self.num_classes
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        w_e = (jax.nn.softmax(w_edge, axis=-1) if w_edge is not None
               else jnp.full((c, 3), 1.0 / 3))
        w_ne = (jax.nn.softmax(w_not_edge, axis=-1) if w_not_edge is not None
                else jnp.full((c, 3), 1.0 / 3))
        total = jnp.float32(0.0)
        for i, size in enumerate((1, 2, 3)):
            e, ne = adaptive_affinity_loss(
                labels, probs, size, self.kld_margin,
                w_e[:, i], w_ne[:, i], self.ignore,
            )
            total = total + self.l1 * e * self.dec + self.l2 * ne * self.dec
        return total
