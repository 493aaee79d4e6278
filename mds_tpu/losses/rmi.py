"""Region Mutual Information loss.

Reference: lib/rmi_loss.py (402 LoC) — RMILoss.forward_sigmoid (:295-318):
masked BCE-with-logits + the RMI lower bound (:320-372): radius×radius
shifted-patch vectors per class, covariance of the label vectors conditioned
on the prob vectors, 0.5·logdet via Cholesky, summed over classes. Pooling
before pairing per rmi_pool_way ∈ {max, avg, interp}.

The reference runs the covariance math in float64 on GPU; TPUs are
float32-native, so the covariance/Cholesky path uses f32 with the same
_POS_ALPHA=1e-3 diagonal loading (which dominates f32 rounding here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_CLIP_MIN = 1e-6
_POS_ALPHA = 1e-3


def log_det_by_cholesky(mat: jax.Array) -> jax.Array:
    chol = jnp.linalg.cholesky(mat)
    diag = jnp.diagonal(chol, axis1=-2, axis2=-1)
    return 2.0 * jnp.sum(jnp.log(jnp.maximum(diag, 1e-12)), axis=-1)


def map_get_pairs(labels, probs, radius: int = 3):
    """(N,H,W,C) → two (N, C, r², P) patch-vector stacks (rmi_loss.py:58-87)."""
    n, h, w, c = labels.shape
    new_h, new_w = h - (radius - 1), w - (radius - 1)
    la, pr = [], []
    for y in range(radius):
        for x in range(radius):
            la.append(labels[:, y : y + new_h, x : x + new_w, :])
            pr.append(probs[:, y : y + new_h, x : x + new_w, :])
    la = jnp.stack(la, axis=1)  # (N, r², h', w', C)
    pr = jnp.stack(pr, axis=1)
    la = la.transpose(0, 4, 1, 2, 3).reshape(n, c, radius * radius, -1)
    pr = pr.transpose(0, 4, 1, 2, 3).reshape(n, c, radius * radius, -1)
    return la, pr


def rmi_lower_bound(labels, probs, radius: int = 3,
                    pool_size: int = 4, pool_way: int = 1) -> jax.Array:
    """labels/probs (N,H,W,C) in [0,1] (rmi_loss.py:320-372)."""
    if pool_size > 1:
        if pool_way == 0:
            from flax.linen import max_pool

            labels = max_pool(labels, (pool_size,) * 2, (pool_size,) * 2,
                              padding=[(pool_size // 2,) * 2] * 2)
            probs = max_pool(probs, (pool_size,) * 2, (pool_size,) * 2,
                             padding=[(pool_size // 2,) * 2] * 2)
        elif pool_way == 1:
            from flax.linen import avg_pool

            labels = avg_pool(labels, (pool_size,) * 2, (pool_size,) * 2,
                              padding=[(pool_size // 2,) * 2] * 2,
                              count_include_pad=True)
            probs = avg_pool(probs, (pool_size,) * 2, (pool_size,) * 2,
                             padding=[(pool_size // 2,) * 2] * 2,
                             count_include_pad=True)
        else:
            n, h, w, c = labels.shape
            nh, nw = h // pool_size, w // pool_size
            labels = jax.image.resize(labels, (n, nh, nw, c), "nearest")
            probs = jax.image.resize(probs, (n, nh, nw, c), "linear")

    half_d = radius * radius
    la, pr = map_get_pairs(labels, probs, radius)
    la = jax.lax.stop_gradient(la)
    eye = jnp.eye(half_d)[None, None]
    la = la - jnp.mean(la, axis=3, keepdims=True)
    pr = pr - jnp.mean(pr, axis=3, keepdims=True)
    la_cov = la @ la.transpose(0, 1, 3, 2)
    pr_cov = pr @ pr.transpose(0, 1, 3, 2)
    pr_cov_inv = jnp.linalg.inv(pr_cov + eye * _POS_ALPHA)
    la_pr_cov = la @ pr.transpose(0, 1, 3, 2)
    appro_var = la_cov - la_pr_cov @ pr_cov_inv @ la_pr_cov.transpose(0, 1, 3, 2)
    rmi = 0.5 * log_det_by_cholesky(appro_var + eye * _POS_ALPHA)  # (N, C)
    rmi_per_class = jnp.mean(rmi, axis=0) / float(half_d)
    return jnp.sum(rmi_per_class)


def rmi_loss(
    logits: jax.Array, labels: jax.Array, num_classes: int,
    radius: int = 3, pool_size: int = 4, pool_way: int = 1,
    weight_lambda: float = 0.5, lambda_way: bool = True, ignore: int = 255,
) -> jax.Array:
    """forward_sigmoid (rmi_loss.py:295-318): masked per-class BCE + RMI.
    logits NHWC."""
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.int32)
    mask = (labels < num_classes).astype(jnp.float32)
    onehot = jax.nn.one_hot(jnp.where(labels < num_classes, labels, 0), num_classes)
    onehot = onehot * mask[..., None]

    # BCE with logits, masked, sum / (valid+1)
    logp = jax.nn.log_sigmoid(logits)
    lognp = jax.nn.log_sigmoid(-logits)
    bce = -(onehot * logp + (1 - onehot) * lognp) * mask[..., None]
    bce_loss = jnp.sum(bce) / (jnp.sum(mask) + 1.0)

    probs = jax.nn.sigmoid(logits) * mask[..., None] + _CLIP_MIN
    rmi = rmi_lower_bound(onehot, probs, radius, pool_size, pool_way)
    if lambda_way:
        return weight_lambda * bce_loss + rmi * (1 - weight_lambda)
    return bce_loss + rmi * weight_lambda
