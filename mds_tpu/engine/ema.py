"""EMA teacher update.

Reference: lib/momentum_update.py:7 (`EMAUpdate`: teacher ← m·teacher +
(1−m)·student, applied to params and BN buffers each iteration, used by the
contrast teacher path tools/train_ltbgnn_all_datasets_snp.py:967-968).
Functional: one optax-style incremental update over the whole variables tree.
"""

from __future__ import annotations

import jax


def ema_update(teacher_tree, student_tree, momentum: float = 0.999):
    return jax.tree_util.tree_map(
        lambda t, s: momentum * t + (1.0 - momentum) * s.astype(t.dtype),
        teacher_tree,
        student_tree,
    )
