"""Device mesh + sharding utilities: the NCCL/DDP layer, TPU-native.

Reference parallelism (SURVEY.md §2.7): pure data parallelism — DDP gradient
all-reduce over NCCL (tools/train_amp.py:169-177), `dist.all_reduce` on eval
hists (evaluate.py:94-95), rank-strided samplers. Here the same surface is a
1-D `data` mesh: batches are sharded along `data`, params/optimizer state are
replicated, and XLA inserts the gradient all-reduce (ICI collective) because
the loss reduces over a sharded batch under jit. SyncBN falls out for free:
BN moments are global-batch means under the same sharding.

Multi-host: `jax.distributed.initialize()` + per-process data shards via
`jax.make_array_from_process_local_data` (the RepeatedDistSampler rank shard).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed() -> bool:
    """Call jax.distributed.initialize() when launched as part of a
    multi-process job (the reference's dist.init_process_group role,
    tools/train_amp.py:306-313).

    Triggers on either the explicit MDS_COORDINATOR/MDS_NUM_PROCESSES/
    MDS_PROCESS_ID env vars or jax's own JAX_COORDINATOR_ADDRESS (on TPU
    pods jax.distributed.initialize() autodetects everything else).
    Returns True if distributed was initialized by this call."""
    import os

    # NOTE: must run before anything touches the XLA backend (jax.devices()
    # etc.) — so only env vars are consulted here, never jax.process_count()
    try:
        if os.environ.get("MDS_COORDINATOR"):
            jax.distributed.initialize(
                coordinator_address=os.environ["MDS_COORDINATOR"],
                num_processes=int(os.environ["MDS_NUM_PROCESSES"]),
                process_id=int(os.environ["MDS_PROCESS_ID"]),
            )
            return True
        if os.environ.get("JAX_COORDINATOR_ADDRESS"):
            jax.distributed.initialize()
            return True
    except RuntimeError as e:
        if "must be called before" in str(e) or "already initialized" in str(e):
            return False
        raise
    return False


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree onto every device of the mesh.

    Multi-process: device_put cannot target non-addressable devices, so each
    process contributes its (identical) full copy via
    make_array_from_process_local_data with a fully-replicated sharding."""
    s = replicated_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)),
        tree,
    )


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Shard a host batch (leading dim) across the mesh's data axis.

    Single-process path uses device_put with a NamedSharding; multi-process
    uses make_array_from_process_local_data (each process holds its shard).
    """
    s = batch_sharding(mesh, axis)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)), batch
    )


def pad_batch_to(batch_size: int, mesh: Mesh, axis: str = "data") -> int:
    """Round a global batch size up to a multiple of the data-axis size."""
    n = mesh.shape[axis]
    return -(-batch_size // n) * n
