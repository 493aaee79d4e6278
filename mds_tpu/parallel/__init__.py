from mds_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicate,
    shard_batch,
    batch_sharding,
    replicated_sharding,
)
