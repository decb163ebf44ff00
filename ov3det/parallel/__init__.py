from ov3det.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)

__all__ = ["DATA_AXIS", "batch_sharding", "make_mesh", "replicate", "shard_batch"]
