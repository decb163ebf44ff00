from ov3det.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    data_mesh,
    make_mesh,
    replicate,
    set_data_mesh,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "batch_sharding",
    "data_mesh",
    "make_mesh",
    "replicate",
    "set_data_mesh",
    "shard_batch",
]
