"""Device mesh + sharding helpers (data parallelism via GSPMD).

Replaces the reference's NCCL/DDP plumbing (reference utils/dist.py:8-176,
main.py:405-431, 490-495): instead of spawned per-GPU processes with
explicit all-reduce calls, a 1-D `data` mesh + sharding annotations let XLA
insert the gradient all-reduces over ICI/DCN under jit.  SyncBatchNorm
becomes BatchNorm statistics computed over the *global* batch, which GSPMD
provides automatically because the batch axis is sharded, not replicated.

Multi-host: call jax.distributed.initialize() before make_mesh(); the mesh
then spans all processes' devices and per-host data loading feeds
jax.make_array_from_process_local_data.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"

# Active data mesh registry: ops that need an explicit shard_map wrap (the
# Pallas FPS kernel has no GSPMD partitioning rule) look the mesh up here at
# trace time instead of threading it through every flax module.
_DATA_MESH: Optional[Mesh] = None


def set_data_mesh(mesh: Optional[Mesh]):
    global _DATA_MESH
    _DATA_MESH = mesh


def data_mesh() -> Optional[Mesh]:
    return _DATA_MESH


def make_mesh(num_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    mesh = Mesh(np.array(devices), (DATA_AXIS,))
    set_data_mesh(mesh)
    return mesh


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params/state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Shard every array's leading (batch) axis over the data mesh axis."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
