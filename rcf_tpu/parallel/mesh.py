"""Device mesh + sharding helpers (data parallel over ICI).

TPU-native replacement for the reference's DDP stack (SURVEY.md §2.3):
instead of NCCL process groups + DistributedSampler + SyncBN wrappers, we
run one global-view `jit` over a 1-D `data` mesh. Batch arrays are sharded
on their leading axis; parameters/optimizer state are replicated. XLA
inserts the gradient all-reduce and the cross-replica BatchNorm reductions
automatically. A multi-host run only changes the mesh construction
(`jax.make_mesh` over all processes' devices) — no code change.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(shape=(-1,), axes=("data",), devices=None) -> Mesh:
    """Build a mesh; -1 in `shape` absorbs all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    shape = list(shape)
    known = int(np.prod([s for s in shape if s != -1])) or 1
    if -1 in shape:
        shape[shape.index(-1)] = len(devices) // known
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axes))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Device-put array leaves sharded on their leading axis."""
    sharding = batch_sharding(mesh, axis)
    out = {}
    for key, value in batch.items():
        if isinstance(value, np.ndarray) and value.ndim >= 1:
            out[key] = jax.device_put(value, sharding)
        else:
            out[key] = value
    return out


def replicate(tree, mesh: Mesh):
    """Replicate a pytree across the mesh."""
    sharding = replicated(mesh)
    return jax.device_put(tree, sharding)
