"""Device mesh + sharding helpers (data parallel over ICI, DCN-ready).

TPU-native replacement for the reference's DDP stack (SURVEY.md §2.3):
instead of NCCL process groups + DistributedSampler + SyncBN wrappers, we
run one global-view `jit` over a 1-D `data` mesh. Batch arrays are sharded
on their leading axis; parameters/optimizer state are replicated. XLA
inserts the gradient all-reduce and the cross-replica BatchNorm reductions
automatically.

Multi-host: `jax.distributed.initialize` happens in the CLI
(`rcf_tpu/cli.py`, RCF_COORDINATOR/RCF_DIST). The mesh then spans all
processes' devices, and `shard_batch` assembles *global* batch arrays from
each host's local shard via `jax.make_array_from_process_local_data`
(single-process: a plain sharded device_put). The loader already shards
sample indices by `jax.process_index()` (`data/loader.py`), so each host
loads exactly its slice. Smoke-tested with 2 real processes x 4 CPU
devices in `tests/test_multihost.py`.
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
    """Assemble globally-sharded batch arrays from (process-local) numpy.

    Single-process: device_put with a leading-axis sharding. Multi-process:
    each host passes ITS batch slice (global_batch / process_count rows) and
    the result is one global jax.Array per leaf — the global-view jit then
    runs SPMD across all hosts with no further changes.
    """
    sharding = batch_sharding(mesh, axis)
    multiprocess = jax.process_count() > 1
    out = {}
    for key, value in batch.items():
        if isinstance(value, np.ndarray) and value.ndim >= 1:
            if multiprocess:
                out[key] = jax.make_array_from_process_local_data(sharding, value)
            else:
                out[key] = jax.device_put(value, sharding)
        else:
            out[key] = value
    return out


def replicate(tree, mesh: Mesh):
    """Replicate a pytree across the mesh."""
    sharding = replicated(mesh)
    return jax.device_put(tree, sharding)
