"""Device mesh + sharding helpers.

TPU-native replacement for the reference's NCCL/DDP distributed runtime
(`utils/train_utils.py:49-92`, SURVEY.md 2.6): a single-controller
`jax.sharding.Mesh` with one data-parallel axis over which the sequence batch
is sharded; gradients and metrics are reduced by XLA collectives inserted by
`jit` - no process groups, no filesystem all-reduce.

BatchNorm under pjit computes its statistics over the *global* batch
automatically (XLA inserts the cross-device reductions), which subsumes the
reference's SyncBatchNorm flag.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (sequence-batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Place every array in a batch dict/pytree with its leading dim sharded.

    Single-host: a plain device_put. Multi-host: the input is this process's
    LOCAL shard (leading dim = global_batch / process_count) and the global
    array is assembled via make_array_from_process_local_data - each host
    only ever loads its own slice of the data (the TPU equivalent of the
    reference's DistributedSampler, `utils/train_utils.py:12-31`).
    """
    sharding = batch_sharding(mesh, axis_name)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch)


def local_batch_indices(global_indices, process_index: Optional[int] = None,
                        process_count: Optional[int] = None):
    """The rows of a global batch owned by this host (contiguous block
    layout, matching the leading-axis NamedSharding)."""
    p = jax.process_index() if process_index is None else process_index
    n = jax.process_count() if process_count is None else process_count
    local = len(global_indices) // n
    return global_indices[p * local:(p + 1) * local]


def check_batch_divisible(batch_size: int, mesh: Mesh,
                          axis_name: str = DATA_AXIS) -> None:
    n = mesh.shape[axis_name]
    assert batch_size % n == 0, (
        f"global batch {batch_size} not divisible by mesh axis '{axis_name}'={n}"
        " (parity with reference utils/train_utils.py:70-73)")
