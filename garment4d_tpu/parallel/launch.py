"""Multi-host launch helpers.

Replaces the reference's Slurm/torch.distributed process-group bootstrap
(`utils/train_utils.py:49-92` init_dist_slurm / init_dist_pytorch): on TPU
pods a single call to `jax.distributed.initialize()` per host joins the
cluster; jit/pjit then drive every chip from process 0's program with XLA
collectives over ICI/DCN - no rank-spawning scripts, no tcp store, no NCCL.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> dict:
    """Join the multi-host cluster if one is configured; no-op single-host.

    Honours the standard JAX env vars (JAX_COORDINATOR_ADDRESS etc.) or the
    TPU-pod metadata when arguments are omitted. Returns a summary dict.
    """
    should_init = (
        coordinator_address is not None
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
        or (num_processes or 0) > 1
    )
    if should_init:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def per_process_batch(global_batch: int) -> int:
    """Split the global batch across hosts (parity with the reference's
    `batch_size // world_size` check, `train_utils.py:70-73`)."""
    n = jax.process_count()
    if global_batch % n != 0:  # a bare assert vanishes under python -O
        raise ValueError(
            f"global batch {global_batch} not divisible by process count {n}")
    return global_batch // n
