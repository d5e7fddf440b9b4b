"""Multi-host initialization and helpers.

Replaces the reference's torchrun/NCCL environment handshake
(``WORLD_SIZE``/``RANK``/``LOCAL_RANK`` reads, ``train_wan.py:1014,1063``)
with ``jax.distributed.initialize``: on TPU pods the coordinator and process
ids come from the TPU metadata automatically; data loaders shard by
``jax.process_index()``.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def init_multihost(coordinator: Optional[str] = None) -> dict:
    """Initialize the JAX distributed runtime when running multi-process.

    No-op for single-process runs (the common single-host case); on TPU
    pods, call with no arguments. Returns a dict with the process topology.
    """
    already = jax.process_count() > 1
    should_init = (
        coordinator is not None
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
    )
    if should_init and not already:
        kwargs = {}
        if coordinator:
            kwargs["coordinator_address"] = coordinator
        jax.distributed.initialize(**kwargs)
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0
