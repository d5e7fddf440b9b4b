"""Device mesh construction for dp/fsdp/tp sharding over ICI.

TPU-native replacement for the reference's distributed wrappers (torchrun +
NCCL DDP / DeepSpeed ZeRO-2 / accelerate-FSDP HYBRID_SHARD — SURVEY.md
section 2.4): one ``jax.sharding.Mesh`` whose axes play the roles

- ``data``: pure data parallelism (DDP / the HYBRID_SHARD replica axis —
  maps to inter-slice DCN in multi-slice deployments)
- ``fsdp``: parameter/optimizer sharding (ZeRO-3 / FSDP — intra-slice ICI)
- ``tensor``: optional tensor parallelism (absent in the reference; here for
  scaling headroom)

pjit + sharding constraints emit all collectives (psum / all-gather /
reduce-scatter); there is no hand-written communication.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
TENSOR_AXIS = "tensor"


def make_mesh(
    n_data: int = 1,
    n_fsdp: Optional[int] = None,
    n_tensor: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'fsdp', 'tensor') mesh over the available devices.

    ``n_fsdp=None`` absorbs all remaining devices into the fsdp axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_fsdp is None:
        assert n % (n_data * n_tensor) == 0, (n, n_data, n_tensor)
        n_fsdp = n // (n_data * n_tensor)
    assert n_data * n_fsdp * n_tensor == n, (
        f"mesh {n_data}x{n_fsdp}x{n_tensor} != {n} devices"
    )
    arr = np.asarray(devices).reshape(n_data, n_fsdp, n_tensor)
    return Mesh(arr, (DATA_AXIS, FSDP_AXIS, TENSOR_AXIS))


def batch_sharding(mesh: Mesh, batch_size: Optional[int] = None) -> NamedSharding:
    """Shard the batch axis over data x fsdp (every device gets a slice).

    When ``batch_size`` is given and not divisible by the full device count,
    fall back to the largest divisible prefix of axes (data only, then
    replicated) so small/debug batches still run.
    """
    n_both = mesh.shape[DATA_AXIS] * mesh.shape[FSDP_AXIS]
    if batch_size is None or batch_size % n_both == 0:
        return NamedSharding(mesh, P((DATA_AXIS, FSDP_AXIS)))
    if batch_size % mesh.shape[DATA_AXIS] == 0:
        return NamedSharding(mesh, P(DATA_AXIS))
    return NamedSharding(mesh, P())


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
