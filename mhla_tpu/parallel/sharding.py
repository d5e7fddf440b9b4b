"""Parameter sharding rules (FSDP-style) and helpers.

Replaces the reference's wrapper-driven sharding (DeepSpeed ZeRO-2 config,
accelerate-FSDP ``TRANSFORMER_BASED_WRAP`` on block classes —
``train_wan.py:76-108``, ``fsdp_utils.py:12-34``) with explicit, inspectable
PartitionSpecs: every parameter is sharded along its largest
fsdp-divisible axis; small parameters (norm scales, mixing matrices) stay
replicated. Optimizer state inherits the parameter specs, which is ZeRO-3
for free under pjit.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import FSDP_AXIS, TENSOR_AXIS


def fsdp_spec(
    shape: tuple,
    fsdp_size: int,
    min_size: int = 2**14,
    axis_name: str = FSDP_AXIS,
) -> P:
    """PartitionSpec sharding the largest divisible axis over fsdp.

    Sub-tile shards are never produced regardless of ``min_size``: a shard
    must keep >=128 lanes on the minor axis (>=8 sublanes elsewhere), the
    TPU tile quantum. Sharding below it (e.g. a [1,6,32] adaLN modulation
    table 8-ways on its 32-lane axis) forces the SPMD partitioner into
    "involuntary full rematerialization" at every use site that needs a
    different layout — such params replicate instead."""
    if int(np.prod(shape)) < min_size:
        return P()
    # prefer the largest axis; break ties toward the later (output) axis
    order = sorted(range(len(shape)), key=lambda i: (shape[i], i), reverse=True)
    for i in order:
        if shape[i] % fsdp_size != 0 or shape[i] < fsdp_size:
            continue
        quantum = 128 if i == len(shape) - 1 else 8
        if shape[i] // fsdp_size < quantum:
            continue
        spec = [None] * len(shape)
        spec[i] = axis_name
        return P(*spec)
    return P()


def fsdp_param_specs(params: Any, mesh: Mesh, min_size: int = 2**14) -> Any:
    """Tree of PartitionSpecs for FSDP parameter sharding."""
    fsdp_size = mesh.shape[FSDP_AXIS]
    if fsdp_size == 1:
        return jax.tree.map(lambda _: P(), params)
    return jax.tree.map(lambda p: fsdp_spec(p.shape, fsdp_size, min_size), params)


# Megatron-style tensor-parallel rules by module name. Column modules feed
# per-head / per-channel compute, so their kernel OUTPUT axis shards over
# the tensor axis; row modules reduce back into the residual stream, so
# their INPUT axis shards and XLA emits the psum at that matmul. Everything
# else (norms, mixing matrices, embeddings) replicates over tensor — the
# reference has no TP at all (SURVEY section 2.4), so these rules are a
# TPU-native extension, not a parity requirement.
TP_COLUMN = (
    "q_proj", "k_proj", "v_proj", "g_proj", "b_proj", "a_proj",
    "gate_proj", "up_proj", "to_qkv", "fc1", "in_proj",
)
TP_ROW = ("o_proj", "down_proj", "to_out", "fc2", "out_proj")


def tp_fsdp_param_specs(
    params: Any, mesh: Mesh, min_size: int = 2**14
) -> Any:
    """PartitionSpecs combining tensor parallelism (name-matched column/row
    kernels) with FSDP on the remaining axis where it still fits the tile
    quantum. Non-matched parameters fall back to plain FSDP specs."""
    tp_size = mesh.shape[TENSOR_AXIS]
    fsdp_size = mesh.shape[FSDP_AXIS]
    if tp_size == 1:
        return fsdp_param_specs(params, mesh, min_size)

    def leaf_spec(path, p):
        names = {getattr(k, "key", None) for k in path}
        kind = None
        if names & set(TP_COLUMN):
            kind = "col"
        elif names & set(TP_ROW):
            kind = "row"
        last = getattr(path[-1], "key", None)
        if kind is None or last not in ("kernel", "bias") or p.ndim > 2:
            return fsdp_spec(p.shape, fsdp_size, min_size)
        if last == "bias" or p.ndim == 1:
            if (
                kind == "col"
                and p.shape[0] % tp_size == 0
                and p.shape[0] // tp_size >= 128
            ):
                return P(TENSOR_AXIS)
            return P()  # row bias is added once, post-psum: replicate
        tp_axis = 1 if kind == "col" else 0
        if p.shape[tp_axis] % tp_size != 0 or (
            p.shape[tp_axis] // tp_size < (128 if tp_axis == 1 else 8)
        ):
            return fsdp_spec(p.shape, fsdp_size, min_size)
        spec = [None, None]
        spec[tp_axis] = TENSOR_AXIS
        # FSDP the other axis when a full tile survives per shard
        other = 1 - tp_axis
        quantum = 128 if other == 1 else 8
        if (
            fsdp_size > 1
            and p.shape[other] % fsdp_size == 0
            and p.shape[other] // fsdp_size >= quantum
        ):
            spec[other] = FSDP_AXIS
        return P(*spec)

    return jax.tree_util.tree_map_with_path(leaf_spec, params)


def fsdp_shardings(params: Any, mesh: Mesh, min_size: int = 2**14) -> Any:
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        fsdp_param_specs(params, mesh, min_size),
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(params: Any, mesh: Mesh, min_size: int = 2**14) -> Any:
    """Place a parameter tree onto the mesh with FSDP sharding."""
    return jax.device_put(params, fsdp_shardings(params, mesh, min_size))
