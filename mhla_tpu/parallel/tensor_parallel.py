"""Head-axis tensor parallelism for the MHLA operator family.

The reference has NO tensor parallelism (SURVEY.md section 2.4 — its two
DTensor ``ParallelStyle`` stubs are never invoked); this is a TPU-native
extension. MHLA heads are fully independent — per head the op is
"chunk states + mixing + readout" with no cross-head term — so splitting
the head axis over the ``tensor`` mesh axis needs ZERO collectives inside
the op: each device runs the fused Pallas kernel on its local head slice
(``shard_map``, which is also what lets the Pallas call partition at all —
SPMD cannot split a custom call), and the cross-device reduction happens
naturally in the following row-parallel ``o_proj`` matmul, where XLA emits
the psum from the ``tp_fsdp_param_specs`` sharding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import TENSOR_AXIS


def mhla_chunk_tp(
    q: jax.Array,  # [B, T, H, Dk] sharded on the head axis over `axis`
    k: jax.Array,
    v: jax.Array,  # [B, T, H, Dv]
    mixing_matrix: jax.Array,  # [N, N] (replicated)
    mesh: Mesh,
    axis: str = TENSOR_AXIS,
    chunk_size: int = 64,
) -> jax.Array:
    """Causal chunked MHLA with heads sharded over ``axis``; returns o
    [B, T, H, Dv] with the same head sharding."""
    from ..kernels.mhla_chunk_pallas import mhla_chunk_fused

    h = q.shape[2]
    n_dev = mesh.shape[axis]
    assert h % n_dev == 0, f"{h} heads not divisible by {n_dev} devices"

    def local_fn(q_l, k_l, v_l, m):
        o, _ = mhla_chunk_fused(q_l, k_l, v_l, m, chunk_size=chunk_size)
        return o

    spec = P(None, None, axis, None)
    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(spec, spec, spec, P(None, None)),
        out_specs=spec,
    )(q, k, v, jnp.asarray(mixing_matrix))
