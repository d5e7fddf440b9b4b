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

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import DATA_AXIS, FSDP_AXIS, TENSOR_AXIS


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


def mhla_attention_tp_flat(
    q: jax.Array,  # [B, T, H*Dk] head-flat, post GQA expansion / masking
    k: jax.Array,
    v: jax.Array,  # [B, T, H*Dv]
    mixing_matrix: jax.Array,  # [N, N] (replicated)
    cos: jax.Array,  # rotary tables [>=T, Dk/2]
    sin: jax.Array,
    num_heads: int,
    mesh: Mesh,
    feature_map: Optional[str] = None,
    chunk_size: int = 64,
    axis: str = TENSOR_AXIS,
    positions: Optional[jax.Array] = None,  # [B, T] packed-varlen rotary
    segment_ids: Optional[jax.Array] = None,  # [B, T] packed-varlen docs
    output_final_state: bool = False,
    cos_k: Optional[jax.Array] = None,  # XPos: k gets 1/scale tables
    sin_k: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """The MHLACausal chunk interior (fused fmap+rope -> fused chunk op)
    with heads split over the ``tensor`` mesh axis — the trainer-reachable
    TP path (``--train.n_tensor``).

    The whole interior goes through ONE shard_map because both stages are
    Pallas custom calls, which GSPMD cannot partition — each device runs
    them on its local head slice (head-flat, so the shard boundary is just
    the minor axis; heads are independent throughout). Zero collectives
    inside: the cross-device reduction happens in the following row-parallel
    ``o_proj`` (``tp_fsdp_param_specs``). The batch axis stays sharded over
    (data, fsdp) exactly as ``batch_sharding`` lays it out.
    """
    from ..kernels import fused_fmap_rope_flat
    from ..kernels.mhla_chunk_pallas import mhla_chunk_fused_flat

    ntp = mesh.shape[axis]
    assert num_heads % ntp == 0, f"{num_heads} heads not divisible by {ntp}"
    h_l = num_heads // ntp

    batch = (DATA_AXIS, FSDP_AXIS)
    row_spec = P(batch, None, axis)
    tok_spec = P(batch, None)  # per-token [B, T] side inputs
    has_pos, has_seg = positions is not None, segment_ids is not None
    if cos_k is None:
        cos_k, sin_k = cos, sin
    extras = [jnp.asarray(mixing_matrix), cos, sin, cos_k, sin_k]
    extra_specs = [P(None, None)] * 5
    if has_pos:
        extras.append(positions)
        extra_specs.append(tok_spec)
    if has_seg:
        extras.append(segment_ids)
        extra_specs.append(tok_spec)

    def local_fn(q_l, k_l, v_l, m_l, cos_, sin_, cos_k_, sin_k_, *rest):
        pos_ = rest[0] if has_pos else None
        seg_ = rest[-1] if has_seg else None
        # the mixing matrix is a PARAMETER whose cotangent varies across
        # every mesh axis (each batch/head shard contributes) but whose
        # in_spec is replicated — pvary marks that explicitly so shard_map's
        # transpose inserts the psum (pvary's transpose) instead of failing
        # the static-replication check.
        m_l = jax.lax.pvary(m_l, tuple(mesh.axis_names))
        q_l = fused_fmap_rope_flat(q_l, cos_, sin_, h_l, feature_map,
                                   positions=pos_)
        k_l = fused_fmap_rope_flat(k_l, cos_k_, sin_k_, h_l, feature_map,
                                   positions=pos_)
        o_l, s_l = mhla_chunk_fused_flat(
            q_l, k_l, v_l, m_l, num_heads=h_l, chunk_size=chunk_size,
            output_final_state=output_final_state, segment_ids=seg_,
        )
        return (o_l, s_l) if output_final_state else (o_l,)

    out_specs = (row_spec,)
    if output_final_state:
        out_specs = out_specs + (P(batch, axis),)  # [B, H, N, Dk, Dv]
    outs = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(row_spec, row_spec, row_spec, *extra_specs),
        out_specs=out_specs,
    )(q, k, v, *extras)
    return outs[0], (outs[1] if output_final_state else None)
