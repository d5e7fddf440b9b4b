"""Recurrent (decode-mode) causal MHLA operator.

O(1)-per-token autoregressive form of ``mhla_chunk``. The decode state is the
*stack* of per-chunk KV states (the in-progress chunk accumulates in its own
slot) plus the absolute token position:

    state.states : [B, H, N_slots, Dk, Dv]
    state.t      : int32 scalar

For token at absolute position t (chunk i = t // chunk_size):

    states[i] += k_t^T v_t                      # in-progress accumulation
    o_t = (q_t * Dk**-0.5) @ sum_{j<=i} M[i, j] * states[j]

This is exactly equivalent to the chunked training op (``mhla_chunk``): the
M[i, i]-weighted in-progress state reproduces the intra-chunk
``tril(q k^T) v`` term token by token.

Reference: ``mhla_nlp/fla/ops/mhla/naive.py:88-142`` (``naive_recurrent_mhla``)
keeps the same [list of chunk states + in-progress state] cache, but has an
off-by-one in its mixing-sum indexing (a zero state is inserted at slot 0,
shifting past states) and returns a never-updated final state; we implement
the chunk-consistent math instead (see ``mhla_chunk.py`` docstring).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .mhla_chunk import DEFAULT_CHUNK_SIZE, prepare_mixing_matrix


class MHLAState(NamedTuple):
    """Decode cache for one MHLA layer."""

    states: jax.Array  # [B, H, N_slots, Dk, Dv] fp32
    t: jax.Array  # int32 scalar: number of tokens consumed


def init_mhla_state(
    batch_size: int,
    num_heads: int,
    num_slots: int,
    head_k_dim: int,
    head_v_dim: int,
) -> MHLAState:
    return MHLAState(
        states=jnp.zeros(
            (batch_size, num_heads, num_slots, head_k_dim, head_v_dim), jnp.float32
        ),
        t=jnp.zeros((), jnp.int32),
    )


@partial(jax.jit, static_argnames=("chunk_size",))
def mhla_recurrent(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mixing_matrix: jax.Array,
    state: Optional[MHLAState] = None,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
) -> Tuple[jax.Array, MHLAState]:
    """Step the recurrence over T tokens (typically T == 1 in decode).

    Args:
      q, k: [B, T, H, Dk]; v: [B, T, H, Dv] (post feature-map / RoPE).
      mixing_matrix: [L, L] (or broadcastable); L defines the slot count.
      state: carry from previous call, or None to start at position 0.

    Returns:
      (o [B, T, H, Dv], new state)
    """
    in_dtype = q.dtype
    b, t_len, h, dk = q.shape
    dv = v.shape[-1]
    scale = dk**-0.5

    m = jnp.asarray(mixing_matrix)
    m = m.reshape(m.shape[0], m.shape[1]).astype(jnp.float32)
    n_slots = m.shape[0]

    if state is None:
        state = init_mhla_state(b, h, n_slots, dk, dv)

    q = q.astype(jnp.float32) * scale
    k = k.astype(jnp.float32)
    v = v.astype(jnp.float32)

    slot_ids = jnp.arange(n_slots, dtype=jnp.int32)

    def step(carry, qkv_t):
        states, t = carry
        q_t, k_t, v_t = qkv_t  # [B, H, D]
        i = t // chunk_size
        kv = jnp.einsum("bhk,bhv->bhkv", k_t, v_t)
        # one-hot masked add instead of a scatter: TPU scatter-with-dynamic-
        # index lowers ~20x slower than a dense select over the 32 slots
        onehot = (slot_ids == i).astype(states.dtype)
        states = states + onehot[None, None, :, None, None] * kv[:, :, None]
        w = jnp.where(slot_ids <= i, jnp.take(m, i, axis=0), 0.0)
        mixed = jnp.einsum("n,bhnkv->bhkv", w, states)
        o_t = jnp.einsum("bhk,bhkv->bhv", q_t, mixed)
        return (states, t + 1), o_t

    qkv = (
        q.transpose(1, 0, 2, 3),
        k.transpose(1, 0, 2, 3),
        v.transpose(1, 0, 2, 3),
    )
    (states, t), o = jax.lax.scan(step, (state.states, state.t), qkv)
    o = o.transpose(1, 0, 2, 3)
    return o.astype(in_dtype), MHLAState(states=states, t=t)


def state_from_chunk(states: jax.Array, t: int) -> MHLAState:
    """Build a decode cache from ``mhla_chunk(..., output_final_state=True)``.

    The chunked op zero-pads k/v, so the last (partial) chunk's state is
    already the correct in-progress accumulation.
    """
    return MHLAState(states=states.astype(jnp.float32), t=jnp.asarray(t, jnp.int32))
