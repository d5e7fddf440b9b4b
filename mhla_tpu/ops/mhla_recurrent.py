"""Recurrent (decode-mode) causal MHLA operator.

O(1)-per-token autoregressive form of ``mhla_chunk``. The decode state
exploits the structure of the mixing sum: for a token in chunk i,

    o_t = q_t @ ( sum_{j<i} M[i, j] S_j  +  M[i, i] S_cur )

where the prefix readout ``sum_{j<i} M[i, j] S_j`` only changes when i
changes — once every ``chunk_size`` tokens. So the cache carries it
explicitly and the per-token work touches only two [Dk, Dv] tiles:

    state.states : [B, H, N_slots, Dk, Dv]  completed chunk states
    state.mixed  : [B, H, Dk, Dv]           cached prefix readout (row i)
    state.s_cur  : [B, H, Dk, Dv]           in-progress chunk accumulation
    state.t      : int32                    tokens consumed

Per token: ``s_cur += k^T v; o = q @ (mixed + M[i,i] * s_cur)``. At a chunk
boundary a ``lax.cond`` commits s_cur into the stack and re-mixes — the
full-stack pass amortizes to 1/chunk_size of the naive cost. (The naive
form re-read the whole [N, Dk, Dv] stack every token: ~16 MB/layer/token at
the 340M shape, which dominated decode latency.)

This is exactly equivalent to the chunked training op (``mhla_chunk``): the
M[i, i]-weighted in-progress state reproduces the intra-chunk
``tril(q k^T) v`` term token by token.

Reference: ``mhla_nlp/fla/ops/mhla/naive.py:88-142`` (``naive_recurrent_mhla``)
keeps a [list of chunk states + in-progress state] cache, but has an
off-by-one in its mixing-sum indexing (a zero state is inserted at slot 0,
shifting past states) and returns a never-updated final state; we implement
the chunk-consistent math instead (see ``mhla_chunk.py`` docstring).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from .mhla_chunk import DEFAULT_CHUNK_SIZE

Int = Union[int, jax.Array]


class MHLAState(NamedTuple):
    """Decode cache for one MHLA layer."""

    states: jax.Array  # [B, H, N_slots, Dk, Dv] fp32 — completed chunks
    mixed: jax.Array  # [B, H, Dk, Dv] fp32 — cached prefix readout
    s_cur: jax.Array  # [B, H, Dk, Dv] fp32 — in-progress chunk state
    t: jax.Array  # int32 scalar: number of tokens consumed


def _prep_m(mixing_matrix: jax.Array) -> jax.Array:
    m = jnp.asarray(mixing_matrix)
    return m.reshape(m.shape[0], m.shape[1]).astype(jnp.float32)


def _remix(states: jax.Array, m: jax.Array, i: jax.Array) -> jax.Array:
    """sum_{j<i} M[i, j] states[j] — the prefix readout for chunk row i."""
    n = m.shape[0]
    w = jnp.where(jnp.arange(n) < i, jnp.take(m, i, axis=0), 0.0)
    return jnp.einsum("n,bhnkv->bhkv", w, states)


def init_mhla_state(
    batch_size: int,
    num_heads: int,
    num_slots: int,
    head_k_dim: int,
    head_v_dim: int,
) -> MHLAState:
    tile = (batch_size, num_heads, head_k_dim, head_v_dim)
    return MHLAState(
        states=jnp.zeros(
            (batch_size, num_heads, num_slots, head_k_dim, head_v_dim),
            jnp.float32,
        ),
        mixed=jnp.zeros(tile, jnp.float32),
        s_cur=jnp.zeros(tile, jnp.float32),
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

    m = _prep_m(mixing_matrix)
    n_slots = m.shape[0]
    m_diag = jnp.diagonal(m)

    if state is None:
        state = init_mhla_state(b, h, n_slots, dk, dv)

    q = q.astype(jnp.float32) * scale
    k = k.astype(jnp.float32)
    v = v.astype(jnp.float32)

    def step(carry, qkv_t):
        states, mixed, s_cur, t = carry
        q_t, k_t, v_t = qkv_t  # [B, H, D]
        i = t // chunk_size

        s_cur = s_cur + jnp.einsum("bhk,bhv->bhkv", k_t, v_t)
        diag = jnp.take(m_diag, i)
        o_t = jnp.einsum("bhk,bhkv->bhv", q_t, mixed + diag * s_cur)

        def commit(ops):
            # end of chunk i: seal the finished chunk into its slot and
            # recompute the prefix readout for row i+1 — runs once per
            # chunk_size tokens (lax.cond executes only the taken branch
            # for scalar predicates). This invariant (commit at chunk END)
            # makes resuming from any chunked prefill position safe.
            states, s_cur, _ = ops
            states = jax.lax.dynamic_update_slice(
                states, s_cur[:, :, None], (0, 0, i, 0, 0)
            )
            return states, jnp.zeros_like(s_cur), _remix(states, m, i + 1)

        chunk_done = (t + 1) % chunk_size == 0
        states, s_cur, mixed = jax.lax.cond(
            chunk_done, commit, lambda ops: ops, (states, s_cur, mixed)
        )
        return (states, mixed, s_cur, t + 1), o_t

    qkv = (
        q.transpose(1, 0, 2, 3),
        k.transpose(1, 0, 2, 3),
        v.transpose(1, 0, 2, 3),
    )
    carry0 = (state.states, state.mixed, state.s_cur, state.t)
    (states, mixed, s_cur, t), o = jax.lax.scan(step, carry0, qkv)
    o = o.transpose(1, 0, 2, 3)
    return o.astype(in_dtype), MHLAState(
        states=states, mixed=mixed, s_cur=s_cur, t=t
    )


def state_from_chunk(
    states: jax.Array,
    t: Int,
    mixing_matrix: jax.Array,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    num_slots: Optional[int] = None,
) -> MHLAState:
    """Build a decode cache from ``mhla_chunk(..., output_final_state=True)``.

    ``states``: [B, H, N, Dk, Dv] per-chunk stack (the chunked op zero-pads
    k/v, so the last partial chunk's slot already holds the correct
    in-progress accumulation). Slots are padded to ``num_slots`` when given.
    """
    states = states.astype(jnp.float32)
    m = _prep_m(mixing_matrix)
    n_slots = num_slots or m.shape[0]
    if states.shape[2] < n_slots:
        pad = n_slots - states.shape[2]
        states = jnp.pad(states, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)))
    t = jnp.asarray(t, jnp.int32)
    i = t // chunk_size
    # current chunk's partial state lives in slot i (zero when t is on a
    # boundary — that slot is still empty)
    s_cur = jax.lax.dynamic_index_in_dim(states, i, axis=2, keepdims=False)
    return MHLAState(
        states=states, mixed=_remix(states, m, i), s_cur=s_cur, t=t
    )
