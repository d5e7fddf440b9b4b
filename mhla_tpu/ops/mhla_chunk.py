"""Causal chunked MHLA operator (jnp reference + XLA-optimized form).

Token-level Multi-Head Linear Attention (MHLA, arXiv:2601.07832): split the
sequence into chunks of ``chunk_size`` tokens, keep one KV state
``S_j = k_j^T v_j  (D_k x D_v)`` per chunk, and mix the chunk states with a
learned lower-triangular chunk-by-chunk mixing matrix ``M`` before queries
read them out:

    o_i = q_i @ ( sum_{j<i} M[i, j] * S_j )  +  M[i, i] * ( tril(q_i k_i^T) @ v_i )

Semantics match the reference training op
(``mhla_nlp/fla/ops/mhla/naive.py:11-83``, ``naive_chunk_simple_mhla_fixed``):
``scale = D_k**-0.5`` applied to q, fp32 compute, pad-to-chunk, the diagonal
M[i, i] scales the intra-chunk causal term.

Known reference drift (documented, not replicated): the reference *recurrent*
op (``naive.py:88-142``) disagrees with its own chunked op — it inserts a
zero state at slot 0 which shifts every past chunk state by one and drops the
most recent completed chunk from the mixing sum, and it returns a final
state that is never updated in the loop. The chunked op is the training
path, so here the chunked math above is the single source of truth and the
recurrent op (``mhla_recurrent.py``) is exactly equivalent to it.

On TPU everything below decomposes into large batched matmuls that XLA maps
straight onto the MXU; the Pallas kernel in
``mhla_tpu/kernels/mhla_chunk_pallas.py`` additionally fuses the intra-chunk
attention so the [.., C, C] score tile never reaches HBM.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

DEFAULT_CHUNK_SIZE = 64


def _pad_to_chunks(x: jax.Array, chunk_size: int) -> jax.Array:
    t = x.shape[1]
    pad = (-t) % chunk_size
    if pad:
        widths = ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2)
        x = jnp.pad(x, widths)
    return x


def prepare_mixing_matrix(mixing_matrix: jax.Array, num_chunks: int) -> jax.Array:
    """Slice/squeeze a mixing matrix to a dense fp32 [N, N]."""
    m = jnp.asarray(mixing_matrix)
    m = m.reshape(m.shape[0], m.shape[1])
    if m.shape[0] < num_chunks:
        raise ValueError(
            f"mixing_matrix has {m.shape[0]} chunk slots but the sequence spans "
            f"{num_chunks} chunks; increase the matrix size (num_slots >= "
            f"ceil(T / chunk_size))."
        )
    return m[:num_chunks, :num_chunks].astype(jnp.float32)


def init_causal_mixing_matrix(num_chunks: int) -> jax.Array:
    """Row-normalized lower-triangular init: M[i, j] = 1/(i+1) for j <= i.

    Matches the reference parameter init (``fla/layers/mhla.py:196-200``).
    """
    tri = jnp.tril(jnp.ones((num_chunks, num_chunks), dtype=jnp.float32))
    row_counts = jnp.arange(1, num_chunks + 1, dtype=jnp.float32)[:, None]
    return tri / row_counts


def clamp_causal_mixing_matrix(m: jax.Array, min_val: float = 1e-5) -> jax.Array:
    """Project the mixing matrix onto [min_val, 1] * tril.

    The reference clamps parameter *data* in-place each forward
    (``fla/layers/mhla.py:237``); in JAX this is a pure projection applied to
    the parameter value before use (and/or after the optimizer step).
    """
    return jnp.tril(jnp.clip(m, min_val, 1.0))


def chunk_segments(segment_ids: jax.Array, num_chunks: int, chunk_size: int):
    """Per-chunk segment id and document-relative chunk index.

    ``segment_ids`` [B, T] int32, non-decreasing along T, with document
    boundaries aligned to ``chunk_size`` (the varlen packer guarantees this;
    see ``data.lm_data.PackedVarlenIterator``). Right-pads beyond T are treated
    as a fresh segment. Returns (chunk_seg [B, N], rel [B, N]) where
    ``rel[b, n]`` is the chunk's index *within its own document* — the row
    of the mixing matrix it reads, exactly as if the document were run as
    its own sequence.
    """
    b, t = segment_ids.shape
    pad = num_chunks * chunk_size - t
    if pad:
        fresh = segment_ids.max(axis=1, keepdims=True) + 1
        segment_ids = jnp.concatenate(
            [segment_ids, jnp.broadcast_to(fresh, (b, pad))], axis=1
        )
    chunk_seg = segment_ids.reshape(b, num_chunks, chunk_size)[:, :, 0]
    idx = jnp.arange(num_chunks, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [
            jnp.ones((b, 1), bool),
            chunk_seg[:, 1:] != chunk_seg[:, :-1],
        ],
        axis=1,
    )
    start = jax.lax.cummax(jnp.where(is_start, idx[None, :], 0), axis=1)
    return chunk_seg, idx[None, :] - start


def segment_positions(segment_ids: jax.Array) -> jax.Array:
    """Per-token position within its own document: [B, T] int32, restarting
    at 0 at every segment boundary (the rotary/decode position stream for
    packed varlen rows)."""
    b, t = segment_ids.shape
    idx = jnp.arange(t, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((b, 1), bool), segment_ids[:, 1:] != segment_ids[:, :-1]],
        axis=1,
    )
    start = jax.lax.cummax(jnp.where(is_start, idx[None, :], 0), axis=1)
    return idx[None, :] - start


def build_segment_mixing(
    mixing_matrix: jax.Array, segment_ids: jax.Array,
    num_chunks: int, chunk_size: int,
) -> jax.Array:
    """Per-row effective mixing matrix for packed variable-length training.

    The reference trains on packed rows with cu_seqlens (flame collator,
    ``legacy/training/flame/data.py:157-246``); its chunked op ignores them
    (``fla/ops/mhla/naive.py:11`` swallows kwargs), so documents leak into
    each other's chunk states there. Here packed documents are exactly
    isolated: with chunk-aligned boundaries, chunk ``i`` of a document reads
    chunk ``j`` of the *same* document with weight ``M[i - s, j - s]``
    (``s`` = the document's first chunk), and cross-document weights are
    zero. The op stays linear in the mixing entries, so the fused Pallas
    path reuses the same kernels with a batched matrix.

    Returns mvar [B, N, N] fp32 (lower-triangular by construction).
    """
    m = jnp.asarray(mixing_matrix)
    m = m.reshape(m.shape[0], m.shape[1]).astype(jnp.float32)
    chunk_seg, rel = chunk_segments(segment_ids, num_chunks, chunk_size)
    # documents longer than the matrix would gather out of range; jnp clamps,
    # matching prepare_mixing_matrix's contract (packer enforces the bound)
    same = chunk_seg[:, :, None] == chunk_seg[:, None, :]
    mvar = m[rel[:, :, None], rel[:, None, :]]
    return jnp.tril(jnp.where(same, mvar, 0.0))


@partial(jax.jit, static_argnames=("chunk_size", "output_final_state"))
def mhla_chunk(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mixing_matrix: jax.Array,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    output_final_state: bool = False,
    segment_ids: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Causal chunked MHLA.

    Args:
      q, k: [B, T, H, Dk]  (post feature-map / RoPE)
      v:    [B, T, H, Dv]
      mixing_matrix: [L, L] (or [L, L, 1, 1, 1, 1]); rows/cols beyond the
        actual chunk count are ignored. Must satisfy L >= ceil(T/chunk_size)
        (or, with segment_ids, L >= the longest document's chunk count).
      chunk_size: tokens per chunk (reference default 64).
      output_final_state: also return the per-chunk state stack
        [B, H, N, Dk, Dv] (the decode cache layout).
      segment_ids: optional [B, T] int32 document ids for packed varlen
        training (non-decreasing, chunk-aligned boundaries). Documents are
        exactly isolated and each reads the mixing matrix at its own
        document-relative chunk indices — a packed row equals the documents
        run separately (see :func:`build_segment_mixing`).

    Returns:
      (o [B, T, H, Dv], states or None)

    Performance notes (TPU): tokens stay in their natural [B, (N C), H, D]
    layout — the chunk split is a free reshape and every contraction is an
    einsum with H as a batch axis, so XLA emits MXU matmuls without relayout
    transposes. bf16 inputs run the matmuls in bf16 with fp32 accumulation
    (``preferred_element_type``); fp32 inputs compute fully in fp32 (this is
    the path the tests compare against the loop oracle bit-exactly).
    """
    in_dtype = q.dtype
    b, t, h, dk = q.shape
    dv = v.shape[-1]
    scale = dk**-0.5
    f32 = jnp.float32
    # bf16 matmuls + fp32 accumulation when the input is bf16; else full fp32.
    cdt = jnp.bfloat16 if in_dtype == jnp.bfloat16 else f32

    q = _pad_to_chunks(q, chunk_size)
    k = _pad_to_chunks(k, chunk_size)
    v = _pad_to_chunks(v, chunk_size)
    n = q.shape[1] // chunk_size
    c = chunk_size

    if segment_ids is None:
        m = prepare_mixing_matrix(mixing_matrix, n)
        m_strict = jnp.tril(m, k=-1)  # inter-chunk weights [N, N]
        m_diag = jnp.diagonal(m)  # intra-chunk weights [N]
    else:
        mvar = build_segment_mixing(mixing_matrix, segment_ids, n, chunk_size)
        m_strict = jnp.tril(mvar, k=-1)  # [B, N, N]
        m_diag = jnp.diagonal(mvar, axis1=1, axis2=2)  # [B, N]

    # Free reshape: [B, N, C, H, D] — no transpose, H rides as a batch axis.
    q = (q.reshape(b, n, c, h, dk).astype(f32) * scale).astype(cdt)
    k = k.reshape(b, n, c, h, dk).astype(cdt)
    v = v.reshape(b, n, c, h, dv).astype(cdt)

    # Per-chunk KV states: S_j = k_j^T v_j  -> [B, N, H, Dk, Dv]  (MXU)
    states = jnp.einsum("bnchk,bnchv->bnhkv", k, v, preferred_element_type=f32)

    # Mix past states: S~_i = sum_{j<i} M[i,j] S_j — one [N,N]@[N,H*Dk*Dv] matmul
    if segment_ids is None:
        mixed = jnp.einsum(
            "ij,bjhkv->bihkv", m_strict.astype(cdt), states.astype(cdt),
            preferred_element_type=f32,
        )
    else:
        mixed = jnp.einsum(
            "bij,bjhkv->bihkv", m_strict.astype(cdt), states.astype(cdt),
            preferred_element_type=f32,
        )

    # Inter-chunk read-out  (MXU)
    o_inter = jnp.einsum(
        "bnchk,bnhkv->bnchv", q, mixed.astype(cdt), preferred_element_type=f32
    )

    # Intra-chunk causal attention, weighted by M[i, i]
    attn = jnp.einsum("bnchk,bnmhk->bnhcm", q, k, preferred_element_type=f32)
    tril = jnp.tril(jnp.ones((c, c), dtype=f32))
    attn = (attn * tril).astype(cdt)
    o_intra = jnp.einsum(
        "bnhcm,bnmhv->bnchv", attn, v, preferred_element_type=f32
    )
    if segment_ids is None:
        o_intra = o_intra * m_diag[None, :, None, None, None]
    else:
        o_intra = o_intra * m_diag[:, :, None, None, None]

    o = (o_inter + o_intra).reshape(b, n * c, h, dv)[:, :t]
    states_out = states.transpose(0, 2, 1, 3, 4) if output_final_state else None
    return o.astype(in_dtype), states_out


def mhla_chunk_ref(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mixing_matrix: jax.Array,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    output_final_state: bool = False,
):
    """Loop-form oracle (python loop over chunks) used only in tests."""
    in_dtype = q.dtype
    b, t, h, dk = q.shape
    dv = v.shape[-1]
    scale = dk**-0.5

    q = _pad_to_chunks(q.astype(jnp.float32), chunk_size)
    k = _pad_to_chunks(k.astype(jnp.float32), chunk_size)
    v = _pad_to_chunks(v.astype(jnp.float32), chunk_size)
    n = q.shape[1] // chunk_size
    m = prepare_mixing_matrix(mixing_matrix, n)

    def chunk_of(x, i):
        return x[:, i * chunk_size:(i + 1) * chunk_size]  # [B, C, H, D]

    states = []
    for j in range(n):
        kj, vj = chunk_of(k, j), chunk_of(v, j)
        states.append(jnp.einsum("bchk,bchv->bhkv", kj, vj))

    tril = jnp.tril(jnp.ones((chunk_size, chunk_size), dtype=jnp.float32))
    outs = []
    for i in range(n):
        qi = chunk_of(q, i) * scale
        ki, vi = chunk_of(k, i), chunk_of(v, i)
        prefix = sum(
            (m[i, j] * states[j] for j in range(i)),
            start=jnp.zeros((b, h, dk, dv), jnp.float32),
        )
        o_inter = jnp.einsum("bchk,bhkv->bchv", qi, prefix)
        attn = jnp.einsum("bchk,bdhk->bhcd", qi, ki) * tril
        o_intra = m[i, i] * jnp.einsum("bhcd,bdhv->bchv", attn, vi)
        outs.append(o_inter + o_intra)
    o = jnp.concatenate(outs, axis=1)[:, :t]
    if output_final_state:
        return o.astype(in_dtype), jnp.stack(states, axis=2)
    return o.astype(in_dtype), None
