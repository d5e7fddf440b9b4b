"""Gated Linear Attention (GLA) ops: chunked parallel + recurrent forms.

Baselines for the ``attn_extends in ('gla', 'simple_gla')`` LM variants
(reference layers ``fla/layers/gla.py`` / ``simple_gla.py``; ops
``fla/ops/gla/naive.py`` oracle and the Triton ``chunk_gla``
``fla/ops/gla/chunk.py:1014-1160`` whose two-level inter/intra decomposition
this follows).

Recurrence (per-key-dim log-decay gk <= 0):

    S_t = diag(exp(gk_t)) S_{t-1} + k_t^T v_t ;   o_t = (q_t * K**-0.5) S_t

Chunked form, per chunk with within-chunk cumulative decay G (inclusive):

    o_i   = (q_i exp(G_i)) @ S  +  sum_{j<=i} [q_i exp(G_i - G_j)] k_j v_j
    S'    = exp(G_last) * S + (k exp(G_last - G))^T v

Numerics: exp(G_i - G_j) for j <= i is bounded by exp(|gk| * chunk) — with
the reference's gate_logit_normalizer=16 and chunk 64 this stays ~e^2.8, so
the direct fp32 formulation is stable (the Triton kernel makes the same
assumption via its secondary chunking).

``gk`` may be per-key [B, T, H, K] (GLA) or per-head [B, T, H] (simple GLA,
broadcast over K).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .mhla_chunk import DEFAULT_CHUNK_SIZE, _pad_to_chunks


def _expand_gk(gk: jax.Array, dk: int) -> jax.Array:
    if gk.ndim == 3:  # [B, T, H] scalar decay per head
        return jnp.broadcast_to(gk[..., None], gk.shape + (dk,))
    return gk


@partial(jax.jit, static_argnames=("output_final_state",))
def gla_recurrent(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    gk: jax.Array,
    initial_state: Optional[jax.Array] = None,
    output_final_state: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Token-by-token oracle/decode path. q,k [B,T,H,K]; v [B,T,H,V]."""
    in_dtype = q.dtype
    b, t, h, dk = q.shape
    dv = v.shape[-1]
    scale = dk**-0.5
    gk = _expand_gk(gk, dk)
    q, k, v, gk = (x.astype(jnp.float32) for x in (q, k, v, gk))

    s0 = (
        initial_state.astype(jnp.float32)
        if initial_state is not None
        else jnp.zeros((b, h, dk, dv), jnp.float32)
    )

    def step(s, xs):
        q_t, k_t, v_t, g_t = xs  # [B, H, *]
        s = s * jnp.exp(g_t)[..., None] + jnp.einsum("bhk,bhv->bhkv", k_t, v_t)
        o_t = jnp.einsum("bhk,bhkv->bhv", q_t * scale, s)
        return s, o_t

    xs = tuple(x.transpose(1, 0, 2, 3) for x in (q, k, v, gk))
    s, o = jax.lax.scan(step, s0, xs)
    o = o.transpose(1, 0, 2, 3).astype(in_dtype)
    return o, (s if output_final_state else None)


@partial(jax.jit, static_argnames=("chunk_size", "output_final_state"))
def gla_chunk(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    gk: jax.Array,
    initial_state: Optional[jax.Array] = None,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    output_final_state: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Chunked parallel GLA (training path)."""
    in_dtype = q.dtype
    b, t, h, dk = q.shape
    dv = v.shape[-1]
    scale = dk**-0.5
    gk = _expand_gk(gk, dk)

    q = _pad_to_chunks(q.astype(jnp.float32), chunk_size)
    k = _pad_to_chunks(k.astype(jnp.float32), chunk_size)
    v = _pad_to_chunks(v.astype(jnp.float32), chunk_size)
    gk = _pad_to_chunks(gk.astype(jnp.float32), chunk_size)
    n = q.shape[1] // chunk_size
    c = chunk_size

    # [N, B, C, H, D] so the chunk axis scans first
    def chunked(x):
        return x.reshape(b, n, c, h, x.shape[-1]).transpose(1, 0, 2, 3, 4)

    q, k, v, gk = chunked(q), chunked(k), chunked(v), chunked(gk)
    g_cum = jnp.cumsum(gk, axis=2)  # inclusive within-chunk cumsum
    g_last = g_cum[:, :, -1]  # [N, B, H, K]

    tril = jnp.tril(jnp.ones((c, c), jnp.float32))

    s0 = (
        initial_state.astype(jnp.float32)
        if initial_state is not None
        else jnp.zeros((b, h, dk, dv), jnp.float32)
    )

    def scan_chunk(s, xs):
        q_i, k_i, v_i, g_i, g_end = xs  # [B, C, H, *] / g_end [B, H, K]
        q_dec = q_i * jnp.exp(g_i) * scale
        o_inter = jnp.einsum("bchk,bhkv->bchv", q_dec, s)
        # intra: A[i, j] = sum_k q_i exp(G_i - G_j) k_j, j <= i
        k_dec = k_i * jnp.exp(-g_i)
        attn = jnp.einsum("bchk,bmhk->bhcm", q_dec / scale, k_dec) * tril * scale
        o_intra = jnp.einsum("bhcm,bmhv->bchv", attn, v_i)
        # state update
        k_carry = k_i * jnp.exp(g_end[:, None] - g_i)
        s = s * jnp.exp(g_end)[..., None] + jnp.einsum(
            "bchk,bchv->bhkv", k_carry, v_i
        )
        return s, o_inter + o_intra

    s, o = jax.lax.scan(scan_chunk, s0, (q, k, v, g_cum, g_last))
    o = o.transpose(1, 0, 2, 3, 4).reshape(b, n * c, h, dv)[:, :t]
    return o.astype(in_dtype), (s if output_final_state else None)
