"""Pallas TPU kernel for the chunked-MHLA output phase.

The chunked MHLA op decomposes into (SURVEY.md section 7, build step 3):

  A. per-chunk states   S_j = k_j^T v_j          — dense batched matmul (XLA)
  B. state mixing       S~ = tril(M,-1) @ S      — one [N,N]@[N,H*Dk*Dv] (XLA)
  C. output             o_i = q_i @ S~_i + M[i,i] * (tril(q_i k_i^T) @ v_i)

Phases A/B are single large MXU matmuls that XLA already emits optimally; the
win is phase C, where XLA materializes the [B,H,N,C,C] intra-chunk score
tensor in HBM. This kernel fuses phase C so scores live only in VMEM
(registers), with fp32 accumulation, over a (B, H, N) grid.

The public entry ``mhla_chunk_fused`` is a custom_vjp op: forward runs the
Pallas kernel (XLA fallback off-TPU), backward recomputes through the jnp
formulation (flash-style recompute — the reference's Triton GLA kernels make
the same choice, ``fla/ops/gla/chunk.py:1190-1196``).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _phase_c_kernel(g_chunks, mdiag_ref, q_ref, k_ref, v_ref, mixed_ref, o_ref):
    """One (b, h, n-group) cell over ``g_chunks`` consecutive chunks:
    o_j = q_j @ mixed_j + M[j,j] * (tril(q_j k_j^T) @ v_j)."""
    ng = pl.program_id(2)
    c = q_ref.shape[2]
    dk = q_ref.shape[3]
    dv = v_ref.shape[3]
    row = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    causal = row >= col
    for g in range(g_chunks):  # static unroll amortizes grid overhead
        q = q_ref[0, g]  # [C, Dk]
        k = k_ref[0, g]
        v = v_ref[0, g]
        mixed = mixed_ref[0, g]  # [Dk, Dv]
        o_inter = jnp.dot(
            q, mixed.astype(q.dtype), preferred_element_type=jnp.float32
        )
        attn = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        attn = jnp.where(causal, attn, 0.0).astype(v.dtype)
        o_intra = jnp.dot(attn, v, preferred_element_type=jnp.float32)
        o = o_inter + mdiag_ref[ng * g_chunks + g] * o_intra
        o_ref[0, g] = o.astype(o_ref.dtype)


def _phase_c_pallas(
    q: jax.Array,  # [B, N, C, H, Dk] (scaled)
    k: jax.Array,  # [B, N, C, H, Dk]
    v: jax.Array,  # [B, N, C, H, Dv]
    mixed: jax.Array,  # [B, N, H, Dk, Dv]
    m_diag: jax.Array,  # [N] fp32
) -> jax.Array:
    b, n, c, h, dk = q.shape
    dv = v.shape[-1]

    # consecutive chunks per grid cell (amortizes per-cell overhead; VMEM
    # budget ~ g * (2*C*Dk + C*Dv + 4*Dk*Dv + C*Dv) bytes, well under 16 MB)
    g = 1
    for cand in (8, 4, 2):
        if n % cand == 0:
            g = cand
            break

    # Head-folded 4D views (free reshapes): per-head [C, D] tiles are blocks
    # of the last axis, satisfying the (8, 128) tiling rule with no relayout.
    q4 = q.reshape(b, n, c, h * dk)
    k4 = k.reshape(b, n, c, h * dk)
    v4 = v.reshape(b, n, c, h * dv)
    mixed4 = mixed.reshape(b, n, h * dk, dv)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, h, n // g),
        in_specs=[
            pl.BlockSpec((1, g, c, dk), lambda bi, hi, ni, md: (bi, ni, 0, hi)),
            pl.BlockSpec((1, g, c, dk), lambda bi, hi, ni, md: (bi, ni, 0, hi)),
            pl.BlockSpec((1, g, c, dv), lambda bi, hi, ni, md: (bi, ni, 0, hi)),
            pl.BlockSpec((1, g, dk, dv), lambda bi, hi, ni, md: (bi, ni, hi, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, g, c, dv), lambda bi, hi, ni, md: (bi, ni, 0, hi)
        ),
    )
    flops = 2 * b * h * n * (c * dk * dv + c * c * dk + c * c * dv)
    out = pl.pallas_call(
        functools.partial(_phase_c_kernel, g),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n, c, h * dv), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=q.size * 2 + k.size * 2 + v.size * 2 + mixed.size * 4,
            transcendentals=0,
        ),
    )(m_diag, q4, k4, v4, mixed4)
    return out.reshape(b, n, c, h, dv)


def _core_xla(q5, k5, v5, mixed, m_diag):
    """jnp phase C (oracle + backward path)."""
    f32 = jnp.float32
    cdt = q5.dtype
    o_inter = jnp.einsum(
        "bnchk,bnhkv->bnchv", q5, mixed.astype(cdt), preferred_element_type=f32
    )
    attn = jnp.einsum("bnchk,bnmhk->bnhcm", q5, k5, preferred_element_type=f32)
    c = q5.shape[2]
    attn = (attn * jnp.tril(jnp.ones((c, c), f32))).astype(cdt)
    o_intra = jnp.einsum(
        "bnhcm,bnmhv->bnchv", attn, v5, preferred_element_type=f32
    ) * m_diag[None, :, None, None, None]
    return (o_inter + o_intra).astype(q5.dtype)


def _pallas_compatible(c: int, dk: int, dv: int) -> bool:
    """Mosaic block rule: last two block dims must be (multiple of 8,
    multiple of 128) — chunk rows x head dim tiles."""
    return c % 8 == 0 and dk % 128 == 0 and dv % 128 == 0


@jax.custom_vjp
def _phase_c(q5, k5, v5, mixed, m_diag):
    c, dk, dv = q5.shape[2], q5.shape[4], v5.shape[4]
    if jax.default_backend() == "tpu" and _pallas_compatible(c, dk, dv):
        return _phase_c_pallas(q5, k5, v5, mixed, m_diag)
    return _core_xla(q5, k5, v5, mixed, m_diag)


def _phase_c_fwd(q5, k5, v5, mixed, m_diag):
    return _phase_c(q5, k5, v5, mixed, m_diag), (q5, k5, v5, mixed, m_diag)


def _phase_c_bwd(res, g):
    _, vjp = jax.vjp(_core_xla, *res)
    return vjp(g)


_phase_c.defvjp(_phase_c_fwd, _phase_c_bwd)


@functools.partial(jax.jit, static_argnames=("chunk_size", "output_final_state"))
def mhla_chunk_fused(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mixing_matrix: jax.Array,
    chunk_size: int = 64,
    output_final_state: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Drop-in for :func:`mhla_tpu.ops.mhla_chunk` with the fused phase-C
    Pallas kernel on TPU (same [B, T, H, D] API and fp32-accum numerics)."""
    from ..ops.mhla_chunk import _pad_to_chunks, prepare_mixing_matrix

    in_dtype = q.dtype
    b, t, h, dk = q.shape
    dv = v.shape[-1]
    scale = dk**-0.5
    f32 = jnp.float32
    cdt = jnp.bfloat16 if in_dtype == jnp.bfloat16 else f32

    q = _pad_to_chunks(q, chunk_size)
    k = _pad_to_chunks(k, chunk_size)
    v = _pad_to_chunks(v, chunk_size)
    n = q.shape[1] // chunk_size
    c = chunk_size

    m = prepare_mixing_matrix(mixing_matrix, n)
    m_strict = jnp.tril(m, k=-1)
    m_diag = jnp.diagonal(m)

    q5 = (q.reshape(b, n, c, h, dk).astype(f32) * scale).astype(cdt)
    k5 = k.reshape(b, n, c, h, dk).astype(cdt)
    v5 = v.reshape(b, n, c, h, dv).astype(cdt)

    states = jnp.einsum("bnchk,bnchv->bnhkv", k5, v5, preferred_element_type=f32)
    mixed = jnp.einsum(
        "ij,bjhkv->bihkv", m_strict.astype(cdt), states.astype(cdt),
        preferred_element_type=f32,
    )

    o = _phase_c(q5, k5, v5, mixed, m_diag)
    o = o.reshape(b, n * c, h, dv)[:, :t].astype(in_dtype)
    states_out = states.transpose(0, 2, 1, 3, 4) if output_final_state else None
    return o, states_out
