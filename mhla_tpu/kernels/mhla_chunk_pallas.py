"""Pallas TPU kernels for chunked MHLA (fused forward + fused backward).

The chunked MHLA op decomposes into (SURVEY.md section 7, build step 3):

  A. per-chunk states   S_j = k_j^T v_j          — dense batched matmul (XLA)
  B. state mixing       S~ = tril(M,-1) @ S      — one [N,N]@[N,H*Dk*Dv] GEMM (XLA)
  C. output             o_i = q_i @ S~_i + M[i,i] * (tril(q_i k_i^T) @ v_i)

Phases A/B are single large MXU GEMMs that XLA emits optimally (B keeps the
tiny [N,N] matrix resident and streams the state stack exactly once). The
Pallas work is phase C — where XLA would materialize the [B,H,N,C,C]
intra-chunk score tensor in HBM — plus its backward.

HBM-traffic design (the op is bandwidth-bound at ~256 FLOP/byte ceiling):

- ``states`` and ``mixed`` are materialized in the compute dtype (bf16 for
  bf16 inputs) — fp32 accumulation inside the GEMMs, cast in the epilogue.
  Phase C always consumed them at compute dtype anyway, so this halves the
  two largest intermediates (268 MB -> 134 MB each at 32k/8h/128d) with
  bit-identical kernel inputs.
- The q scale (Dk^-0.5) is folded into the mixing matrix: the output is
  linear in both the inter term (q @ (scale*M) S) and the intra term
  ((scale*M[i,i]) tril(q k^T) v), so scaling M replaces a full scaled copy
  of q (+-128 MB of traffic).
- The backward is a second Pallas kernel over the same grid, recomputing the
  intra-chunk scores in VMEM (flash-style recompute; the reference's Triton
  GLA kernels make the same choice, ``fla/ops/gla/chunk.py:1190-1196``) and
  emitting dq/dk/dv/dmixed plus a per-(B,H) partial for the diagonal
  mixing-matrix gradient.

Semantics match ``mhla_tpu.ops.mhla_chunk`` exactly (same oracle tests).
Reference op: ``mhla_nlp/fla/ops/mhla/naive.py:11-83``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-cell VMEM budget for picking the chunk-group size (bytes); the Pallas
# pipeline double-buffers every block, so keep the working set well under
# the ~16 MB of VMEM.
_VMEM_BUDGET = 6 * 1024 * 1024

# Tests flip this to exercise the real kernel bodies (indexing, masking,
# accumulation) in Pallas interpret mode on CPU, where the production path
# would otherwise take the _core_xla fallback.
FORCE_INTERPRET = False


def _interpret() -> bool:
    return FORCE_INTERPRET and jax.default_backend() != "tpu"


def _pick_group(n: int, c: int, dk: int, dv: int, itemsize: int, n_bufs: int) -> int:
    """Largest divisor g of n whose n_bufs tensor tiles fit the VMEM budget."""
    per_chunk = (3 * c * max(dk, dv) + 2 * dk * dv + c * dv) * itemsize
    for g in (32, 16, 8, 4, 2):
        if n % g == 0 and n_bufs * g * per_chunk <= _VMEM_BUDGET:
            return g
    return 1


# ---------------------------------------------------------------------------
# phase A (per-chunk states) — Pallas so the head axis never needs a
# relayout: the 5D einsum formulation (bnchk,bnchv->bnhkv) makes XLA
# transpose q/k/v into head-major order (~0.5 GB of traffic at 32k).
# ---------------------------------------------------------------------------


def _phase_a_kernel(g_chunks, k_ref, v_ref, s_ref):
    for g in range(g_chunks):
        k = k_ref[0, g]  # [C, Dk]
        v = v_ref[0, g]  # [C, Dv]
        s = jnp.dot(k.T, v, preferred_element_type=jnp.float32)
        s_ref[0, g] = s.astype(s_ref.dtype)


def _phase_a_pallas(k: jax.Array, v: jax.Array) -> jax.Array:
    """k: [B, N, C, H, Dk], v: [B, N, C, H, Dv] -> states [B, N, H*Dk, Dv]."""
    b, n, c, h, dk = k.shape
    dv = v.shape[-1]
    g = _pick_group(n, c, dk, dv, k.dtype.itemsize, n_bufs=2)
    k4 = k.reshape(b, n, c, h * dk)
    v4 = v.reshape(b, n, c, h * dv)
    grid_spec = pl.GridSpec(
        grid=(b, h, n // g),
        in_specs=[
            pl.BlockSpec((1, g, c, dk), lambda bi, hi, ni: (bi, ni, 0, hi)),
            pl.BlockSpec((1, g, c, dv), lambda bi, hi, ni: (bi, ni, 0, hi)),
        ],
        out_specs=pl.BlockSpec(
            (1, g, dk, dv), lambda bi, hi, ni: (bi, ni, hi, 0)
        ),
    )
    return pl.pallas_call(
        functools.partial(_phase_a_kernel, g),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n, h * dk, dv), k.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * n * c * dk * dv,
            bytes_accessed=(k.size + v.size + b * n * h * dk * dv)
            * k.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(k4, v4)


def _phase_a_bwd_kernel(g_chunks, k_ref, v_ref, ds_ref, dk_ref, dv_ref):
    for g in range(g_chunks):
        k = k_ref[0, g]
        v = v_ref[0, g]
        ds = ds_ref[0, g]  # [Dk, Dv]
        dk = jnp.dot(v, ds.T.astype(v.dtype), preferred_element_type=jnp.float32)
        dv = jnp.dot(k, ds.astype(k.dtype), preferred_element_type=jnp.float32)
        dk_ref[0, g] = dk.astype(dk_ref.dtype)
        dv_ref[0, g] = dv.astype(dv_ref.dtype)


def _phase_a_bwd_pallas(k, v, ds4):
    b, n, c, h, dk = k.shape
    dv = v.shape[-1]
    g = _pick_group(n, c, dk, dv, k.dtype.itemsize, n_bufs=3)
    k4 = k.reshape(b, n, c, h * dk)
    v4 = v.reshape(b, n, c, h * dv)
    tok = lambda d: pl.BlockSpec(  # noqa: E731
        (1, g, c, d), lambda bi, hi, ni: (bi, ni, 0, hi)
    )
    st = pl.BlockSpec((1, g, dk, dv), lambda bi, hi, ni: (bi, ni, hi, 0))
    outs = pl.pallas_call(
        functools.partial(_phase_a_bwd_kernel, g),
        grid_spec=pl.GridSpec(
            grid=(b, h, n // g),
            in_specs=[tok(dk), tok(dv), st],
            out_specs=(tok(dk), tok(dv)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, c, h * dk), k.dtype),
            jax.ShapeDtypeStruct((b, n, c, h * dv), v.dtype),
        ),
        interpret=_interpret(),
    )(k4, v4, ds4)
    return outs[0].reshape(b, n, c, h, dk), outs[1].reshape(b, n, c, h, dv)


def _phase_a_xla(k5, v5):
    b, n, c, h, dk = k5.shape
    dv = v5.shape[-1]
    states = jnp.einsum(
        "bnchk,bnchv->bnhkv", k5, v5, preferred_element_type=jnp.float32
    ).astype(k5.dtype)
    return states.reshape(b, n, h * dk, dv)


@jax.custom_vjp
def _phase_a(k5, v5):
    """[B,N,C,H,Dk] x [B,N,C,H,Dv] -> per-chunk states [B,N,H*Dk,Dv]."""
    if _use_pallas(k5.shape[2], k5.shape[4], v5.shape[4]):
        return _phase_a_pallas(k5, v5)
    return _phase_a_xla(k5, v5)


def _phase_a_fwd(k5, v5):
    return _phase_a(k5, v5), (k5, v5)


def _phase_a_bwd(res, ds4):
    k5, v5 = res
    if _use_pallas(k5.shape[2], k5.shape[4], v5.shape[4]):
        return _phase_a_bwd_pallas(k5, v5, ds4.astype(k5.dtype))
    _, vjp = jax.vjp(_phase_a_xla, k5, v5)
    return vjp(ds4)


_phase_a.defvjp(_phase_a_fwd, _phase_a_bwd)


# ---------------------------------------------------------------------------
# forward phase C
# ---------------------------------------------------------------------------


def _phase_c_kernel(g_chunks, mdiag_ref, q_ref, k_ref, v_ref, mixed_ref, o_ref):
    """One (b, h, n-group) cell over ``g_chunks`` consecutive chunks:
    o_j = q_j @ mixed_j + M[j,j] * (tril(q_j k_j^T) @ v_j)."""
    ng = pl.program_id(2)
    c = q_ref.shape[2]
    row = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    causal = row >= col
    for g in range(g_chunks):  # static unroll amortizes grid overhead
        q = q_ref[0, g]  # [C, Dk]
        k = k_ref[0, g]
        v = v_ref[0, g]
        mixed = mixed_ref[0, g]  # [Dk, Dv] (compute dtype)
        o_inter = jnp.dot(
            q, mixed.astype(q.dtype), preferred_element_type=jnp.float32
        )
        attn = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        attn = jnp.where(causal, attn, 0.0).astype(v.dtype)
        o_intra = jnp.dot(attn, v, preferred_element_type=jnp.float32)
        o = o_inter + mdiag_ref[ng * g_chunks + g] * o_intra
        o_ref[0, g] = o.astype(o_ref.dtype)


def _phase_c_pallas(
    q: jax.Array,  # [B, N, C, H, Dk]  (raw; scale folded into m_diag/mixed)
    k: jax.Array,  # [B, N, C, H, Dk]
    v: jax.Array,  # [B, N, C, H, Dv]
    mixed: jax.Array,  # [B, N, H, Dk, Dv]  (compute dtype, scale folded)
    m_diag: jax.Array,  # [N] fp32 (scale folded)
) -> jax.Array:
    b, n, c, h, dk = q.shape
    dv = v.shape[-1]
    g = _pick_group(n, c, dk, dv, q.dtype.itemsize, n_bufs=2)

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
    nbytes = q.dtype.itemsize
    out = pl.pallas_call(
        functools.partial(_phase_c_kernel, g),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n, c, h * dv), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(q.size + k.size + 2 * v.size + mixed.size) * nbytes,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(m_diag, q4, k4, v4, mixed4)
    return out.reshape(b, n, c, h, dv)


# ---------------------------------------------------------------------------
# backward phase C
# ---------------------------------------------------------------------------


def _phase_c_bwd_kernel(
    g_chunks,
    mdiag_ref,
    q_ref,
    k_ref,
    v_ref,
    mixed_ref,
    do_ref,
    dq_ref,
    dk_ref,
    dv_ref,
    dmixed_ref,
    dmd_ref,
):
    """Per-chunk backward (all terms chunk-local):

      attn    = tril(q k^T)                       (recomputed in VMEM)
      dmdiag  = <attn @ v, do>                    (per-(b,h) partial)
      dAttn   = mdiag * tril(do v^T)
      dq      = do mixed^T + dAttn k
      dk      = dAttn^T q
      dv      = mdiag * attn^T do
      dmixed  = q^T do
    """
    ng = pl.program_id(2)
    c = q_ref.shape[2]
    row = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    causal = row >= col
    f32 = jnp.float32
    for g in range(g_chunks):
        q = q_ref[0, g]
        k = k_ref[0, g]
        v = v_ref[0, g]
        mixed = mixed_ref[0, g]
        do = do_ref[0, g]
        md = mdiag_ref[ng * g_chunks + g]

        attn = jnp.dot(q, k.T, preferred_element_type=f32)
        attn = jnp.where(causal, attn, 0.0).astype(v.dtype)
        ov = jnp.dot(attn, v, preferred_element_type=f32)
        # per-chunk dmdiag partial as a [Dv] lane vector (summed on the host
        # side over b, h, lanes) — scalar stores don't tile on TPU
        dmd_ref[0, 0, g, :] = jnp.sum(ov * do.astype(f32), axis=0)

        dattn = jnp.dot(do, v.T, preferred_element_type=f32)
        dattn = jnp.where(causal, dattn * md, 0.0).astype(q.dtype)

        dq = jnp.dot(do, mixed.T.astype(do.dtype), preferred_element_type=f32)
        dq = dq + jnp.dot(dattn, k, preferred_element_type=f32)
        dq_ref[0, g] = dq.astype(dq_ref.dtype)

        dk = jnp.dot(dattn.T, q, preferred_element_type=f32)
        dk_ref[0, g] = dk.astype(dk_ref.dtype)

        dv = jnp.dot(attn.T, do, preferred_element_type=f32) * md
        dv_ref[0, g] = dv.astype(dv_ref.dtype)

        dmixed = jnp.dot(q.T, do, preferred_element_type=f32)
        dmixed_ref[0, g] = dmixed.astype(dmixed_ref.dtype)


def _phase_c_bwd_pallas(q, k, v, mixed, m_diag, do):
    b, n, c, h, dk = q.shape
    dv = v.shape[-1]
    g = _pick_group(n, c, dk, dv, q.dtype.itemsize, n_bufs=4)

    q4 = q.reshape(b, n, c, h * dk)
    k4 = k.reshape(b, n, c, h * dk)
    v4 = v.reshape(b, n, c, h * dv)
    mixed4 = mixed.reshape(b, n, h * dk, dv)
    do4 = do.reshape(b, n, c, h * dv)

    tok_spec = lambda d: pl.BlockSpec(  # noqa: E731
        (1, g, c, d), lambda bi, hi, ni, md: (bi, ni, 0, hi)
    )
    state_spec = pl.BlockSpec(
        (1, g, dk, dv), lambda bi, hi, ni, md: (bi, ni, hi, 0)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, h, n // g),
        in_specs=[tok_spec(dk), tok_spec(dk), tok_spec(dv), state_spec, tok_spec(dv)],
        out_specs=(
            tok_spec(dk),
            tok_spec(dk),
            tok_spec(dv),
            state_spec,
            pl.BlockSpec((1, 1, g, dv), lambda bi, hi, ni, md: (bi, hi, ni, 0)),
        ),
    )
    flops = 2 * b * h * n * (
        3 * c * dk * dv + 4 * c * c * dk + 3 * c * c * dv
    )
    outs = pl.pallas_call(
        functools.partial(_phase_c_bwd_kernel, g),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b, n, c, h * dk), q.dtype),
            jax.ShapeDtypeStruct((b, n, c, h * dk), k.dtype),
            jax.ShapeDtypeStruct((b, n, c, h * dv), v.dtype),
            jax.ShapeDtypeStruct((b, n, h * dk, dv), mixed.dtype),
            jax.ShapeDtypeStruct((b, h, n, dv), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2
            * (q.size + k.size + 2 * v.size + mixed.size)
            * q.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(m_diag, q4, k4, v4, mixed4, do4)
    dq4, dk4, dv4, dmixed4, dmd_bh = outs
    dq = dq4.reshape(b, n, c, h, dk)
    dk_ = dk4.reshape(b, n, c, h, dk)
    dv_ = dv4.reshape(b, n, c, h, dv)
    dmixed = dmixed4.reshape(b, n, h, dk, dv)
    dmd = dmd_bh.sum(axis=(0, 1, 3)).astype(m_diag.dtype)
    return dq, dk_, dv_, dmixed, dmd


# ---------------------------------------------------------------------------
# XLA fallback (CPU path + oracle)
# ---------------------------------------------------------------------------


def _core_xla(q5, k5, v5, mixed, m_diag):
    """jnp phase C (CPU fallback + backward oracle)."""
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


def _use_pallas(c: int, dk: int, dv: int) -> bool:
    on_tpu = jax.default_backend() == "tpu"
    return (on_tpu or _interpret()) and _pallas_compatible(c, dk, dv)


@jax.custom_vjp
def _phase_c(q5, k5, v5, mixed, m_diag):
    if _use_pallas(q5.shape[2], q5.shape[4], v5.shape[4]):
        return _phase_c_pallas(q5, k5, v5, mixed, m_diag)
    return _core_xla(q5, k5, v5, mixed, m_diag)


def _phase_c_fwd(q5, k5, v5, mixed, m_diag):
    return _phase_c(q5, k5, v5, mixed, m_diag), (q5, k5, v5, mixed, m_diag)


def _phase_c_bwd(res, g):
    q5, k5, v5, mixed, m_diag = res
    if _use_pallas(q5.shape[2], q5.shape[4], v5.shape[4]):
        g = g.astype(q5.dtype)
        return _phase_c_bwd_pallas(q5, k5, v5, mixed, m_diag, g)
    _, vjp = jax.vjp(_core_xla, q5, k5, v5, mixed, m_diag)
    return vjp(g)


_phase_c.defvjp(_phase_c_fwd, _phase_c_bwd)


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("chunk_size", "output_final_state"))
def mhla_chunk_fused(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mixing_matrix: jax.Array,
    chunk_size: int = 64,
    output_final_state: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Drop-in for :func:`mhla_tpu.ops.mhla_chunk` with fused Pallas phase C
    (fwd + bwd) on TPU — same [B, T, H, D] API, fp32-accumulation numerics.

    Traffic notes vs the plain op: states/mixed live in the compute dtype
    (phase C consumed them at compute dtype already) and the q scale is
    folded into the mixing matrix, so for bf16 inputs nothing fp32 larger
    than the [N, N] mixing matrix ever reaches HBM.
    """
    from ..ops.mhla_chunk import _pad_to_chunks, prepare_mixing_matrix

    in_dtype = q.dtype
    b, t, h, dk = q.shape
    dv = v.shape[-1]
    f32 = jnp.float32
    cdt = jnp.bfloat16 if in_dtype == jnp.bfloat16 else f32

    q = _pad_to_chunks(q, chunk_size)
    k = _pad_to_chunks(k, chunk_size)
    v = _pad_to_chunks(v, chunk_size)
    n = q.shape[1] // chunk_size
    c = chunk_size

    # fold the q scale into the mixing matrix: the output is linear in M for
    # both the inter (q @ (M S)) and intra (M[i,i] tril(qk^T)v) terms
    m = prepare_mixing_matrix(mixing_matrix, n) * (dk**-0.5)
    m_strict = jnp.tril(m, k=-1)
    m_diag = jnp.diagonal(m)

    q5 = q.reshape(b, n, c, h, dk).astype(cdt)
    k5 = k.reshape(b, n, c, h, dk).astype(cdt)
    v5 = v.reshape(b, n, c, h, dv).astype(cdt)

    # A: per-chunk states in head-folded layout [B, N, H*Dk, Dv] (Pallas —
    # avoids the relayout transposes the 5D einsum would trigger)
    states4 = _phase_a(k5, v5)
    # B: one clean [N,N] @ [N, H*Dk*Dv] GEMM on a free-reshape flat view;
    # the [N,N] factor stays VMEM-resident and states stream exactly once
    states_flat = states4.reshape(b, n, h * dk * dv)
    mixed = jnp.einsum(
        "ij,bjf->bif", m_strict.astype(cdt), states_flat,
        preferred_element_type=f32,
    ).astype(cdt).reshape(b, n, h, dk, dv)

    o = _phase_c(q5, k5, v5, mixed, m_diag)
    o = o.reshape(b, n * c, h, dv)[:, :t].astype(in_dtype)
    states_out = (
        states4.reshape(b, n, h, dk, dv).transpose(0, 2, 1, 3, 4).astype(f32)
        if output_final_state
        else None
    )
    return o, states_out
