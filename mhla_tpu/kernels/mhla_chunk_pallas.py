"""Pallas TPU kernels for chunked MHLA (fused forward + fused backward).

The chunked MHLA op decomposes into (SURVEY.md section 7, build step 3):

  A. per-chunk states   S_j = k_j^T v_j            — Pallas batched matmul
  B. far state mixing   S~ = tril_far(M) @ S       — triangular-blocked GEMM
  C. supertile output   o = (qk^T * W) v + q @ S~  — Pallas supertile kernel

Supertile decomposition: chunks are grouped G at a time into S = G*C token
"supertiles" (256 tokens at the default C=64). Within a supertile, the
intra-chunk causal term *and* the near-inter chunk terms collapse into one
wide masked attention — the per-token-pair weight between chunks i >= j of
the same supertile is ``M[i, j] * (q k^T)`` because ``q (M S_j) = M (q k_j^T)
v_j`` — while contributions from chunks of *earlier* supertiles ride in as a
per-chunk "virtual value" dot ``q @ mixed_far``. Everything the MXU sees is a
[256, 256] or [256, 128] matmul instead of the 64-row chunk matmuls of the
naive decomposition, which were weight-reload bound (measured 1.2 ms -> 0.58
ms for phase C at 32k/8h/128d).

HBM-traffic design (the op is bandwidth-bound at ~256 FLOP/byte ceiling):

- **Full-row blocks.** Every Pallas block spans all heads of a token row
  ([S, H*D] / [H*Dk, Dv] tiles, index maps only over (batch, supertile)),
  so each DMA moves whole contiguous rows; per-head slicing happens in VMEM.
  Per-head BlockSpecs made 256-byte strided transfers and ran phase A 3x off
  its roofline (1.0 ms vs 0.33 ms measured at 32k).
- ``states`` and ``mixed`` are materialized in the compute dtype (bf16 for
  bf16 inputs) — fp32 accumulation inside the GEMMs, cast in the epilogue.
- The q scale (Dk^-0.5) is folded into the mixing matrix: the output is
  linear in M for both the near term ((scale*M) * qk^T v) and the far term
  (q @ (scale*M) S), so scaling M replaces a full scaled copy of q
  (~128 MB of traffic).
- Phase B runs as a 4x4 triangular-blocked GEMM: the strictly-upper blocks
  of tril(M) are all zero, so 6/16 of the dense N^2 FLOPs are skipped
  (measured 0.40 -> 0.28 ms at N=512) while each GEMM stays MXU-sized.
- Forward roofline accounting at 32k/8h/128d bf16 (v5e ~810 GB/s): the
  mandatory streams are q/k/v/o (268 MB), the states write+read (268 MB,
  phase A out -> phase B in), the mixed write+read (268 MB, phase B out ->
  phase C in), and phase C's second read of k/v (134 MB) — ~940 MB, a
  ~1.15 ms forward floor. Deeper fusion cannot remove these: A+B fusion
  needs strided sub-128-lane reads of k/v columns (measured 3x off
  roofline for 256-byte DMA), B+C fusion re-reads the full states prefix
  per supertile (O(N^2) traffic), and the learned mixing matrix is DENSE
  triangular — no decay/product structure to turn phase B into a scan —
  so the three-kernel split IS the bandwidth-optimal schedule. Measured
  forwards sit AT this floor: 1.07-1.64 ms across relay sessions (the
  ~±0.3 ms spread is the relay's, not the kernel's — see bench.py), so
  any in-tree claim below ~1.1 ms is measurement noise, not headroom.
- The backward is a second Pallas kernel over the same supertile grid,
  recomputing the masked scores in VMEM (flash-style recompute; the
  reference's Triton GLA kernels make the same choice,
  ``fla/ops/gla/chunk.py:1190-1196``) and emitting dq/dk/dv/dmixed plus a
  per-supertile partial for the near mixing-block gradient.

Semantics match ``mhla_tpu.ops.mhla_chunk`` exactly (same oracle tests).
Reference op: ``mhla_nlp/fla/ops/mhla/naive.py:11-83``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Budgets for picking tile sizes (bytes). The Pallas pipeline double-buffers
# every in/out block; scratch ([S, S] fp32 score/weight tiles) is single.
# Keep the worst-case working set well under the ~16 MB of VMEM.
_VMEM_BUDGET = 6 * 1024 * 1024  # phase A (double-buffered blocks only)
_VMEM_BUDGET_ST = 13 * 1024 * 1024  # supertile kernels (blocks + scratch)

# Tests flip this to exercise the real kernel bodies (indexing, masking,
# accumulation) in Pallas interpret mode on CPU, where the production path
# would otherwise take the _core_xla fallback.
FORCE_INTERPRET = False


def _interpret() -> bool:
    return FORCE_INTERPRET and jax.default_backend() != "tpu"


def _pick_group(n: int, per_chunk_bytes: int) -> int:
    """Largest divisor g of n whose double-buffered tiles fit the budget."""
    for g in (16, 8, 4, 2):
        if n % g == 0 and 2 * g * per_chunk_bytes <= _VMEM_BUDGET:
            return g
    return 1


def _hslice(x, hi: int, d: int):
    return x[:, hi * d : (hi + 1) * d]


# ---------------------------------------------------------------------------
# phase A (per-chunk states)
# ---------------------------------------------------------------------------


def _phase_a_kernel(g_chunks, nh, dk, dv, k_ref, v_ref, s_ref):
    for g in range(g_chunks):
        k = k_ref[0, g]  # [C, H*Dk]
        v = v_ref[0, g]  # [C, H*Dv]
        for hi in range(nh):
            s = jax.lax.dot_general(
                _hslice(k, hi, dk), _hslice(v, hi, dv),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s_ref[0, g, hi * dk : (hi + 1) * dk, :] = s.astype(s_ref.dtype)


def _phase_a_pallas(k4: jax.Array, v4: jax.Array, h: int) -> jax.Array:
    """k4: [B, N, C, H*Dk], v4: [B, N, C, H*Dv] -> states [B, N, H*Dk, Dv]."""
    b, n, c, hdk = k4.shape
    dk = hdk // h
    dv = v4.shape[-1] // h
    nbytes = k4.dtype.itemsize
    per_chunk = (c * h * (dk + dv) + h * dk * dv) * nbytes
    g = _pick_group(n, per_chunk)
    return pl.pallas_call(
        functools.partial(_phase_a_kernel, g, h, dk, dv),
        grid=(b, n // g),
        in_specs=[
            pl.BlockSpec((1, g, c, h * dk), lambda bi, ni: (bi, ni, 0, 0)),
            pl.BlockSpec((1, g, c, h * dv), lambda bi, ni: (bi, ni, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, g, h * dk, dv), lambda bi, ni: (bi, ni, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, h * dk, dv), k4.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * n * c * dk * dv,
            bytes_accessed=(k4.size + v4.size + b * n * h * dk * dv) * nbytes,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(k4, v4)


def _phase_a_bwd_kernel(g_chunks, nh, dk, dv, k_ref, v_ref, ds_ref, dk_ref, dv_ref):
    for g in range(g_chunks):
        k = k_ref[0, g]
        v = v_ref[0, g]
        for hi in range(nh):
            ds = ds_ref[0, g, hi * dk : (hi + 1) * dk, :]  # [Dk, Dv]
            dk_h = jax.lax.dot_general(
                _hslice(v, hi, dv), ds, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [C, Dk]
            dv_h = jnp.dot(
                _hslice(k, hi, dk), ds.astype(k.dtype),
                preferred_element_type=jnp.float32,
            )
            dk_ref[0, g, :, hi * dk : (hi + 1) * dk] = dk_h.astype(dk_ref.dtype)
            dv_ref[0, g, :, hi * dv : (hi + 1) * dv] = dv_h.astype(dv_ref.dtype)


def _phase_a_bwd_pallas(k4, v4, ds4, h):
    b, n, c, hdk = k4.shape
    dk = hdk // h
    dv = v4.shape[-1] // h
    nbytes = k4.dtype.itemsize
    per_chunk = (2 * c * h * (dk + dv) + h * dk * dv) * nbytes
    g = _pick_group(n, per_chunk)
    tok = lambda d: pl.BlockSpec(  # noqa: E731
        (1, g, c, h * d), lambda bi, ni: (bi, ni, 0, 0)
    )
    st = pl.BlockSpec((1, g, h * dk, dv), lambda bi, ni: (bi, ni, 0, 0))
    return pl.pallas_call(
        functools.partial(_phase_a_bwd_kernel, g, h, dk, dv),
        grid=(b, n // g),
        in_specs=[tok(dk), tok(dv), st],
        out_specs=(tok(dk), tok(dv)),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, c, h * dk), k4.dtype),
            jax.ShapeDtypeStruct((b, n, c, h * dv), v4.dtype),
        ),
        interpret=_interpret(),
    )(k4, v4, ds4)


def _phase_a_bwd_acc_kernel(
    g_chunks, nh, dk, dv, k_ref, v_ref, ds_ref, dki_ref, dvi_ref, dk_ref, dv_ref
):
    """Phase-A backward with fused residual accumulation: the supertile
    backward's dk/dv contributions ride in as inputs and are added in VMEM,
    replacing two full-stream XLA ``add`` ops (2x(R128+R64+W64) MB at 32k,
    ~0.6 ms) with one extra read here."""
    for g in range(g_chunks):
        k = k_ref[0, g]
        v = v_ref[0, g]
        for hi in range(nh):
            ds = ds_ref[0, g, hi * dk : (hi + 1) * dk, :]  # [Dk, Dv]
            dk_h = jax.lax.dot_general(
                _hslice(v, hi, dv), ds, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [C, Dk]
            dv_h = jnp.dot(
                _hslice(k, hi, dk), ds.astype(k.dtype),
                preferred_element_type=jnp.float32,
            )
            dk_h = dk_h + _hslice(dki_ref[0, g], hi, dk).astype(jnp.float32)
            dv_h = dv_h + _hslice(dvi_ref[0, g], hi, dv).astype(jnp.float32)
            dk_ref[0, g, :, hi * dk : (hi + 1) * dk] = dk_h.astype(dk_ref.dtype)
            dv_ref[0, g, :, hi * dv : (hi + 1) * dv] = dv_h.astype(dv_ref.dtype)


def _phase_a_bwd_acc_pallas(k4, v4, ds4, dki4, dvi4, h):
    b, n, c, hdk = k4.shape
    dk = hdk // h
    dv = v4.shape[-1] // h
    nbytes = k4.dtype.itemsize
    per_chunk = (3 * c * h * (dk + dv) + h * dk * dv) * nbytes
    g = _pick_group(n, per_chunk)
    tok = lambda d: pl.BlockSpec(  # noqa: E731
        (1, g, c, h * d), lambda bi, ni: (bi, ni, 0, 0)
    )
    st = pl.BlockSpec((1, g, h * dk, dv), lambda bi, ni: (bi, ni, 0, 0))
    return pl.pallas_call(
        functools.partial(_phase_a_bwd_acc_kernel, g, h, dk, dv),
        grid=(b, n // g),
        in_specs=[tok(dk), tok(dv), st, tok(dk), tok(dv)],
        out_specs=(tok(dk), tok(dv)),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, c, h * dk), k4.dtype),
            jax.ShapeDtypeStruct((b, n, c, h * dv), v4.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * c * dk * dv,
            bytes_accessed=(3 * (k4.size + v4.size) + ds4.size) * nbytes,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(k4, v4, ds4, dki4, dvi4)


def _phase_a_xla(k4, v4, h):
    b, n, c, hdk = k4.shape
    dk = hdk // h
    dv = v4.shape[-1] // h
    k5 = k4.reshape(b, n, c, h, dk)
    v5 = v4.reshape(b, n, c, h, dv)
    states = jnp.einsum(
        "bnchk,bnchv->bnhkv", k5, v5, preferred_element_type=jnp.float32
    ).astype(k4.dtype)
    return states.reshape(b, n, h * dk, dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _phase_a(k4, v4, h):
    """[B,N,C,H*Dk] x [B,N,C,H*Dv] -> per-chunk states [B,N,H*Dk,Dv]."""
    if _use_pallas(k4.shape[2], k4.shape[3] // h, v4.shape[3] // h):
        return _phase_a_pallas(k4, v4, h)
    return _phase_a_xla(k4, v4, h)


def _phase_a_fwd(k4, v4, h):
    return _phase_a(k4, v4, h), (k4, v4)


def _phase_a_bwd(h, res, ds4):
    k4, v4 = res
    if _use_pallas(k4.shape[2], k4.shape[3] // h, v4.shape[3] // h):
        return _phase_a_bwd_pallas(k4, v4, ds4.astype(k4.dtype), h)
    _, vjp = jax.vjp(functools.partial(_phase_a_xla, h=h), k4, v4)
    return vjp(ds4)


_phase_a.defvjp(_phase_a_fwd, _phase_a_bwd)


# ---------------------------------------------------------------------------
# phase B (triangular-blocked far state mixing)
# ---------------------------------------------------------------------------


def _mix_bands(n: int, lower: bool):
    """Halving row bands of a triangular [N, N] matrix. For lower: band
    rows [lo, hi) only need columns [0, hi); for upper: columns [lo, n)."""
    out, hi = [], n
    while hi > 64:
        lo = hi // 2
        out.append((lo, hi))
        hi = lo
    out.append((0, hi))
    if not lower:
        out = [(n - hi, n - lo) for lo, hi in out]
    return out


def _mix_kernel(bands, lower, m_ref, s_ref, o_ref):
    # m_ref is [N, N] (shared matrix) or [1, N, N] (per-batch-row matrix,
    # the packed-varlen path — same VMEM footprint, batch-indexed BlockSpec)
    m2 = m_ref if m_ref.ndim == 2 else m_ref[0]
    nn = m2.shape[0]
    for lo, hi in bands:
        if lower:
            mm = m2[lo:hi, :hi]
            ss = s_ref[0, :hi]  # [hi, Rtile, Dv]
        else:
            mm = m2[lo:hi, lo:]
            ss = s_ref[0, lo:nn]
        o = jax.lax.dot_general(
            mm, ss, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # rank-3 rhs: the [Rtile, Dv] minor dims ride along untouched
        o_ref[0, lo:hi] = o.astype(o_ref.dtype)


def _mix_rtile(n: int, hdk: int, dv: int, nbytes: int, m_bytes: int):
    """Row-tile of the H*Dk axis for the banded mix kernels, or None when
    no Mosaic-legal tile fits the VMEM budget. The second-minor BlockSpec
    dim must be a multiple of 8 (or the full array dim), so candidates are
    restricted to 16/8 — smaller tiles would violate the tiling rule this
    repo documents (CLAUDE.md) and fail at Mosaic compile time."""
    for cand in (16, 8):
        if hdk % cand == 0 and 4 * n * cand * dv * nbytes + m_bytes <= _VMEM_BUDGET_ST:
            return cand
    return None


def _mix_pallas(m_tri, states4, lower: bool, bands=None):
    b, n, hdk, dv = states4.shape
    batched = m_tri.ndim == 3
    nbytes = states4.dtype.itemsize
    rtile = _mix_rtile(n, hdk, dv, nbytes, n * n * nbytes)
    if rtile is None:
        return _mix_xla(m_tri, states4)
    if bands is None:
        bands = _mix_bands(n, lower)
    flops = (
        2 * sum((hi - lo) * (hi if lower else n - lo) for lo, hi in bands)
        * hdk * dv * b
    )
    m_spec = (
        pl.BlockSpec((1, n, n), lambda bi, fi: (bi, 0, 0))
        if batched
        else pl.BlockSpec((n, n), lambda bi, fi: (0, 0))
    )
    return pl.pallas_call(
        functools.partial(_mix_kernel, bands, lower),
        grid=(b, hdk // rtile),
        in_specs=[
            m_spec,
            pl.BlockSpec((1, n, rtile, dv), lambda bi, fi: (bi, 0, fi, 0)),
        ],
        out_specs=pl.BlockSpec((1, n, rtile, dv), lambda bi, fi: (bi, 0, fi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, hdk, dv), states4.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * states4.size * nbytes + m_tri.size * nbytes,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(m_tri, states4)


def _mix_xla(m_far, states4):
    eq = "bij,bjrd->bird" if m_far.ndim == 3 else "ij,bjrd->bird"
    out = jnp.einsum(eq, m_far, states4, preferred_element_type=jnp.float32)
    return out.astype(states4.dtype)


def _mix_use_pallas(n: int, dv: int) -> bool:
    on_tpu = jax.default_backend() == "tpu"
    return (on_tpu or _interpret()) and n % 64 == 0 and n >= 128 and dv % 128 == 0


@jax.custom_vjp
def mix_states(m_far: jax.Array, states4: jax.Array):
    """``mixed[i] = sum_j m_far[i, j] states[j]`` with the triangular
    structure exploited in VMEM.

    m_far [N, N] (compute dtype; zero at and above the supertile block
    diagonal), states4 [B, N, H*Dk, Dv]. The Pallas kernel keeps the [N, N]
    factor VMEM-resident, streams ``states`` exactly once in row-tiles of
    the H*Dk axis (a rank-3 dot_general keeps the [Rtile, Dv] minor dims —
    and therefore the consumer's tiling — untouched, so no relayout ever
    reaches HBM), and splits each tile's GEMM into halving row bands so the
    zero upper triangle is never multiplied. 0.85 -> 0.38 ms at N=512,
    F=128k vs the dense einsum; jnp-level band splits are 2-6x SLOWER than
    dense because they re-stream states or materialize fp32 partials in HBM.
    """
    if _mix_use_pallas(m_far.shape[-1], states4.shape[-1]):
        return _mix_pallas(m_far, states4, lower=True)
    return _mix_xla(m_far, states4)


def _mix_states_fwd(m_far, states4):
    return mix_states(m_far, states4), (m_far, states4)


def _dm_kernel(bands, do_ref, s_ref, dm_ref):
    """Accumulate dm[i, j] = <dout[i], states[j]> over the feature grid
    axis, banded to the populated lower-triangular region. dm_ref is
    [N, N] (shared matrix, accumulated over the batch grid axis too) or
    [1, N, N] (per-batch-row matrix, packed-varlen path)."""
    batched = dm_ref.ndim == 3
    first = pl.program_id(1) == 0
    if not batched:
        first = first & (pl.program_id(0) == 0)

    @pl.when(first)
    def _init():
        dm_ref[...] = jnp.zeros_like(dm_ref)

    n, rt, dv = do_ref.shape[1], do_ref.shape[2], do_ref.shape[3]
    do2 = do_ref[0].reshape(n, rt * dv)  # minor-dim merge: free in VMEM
    s2 = s_ref[0].reshape(n, rt * dv)
    for lo, hi in bands:
        part = jax.lax.dot_general(
            do2[lo:hi], s2[:hi], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if batched:
            dm_ref[0, lo:hi, :hi] += part
        else:
            dm_ref[lo:hi, :hi] += part


def _dm_pallas(dout, states4, bands, batched: bool = False):
    b, n, hdk, dv = states4.shape
    nbytes = states4.dtype.itemsize
    rtile = _mix_rtile(n, hdk, dv, nbytes, 4 * n * n)
    if rtile is None:
        eq = "bird,bjrd->bij" if batched else "bird,bjrd->ij"
        return jnp.einsum(eq, dout, states4, preferred_element_type=jnp.float32)
    dm_spec = (
        pl.BlockSpec((1, n, n), lambda bi, fi: (bi, 0, 0))
        if batched
        else pl.BlockSpec((n, n), lambda bi, fi: (0, 0))
    )
    dm_shape = (b, n, n) if batched else (n, n)
    return pl.pallas_call(
        functools.partial(_dm_kernel, bands),
        grid=(b, hdk // rtile),
        in_specs=[
            pl.BlockSpec((1, n, rtile, dv), lambda bi, fi: (bi, 0, fi, 0)),
            pl.BlockSpec((1, n, rtile, dv), lambda bi, fi: (bi, 0, fi, 0)),
        ],
        out_specs=dm_spec,
        out_shape=jax.ShapeDtypeStruct(dm_shape, jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * sum((hi - lo) * hi for lo, hi in bands) * hdk * dv * b,
            bytes_accessed=2 * states4.size * nbytes,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(dout, states4)


# single-buffered blocks (constant index maps: the [N,N] factor and the
# [N,N] fp32 dm accumulator) ride on top of the double-buffered streams,
# so this kernel gets a larger budget than the generic supertile one
_VMEM_BUDGET_MIXBWD = 14 * 1024 * 1024


def _mix_bwd_fused_kernel(
    bands_up, bands_lo, mt_ref, do_ref, s_ref, ds_ref, dm_ref
):
    """One pass over dmixed: dstates = m_far^T @ dmixed (upper-banded GEMM)
    and dm[i, j] += <dmixed_i, states_j> (lower-banded accumulation). The
    two separate kernels each streamed dmixed from HBM (~128 MB at 32k)."""
    _mix_kernel(bands_up, False, mt_ref, do_ref, ds_ref)
    _dm_kernel(bands_lo, do_ref, s_ref, dm_ref)


def _mix_bwd_fused_pallas(m_t, dout, states4):
    """m_t: [N, N] upper-triangular (m_far^T, compute dtype) or [B, N, N]
    (per-batch-row, packed-varlen path), dout/states4: [B, N, H*Dk, Dv] ->
    (dstates [same], dm [N, N] or [B, N, N] f32), or None when no
    Mosaic-legal row tile fits the budget (callers fall back)."""
    b, n, hdk, dv = states4.shape
    batched = m_t.ndim == 3
    nbytes = states4.dtype.itemsize
    rtile = None
    for cand in (16, 8):
        fixed = n * n * nbytes + 4 * n * n  # m_t + fp32 dm, single-buffered
        if hdk % cand == 0 and 6 * n * cand * dv * nbytes + fixed <= _VMEM_BUDGET_MIXBWD:
            rtile = cand
            break
    if rtile is None:
        return None
    # fixed 128-row bands instead of halving: the largest band's fp32 GEMM
    # transient ([band, rtile*Dv]) is what tips this kernel over the 16 MB
    # scoped-vmem limit (measured 16.02M with a 256-row band), and the
    # finer split also trims wasted triangle FLOPs (same measured speed).
    # Clamp the last band so the bands tile [0, n) exactly for ANY n —
    # a fixed stride from n-step leaves rows uncovered when n % step != 0
    # (n=192: silently-missing dstates rows / dm bands).
    step = min(128, n)
    bands_lo, hi = [], n
    while hi > 0:
        lo = max(0, hi - step)
        bands_lo.append((lo, hi))
        hi = lo
    bands_up = [(n - hi, n - lo) for lo, hi in bands_lo]
    row = pl.BlockSpec((1, n, rtile, dv), lambda bi, fi: (bi, 0, fi, 0))
    m_spec = (
        pl.BlockSpec((1, n, n), lambda bi, fi: (bi, 0, 0))
        if batched
        else pl.BlockSpec((n, n), lambda bi, fi: (0, 0))
    )
    dm_spec = (
        pl.BlockSpec((1, n, n), lambda bi, fi: (bi, 0, 0))
        if batched
        else pl.BlockSpec((n, n), lambda bi, fi: (0, 0))
    )
    dm_shape = (b, n, n) if batched else (n, n)
    flops = (
        2 * sum((hi - lo) * (n - lo) for lo, hi in bands_up)
        + 2 * sum((hi - lo) * hi for lo, hi in bands_lo)
    ) * hdk * dv * b
    return pl.pallas_call(
        functools.partial(_mix_bwd_fused_kernel, bands_up, bands_lo),
        grid=(b, hdk // rtile),
        in_specs=[
            m_spec,
            row,
            row,
        ],
        out_specs=(row, dm_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, hdk, dv), states4.dtype),
            jax.ShapeDtypeStruct(dm_shape, jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=3 * states4.size * nbytes + 2 * n * n * nbytes,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(m_t, dout, states4)


def _mix_states_bwd(res, dout):
    m_far, states4 = res
    batched = m_far.ndim == 3
    n = m_far.shape[-1]
    m_t = jnp.swapaxes(m_far, -1, -2)
    dout = dout.astype(states4.dtype)
    if _mix_use_pallas(n, states4.shape[-1]):
        # single pass over dout: dS = m_far^T @ dout (upper-banded; the
        # transpose is upper-triangular) and dm = <dout_i, states_j>
        # (lower-banded; the outer m_far mask discards the rest anyway)
        fused = _mix_bwd_fused_pallas(m_t, dout, states4)
        if fused is not None:
            dstates, dm = fused
            return dm.astype(m_far.dtype), dstates
        dstates = _mix_pallas(m_t, dout, lower=False)
        dm = _dm_pallas(dout, states4, _mix_bands(n, True), batched=batched)
        dm = dm.astype(m_far.dtype)
    else:
        dstates = jnp.einsum(
            "bji,bjrd->bird" if batched else "ji,bjrd->bird",
            m_far, dout, preferred_element_type=jnp.float32,
        ).astype(states4.dtype)
        dm = jnp.einsum(
            "bird,bjrd->bij" if batched else "bird,bjrd->ij",
            dout, states4, preferred_element_type=jnp.float32,
        ).astype(m_far.dtype)
    return dm, dstates


mix_states.defvjp(_mix_states_fwd, _mix_states_bwd)


# ---------------------------------------------------------------------------
# phase C — supertile kernel (forward)
# ---------------------------------------------------------------------------


def _st_masks(s: int, g: int, c: int):
    """(keep, rep) for an [S, S] supertile: ``keep`` is the causal-block
    mask (full for chunk row > chunk col, causal on the chunk diagonal) and
    ``rep`` [S, G] fp32 maps chunk index -> token rows."""
    ridx = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    rch, cch = ridx // c, cidx // c
    keep = (rch > cch) | ((rch == cch) & (ridx >= cidx))
    rep = (
        jax.lax.broadcasted_iota(jnp.int32, (s, g), 0) // c
        == jax.lax.broadcasted_iota(jnp.int32, (s, g), 1)
    ).astype(jnp.float32)
    return keep, rep


def _st_fwd_kernel(g, c, nh, dk, dv, q_ref, k_ref, v_ref, mt_ref, mb_ref, o_ref):
    """One (batch, supertile) cell: S = G*C token rows x all heads.

      W  = where(keep, rep @ mb @ rep^T, 0)          (near mixing weights)
      o  = (q k^T * W) v + sum_g rowmask_g * (q @ mixed_far_g)
    """
    s = g * c
    f32 = jnp.float32
    keep, rep = _st_masks(s, g, c)
    # [G, G] fp32 scaled chunk-mixing block incl. diagonal; rank 3 = shared
    # across the batch, rank 4 = per-batch-row (packed-varlen path)
    mbb = mb_ref[0] if mb_ref.ndim == 3 else mb_ref[0, 0]
    w = jnp.dot(jnp.dot(rep, mbb), rep.T, preferred_element_type=f32)
    w = jnp.where(keep, w, 0.0)
    rowmask = [
        (jax.lax.broadcasted_iota(jnp.int32, (s, dv), 0) // c) == gg
        for gg in range(g)
    ]
    for hi in range(nh):
        qh = _hslice(q_ref[0, 0], hi, dk)  # [S, Dk]
        kh = _hslice(k_ref[0, 0], hi, dk)
        vh = _hslice(v_ref[0, 0], hi, dv)
        a = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=f32
        )
        aw = (a * w).astype(vh.dtype)
        o = jnp.dot(aw, vh, preferred_element_type=f32)
        for gg in range(g):
            mth = mt_ref[0, gg, hi * dk : (hi + 1) * dk, :]  # [Dk, Dv]
            far = jnp.dot(qh, mth, preferred_element_type=f32)
            o = o + jnp.where(rowmask[gg], far, 0.0)
        o_ref[0, 0, :, hi * dv : (hi + 1) * dv] = o.astype(o_ref.dtype)


def _st_bwd_kernel(
    g, c, nh, dk, dv,
    q_ref, k_ref, v_ref, mt_ref, mb_ref, do_ref,
    dq_ref, dk_ref, dv_ref, dmt_ref, dmb_ref,
):
    """Supertile backward (flash-style recompute of the masked scores):

      A    = q k^T ;  W = where(keep, rep mb rep^T, 0)
      dV   = (A * W)^T dO
      G'   = dO v^T
      dA   = G' * W
      dq   = dA k + sum_g rowmask_g(dO) @ mixed_far_g^T
      dk   = dA^T q
      dmixed_far_g = (rowmask_g(q))^T dO
      dmb  = rep^T (G' * A * keep) rep       (stored as rep8^T (...) [8, S])
    """
    s = g * c
    f32 = jnp.float32
    keep, rep = _st_masks(s, g, c)
    mbb = mb_ref[0] if mb_ref.ndim == 3 else mb_ref[0, 0]
    w = jnp.dot(jnp.dot(rep, mbb), rep.T, preferred_element_type=f32)
    w = jnp.where(keep, w, 0.0)
    keep_f = keep.astype(f32)
    # rep padded to a sublane multiple so the dmb partial tiles as [P, S]
    p = max(8, ((g + 7) // 8) * 8)
    rep8 = (
        jax.lax.broadcasted_iota(jnp.int32, (s, p), 0) // c
        == jax.lax.broadcasted_iota(jnp.int32, (s, p), 1)
    ).astype(f32)
    rowmask_v = [
        (jax.lax.broadcasted_iota(jnp.int32, (s, dv), 0) // c) == gg
        for gg in range(g)
    ]
    rowmask_k = [
        (jax.lax.broadcasted_iota(jnp.int32, (s, dk), 0) // c) == gg
        for gg in range(g)
    ]
    dmb_acc = jnp.zeros((p, s), f32)
    for hi in range(nh):
        qh = _hslice(q_ref[0, 0], hi, dk)
        kh = _hslice(k_ref[0, 0], hi, dk)
        vh = _hslice(v_ref[0, 0], hi, dv)
        doh = _hslice(do_ref[0, 0], hi, dv)

        a = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=f32
        )
        aw = (a * w).astype(vh.dtype)
        # dV = (A*W)^T dO
        dv_h = jax.lax.dot_general(
            aw, doh, (((0,), (0,)), ((), ())), preferred_element_type=f32
        )
        dv_ref[0, 0, :, hi * dv : (hi + 1) * dv] = dv_h.astype(dv_ref.dtype)

        gp = jax.lax.dot_general(
            doh, vh, (((1,), (1,)), ((), ())), preferred_element_type=f32
        )  # dO v^T [S, S]
        da = (gp * w).astype(qh.dtype)

        dq_h = jnp.dot(da, kh, preferred_element_type=f32)
        for gg in range(g):
            mth = mt_ref[0, gg, hi * dk : (hi + 1) * dk, :]  # [Dk, Dv]
            dog = jnp.where(rowmask_v[gg], doh, 0).astype(doh.dtype)
            dq_h = dq_h + jax.lax.dot_general(
                dog, mth, (((1,), (1,)), ((), ())), preferred_element_type=f32
            )
            qg = jnp.where(rowmask_k[gg], qh, 0).astype(qh.dtype)
            dmt_h = jax.lax.dot_general(
                qg, doh, (((0,), (0,)), ((), ())), preferred_element_type=f32
            )  # [Dk, Dv]
            dmt_ref[0, gg, hi * dk : (hi + 1) * dk, :] = dmt_h.astype(
                dmt_ref.dtype
            )
        dq_ref[0, 0, :, hi * dk : (hi + 1) * dk] = dq_h.astype(dq_ref.dtype)

        dk_h = jax.lax.dot_general(
            da, qh, (((0,), (0,)), ((), ())), preferred_element_type=f32
        )
        dk_ref[0, 0, :, hi * dk : (hi + 1) * dk] = dk_h.astype(dk_ref.dtype)

        dmb_acc = dmb_acc + jax.lax.dot_general(
            rep8, gp * a * keep_f, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
    dmb_ref[0, 0] = dmb_acc


def _st_vmem_bytes(s, g, h, dk, dv, nbytes, bwd: bool) -> int:
    hd = h * max(dk, dv)
    blocks = (4 if not bwd else 7) * s * hd * nbytes  # q,k,v,(do),o/dq,dk,dv
    blocks += (1 if not bwd else 2) * g * h * dk * dv * nbytes  # mt (+dmt)
    scratch = (4 if bwd else 3) * s * s * 4  # fp32 score/weight tiles
    return 2 * blocks + scratch


def _pick_supertile(n, c, h, dk, dv, nbytes) -> int:
    """Largest G with S = G*C <= 256 whose working set fits VMEM."""
    g = max(1, 256 // c)
    while g > 1 and _st_vmem_bytes(g * c, g, h, dk, dv, nbytes, bwd=True) > _VMEM_BUDGET_ST:
        g //= 2
    return g


def _mb_spec(g: int, batched: bool):
    if batched:
        return pl.BlockSpec((1, 1, g, g), lambda bi, ni: (bi, ni, 0, 0))
    return pl.BlockSpec((1, g, g), lambda bi, ni: (ni, 0, 0))


def _phase_c_st_pallas(q4, k4, v4, mixed4, mb, g: int, c: int, h: int):
    b, ns, s, hdk = q4.shape
    hdv = v4.shape[-1]
    dk = hdk // h
    dv = hdv // h
    flops = 2 * b * h * ns * (s * s * (dk + dv) + g * s * dk * dv)
    nbytes = q4.dtype.itemsize
    out = pl.pallas_call(
        functools.partial(_st_fwd_kernel, g, c, h, dk, dv),
        grid=(b, ns),
        in_specs=[
            pl.BlockSpec((1, 1, s, hdk), lambda bi, ni: (bi, ni, 0, 0)),
            pl.BlockSpec((1, 1, s, hdk), lambda bi, ni: (bi, ni, 0, 0)),
            pl.BlockSpec((1, 1, s, hdv), lambda bi, ni: (bi, ni, 0, 0)),
            pl.BlockSpec((1, g, hdk, dv), lambda bi, ni: (bi, ni, 0, 0)),
            _mb_spec(g, mb.ndim == 4),
        ],
        out_specs=pl.BlockSpec((1, 1, s, hdv), lambda bi, ni: (bi, ni, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, ns, s, hdv), q4.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(q4.size * 2 + v4.size * 2 + mixed4.size) * nbytes,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(q4, k4, v4, mixed4, mb)
    return out


def _phase_c_st_bwd_pallas(q4, k4, v4, mixed4, mb, do4, g: int, c: int, h: int):
    b, ns, s, hdk = q4.shape
    hdv = v4.shape[-1]
    dk = hdk // h
    dv = hdv // h
    p = max(8, ((g + 7) // 8) * 8)
    nbytes = q4.dtype.itemsize
    flops = 2 * b * h * ns * (3 * s * s * (dk + dv) // 2 + 2 * g * s * dk * dv)
    outs = pl.pallas_call(
        functools.partial(_st_bwd_kernel, g, c, h, dk, dv),
        grid=(b, ns),
        in_specs=[
            pl.BlockSpec((1, 1, s, hdk), lambda bi, ni: (bi, ni, 0, 0)),
            pl.BlockSpec((1, 1, s, hdk), lambda bi, ni: (bi, ni, 0, 0)),
            pl.BlockSpec((1, 1, s, hdv), lambda bi, ni: (bi, ni, 0, 0)),
            pl.BlockSpec((1, g, hdk, dv), lambda bi, ni: (bi, ni, 0, 0)),
            _mb_spec(g, mb.ndim == 4),
            pl.BlockSpec((1, 1, s, hdv), lambda bi, ni: (bi, ni, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, s, hdk), lambda bi, ni: (bi, ni, 0, 0)),
            pl.BlockSpec((1, 1, s, hdk), lambda bi, ni: (bi, ni, 0, 0)),
            pl.BlockSpec((1, 1, s, hdv), lambda bi, ni: (bi, ni, 0, 0)),
            pl.BlockSpec((1, g, hdk, dv), lambda bi, ni: (bi, ni, 0, 0)),
            pl.BlockSpec((1, 1, p, s), lambda bi, ni: (bi, ni, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, ns, s, hdk), q4.dtype),
            jax.ShapeDtypeStruct((b, ns, s, hdk), k4.dtype),
            jax.ShapeDtypeStruct((b, ns, s, hdv), v4.dtype),
            jax.ShapeDtypeStruct((b, ns * g, hdk, dv), mixed4.dtype),
            jax.ShapeDtypeStruct((b, ns, p, s), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * (q4.size * 2 + v4.size * 2 + mixed4.size) * nbytes,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(q4, k4, v4, mixed4, mb, do4)
    dq4, dk4, dv4, dmixed4, dmb_rows = outs
    # fold the per-(batch, supertile) [P, S] row partial back to [NS, G, G]
    # (shared mb: sum over batch) or [B, NS, G, G] (per-batch-row mb)
    rep = (
        jnp.arange(s)[:, None] // c == jnp.arange(g)[None, :]
    ).astype(jnp.float32)
    eq = "bnps,sg->bnpg" if mb.ndim == 4 else "bnps,sg->npg"
    dmb = jnp.einsum(eq, dmb_rows[:, :, :g, :], rep)
    return dq4, dk4, dv4, dmixed4, dmb


# ---------------------------------------------------------------------------
# XLA fallback (CPU path; per-chunk decomposition — the supertile split is
# a Pallas-only optimization, and its 7D einsum form hits a pathological
# remote-compile path on TPU, minutes vs seconds)
# ---------------------------------------------------------------------------


def _core_xla(q5, k5, v5, mixed, m_diag):
    """jnp phase C over [B, N, C, H, D] chunks:
    o_j = q_j @ mixed_j + M[j,j] * (tril(q_j k_j^T) @ v_j).
    m_diag: [N] (shared mixing matrix) or [B, N] (per-batch-row)."""
    f32 = jnp.float32
    cdt = q5.dtype
    o_inter = jnp.einsum(
        "bnchk,bnhkv->bnchv", q5, mixed.astype(cdt), preferred_element_type=f32
    )
    attn = jnp.einsum("bnchk,bnmhk->bnhcm", q5, k5, preferred_element_type=f32)
    c = q5.shape[2]
    attn = (attn * jnp.tril(jnp.ones((c, c), f32))).astype(cdt)
    diag = m_diag[None, :] if m_diag.ndim == 1 else m_diag
    o_intra = jnp.einsum(
        "bnhcm,bnmhv->bnchv", attn, v5, preferred_element_type=f32
    ) * diag[:, :, None, None, None]
    return (o_inter + o_intra).astype(q5.dtype)


def _pallas_compatible(c: int, dk: int, dv: int) -> bool:
    """Mosaic block rule: last two block dims must be (multiple of 8,
    multiple of 128) — token rows x head dim tiles."""
    return c % 8 == 0 and dk % 128 == 0 and dv % 128 == 0


def _use_pallas(c: int, dk: int, dv: int) -> bool:
    on_tpu = jax.default_backend() == "tpu"
    return (on_tpu or _interpret()) and _pallas_compatible(c, dk, dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _phase_c_st(q4, k4, v4, mixed4, mb, g, c, h):
    """Supertile phase C (Pallas fwd + bwd; callers guard with
    ``_use_pallas``). q4/k4/v4: [B, NS, S, H*D] views, mixed4:
    [B, N, H*Dk, Dv], mb: [NS, G, G] (scaled near-mixing blocks)."""
    return _phase_c_st_pallas(q4, k4, v4, mixed4, mb, g, c, h)


def _phase_c_st_fwd(q4, k4, v4, mixed4, mb, g, c, h):
    return _phase_c_st(q4, k4, v4, mixed4, mb, g, c, h), (q4, k4, v4, mixed4, mb)


def _phase_c_st_bwd(g, c, h, res, do4):
    q4, k4, v4, mixed4, mb = res
    do4 = do4.astype(q4.dtype)
    return _phase_c_st_bwd_pallas(q4, k4, v4, mixed4, mb, do4, g, c, h)


_phase_c_st.defvjp(_phase_c_st_fwd, _phase_c_st_bwd)


# ---------------------------------------------------------------------------
# fused supertile path (hand-scheduled backward)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _st_path(q4c, k4c, v4c, m_far, mb, g, c, h):
    """Phases A -> B -> C as one differentiable unit (token-chunk layout
    [B, N, C, H*D] in/out; m_far [N, N] compute-dtype strict-block-lower,
    mb [NS, G, G] fp32 near blocks). Hand-scheduling the VJP lets the
    backward fuse what autodiff composition cannot:

    - the supertile backward's dk/dv contributions accumulate INSIDE the
      phase-A backward kernel (``_phase_a_bwd_acc_pallas``) instead of two
      full-stream XLA adds, and
    - dmixed is streamed once through ``_mix_bwd_fused_pallas`` (dstates +
      dm together) instead of twice.

    Saves ~4x full [B,T,H*Dk]-stream HBM round trips per backward vs the
    composed VJPs (see benchmarks via ``benchmarks/train_bench.py``).
    """
    o4, _ = _st_path_fwd(q4c, k4c, v4c, m_far, mb, g, c, h)
    return o4


def _st_path_fwd(q4c, k4c, v4c, m_far, mb, g, c, h):
    b, n, cc, hdk = q4c.shape
    s = g * cc
    ns = n // g
    states4 = _phase_a(k4c, v4c, h)
    mixed4 = mix_states(m_far, states4)
    o4 = _phase_c_st_pallas(
        q4c.reshape(b, ns, s, hdk),
        k4c.reshape(b, ns, s, hdk),
        v4c.reshape(b, ns, s, -1),
        mixed4, mb, g, cc, h,
    )
    res = (q4c, k4c, v4c, m_far, mb, states4, mixed4)
    return o4.reshape(b, n, cc, -1), res


def _st_path_bwd(g, c, h, res, do4):
    q4c, k4c, v4c, m_far, mb, states4, mixed4 = res
    b, n, cc, hdk = q4c.shape
    hdv = v4c.shape[-1]
    s = g * cc
    ns = n // g
    sup = lambda x, d: x.reshape(b, ns, s, d)  # noqa: E731
    dq4, dk_st, dv_st, dmt4, dmb = _phase_c_st_bwd_pallas(
        sup(q4c, hdk), sup(k4c, hdk), sup(v4c, hdv), mixed4, mb,
        sup(do4.astype(q4c.dtype), hdv), g, cc, h,
    )
    dmt4 = dmt4.astype(states4.dtype)
    m_t = jnp.swapaxes(m_far, -1, -2)  # batched-safe transpose ([B, N, N])
    fused = _mix_bwd_fused_pallas(m_t, dmt4, states4)
    if fused is not None:
        dstates, dm = fused
    else:
        dstates = _mix_pallas(m_t, dmt4, lower=False)
        dm = _dm_pallas(
            dmt4, states4, _mix_bands(n, True), batched=m_far.ndim == 3
        )
    # the dm accumulation is banded, not exact-masked: entries at/above the
    # supertile block diagonal are real inner products but not part of
    # m_far's domain (those rows live in mb) — mask them out here
    sidx = jnp.arange(n) // g
    dm = jnp.where(sidx[:, None] > sidx[None, :], dm, 0.0)
    dk4c, dv4c = _phase_a_bwd_acc_pallas(
        k4c, v4c, dstates.astype(k4c.dtype),
        dk_st.reshape(b, n, cc, hdk), dv_st.reshape(b, n, cc, hdv), h,
    )
    return (
        dq4.reshape(b, n, cc, hdk),
        dk4c,
        dv4c,
        dm.astype(m_far.dtype),
        dmb,
    )


_st_path.defvjp(_st_path_fwd, _st_path_bwd)


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("num_heads", "chunk_size", "output_final_state")
)
def mhla_chunk_fused_flat(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mixing_matrix: jax.Array,
    num_heads: int,
    chunk_size: int = 64,
    output_final_state: bool = False,
    segment_ids: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Chunked MHLA on head-flat [B, T, H*D] tensors (fused Pallas fwd+bwd).

    This is the zero-relayout entry point: QKV projections produce [B, T,
    H*D] naturally, and every kernel here consumes/produces that layout, so
    a model layer that calls this never pays the [B,T,H,D] <-> [B,T,H*D]
    TPU tile-relayout (~0.6 ms at 32k/8h/128d, measured) that the 4D API
    costs. Semantics match :func:`mhla_tpu.ops.mhla_chunk` exactly.

    ``segment_ids`` [B, T] enables packed varlen training with exact
    document isolation (chunk-aligned boundaries; see
    ``ops.mhla_chunk.build_segment_mixing``). The op is linear in the
    mixing entries, so the same Pallas kernels run with a per-batch-row
    [B, N, N] matrix — only the M BlockSpecs gain a batch index.
    """
    from ..ops.mhla_chunk import (
        _pad_to_chunks,
        build_segment_mixing,
        prepare_mixing_matrix,
    )

    in_dtype = q.dtype
    b, t, hdk = q.shape
    h = num_heads
    dk = hdk // h
    dv = v.shape[-1] // h
    f32 = jnp.float32
    cdt = jnp.bfloat16 if in_dtype == jnp.bfloat16 else f32

    q = _pad_to_chunks(q, chunk_size)
    k = _pad_to_chunks(k, chunk_size)
    v = _pad_to_chunks(v, chunk_size)
    n_real = q.shape[1] // chunk_size
    c = chunk_size

    # fold the q scale into the mixing matrix: the output is linear in M for
    # both the near ((scale*M) qk^T v) and far (q @ (scale*M) S) terms
    if segment_ids is None:
        m = prepare_mixing_matrix(mixing_matrix, n_real) * (dk**-0.5)
    else:
        m = build_segment_mixing(
            mixing_matrix, segment_ids, n_real, chunk_size
        ) * (dk**-0.5)
    m = jnp.tril(m)  # batched tril acts on the last two dims

    gsz = _pick_supertile(n_real, c, h, dk, dv, 2 if cdt == jnp.bfloat16 else 4)
    use_st = _use_pallas(c, dk, dv) and gsz * c >= 128

    q4c = q.reshape(b, n_real, c, h * dk).astype(cdt)
    k4c = k.reshape(b, n_real, c, h * dk).astype(cdt)
    v4c = v.reshape(b, n_real, c, h * dv).astype(cdt)

    if not use_st:
        # per-chunk jnp path (CPU / Mosaic-incompatible head dims): simple
        # 5D einsums; mixed here includes the near chunk terms
        states4 = _phase_a(k4c, v4c, h)
        m_strict = jnp.tril(m, k=-1)
        mixed4 = mix_states(m_strict.astype(cdt), states4)
        q5 = q4c.reshape(b, n_real, c, h, dk)
        k5 = k4c.reshape(b, n_real, c, h, dk)
        v5 = v4c.reshape(b, n_real, c, h, dv)
        m_diag = (
            jnp.diagonal(m)
            if m.ndim == 2
            else jnp.diagonal(m, axis1=1, axis2=2)
        )
        o = _core_xla(
            q5, k5, v5, mixed4.reshape(b, n_real, h, dk, dv), m_diag
        )
        o = o.reshape(b, n_real * c, h * dv)[:, :t].astype(in_dtype)
        states_out = (
            states4.reshape(b, n_real, h, dk, dv)
            .transpose(0, 2, 1, 3, 4)
            .astype(f32)
            if output_final_state
            else None
        )
        return o, states_out

    # supertile grouping: pad the chunk axis (and M with zero rows/cols) to a
    # multiple of G. Pad chunks sit at the end with all-zero mixing weights,
    # so they never touch real outputs; jnp.pad's vjp slices the gradients.
    n = ((n_real + gsz - 1) // gsz) * gsz
    pad_n = n - n_real
    if pad_n:
        pw = ((0, 0), (0, pad_n), (0, 0), (0, 0))
        q4c, k4c, v4c = jnp.pad(q4c, pw), jnp.pad(k4c, pw), jnp.pad(v4c, pw)
        mpad = ((0, pad_n), (0, pad_n))
        m = jnp.pad(m, mpad if m.ndim == 2 else (((0, 0),) + mpad))
    ns = n // gsz

    # near-mixing blocks: the G x G diagonal blocks of M (incl. the chunk
    # diagonal); far mixing: everything strictly below the block diagonal
    sidx = jnp.arange(n) // gsz
    m_far = jnp.where(sidx[:, None] > sidx[None, :], m, 0.0)
    if m.ndim == 2:
        mb = jnp.diagonal(
            m.reshape(ns, gsz, ns, gsz), axis1=0, axis2=2
        ).transpose(2, 0, 1)  # [NS, G, G]
    else:
        mb = jnp.diagonal(
            m.reshape(b, ns, gsz, ns, gsz), axis1=1, axis2=3
        ).transpose(0, 3, 1, 2)  # [B, NS, G, G]

    # A -> B -> C as one differentiable unit (hand-scheduled backward:
    # residual adds fused into the phase-A bwd kernel, dmixed streamed once)
    o4 = _st_path(q4c, k4c, v4c, m_far.astype(cdt), mb, gsz, c, h)
    o = o4.reshape(b, n * c, h * dv)[:, :t].astype(in_dtype)
    states_out = None
    if output_final_state:
        # cache path only (prefill/eval, never differentiated); XLA CSEs
        # this with the identical phase-A call inside _st_path in no-grad
        # graphs, and grad graphs never request the cache
        states4 = _phase_a(k4c, v4c, h)
        states_out = (
            states4[:, :n_real]
            .reshape(b, n_real, h, dk, dv)
            .transpose(0, 2, 1, 3, 4)
            .astype(f32)
        )
    return o, states_out


@functools.partial(jax.jit, static_argnames=("chunk_size", "output_final_state"))
def mhla_chunk_fused(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mixing_matrix: jax.Array,
    chunk_size: int = 64,
    output_final_state: bool = False,
    segment_ids: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Drop-in for :func:`mhla_tpu.ops.mhla_chunk` with the fused Pallas
    supertile kernels — same [B, T, H, D] API, fp32-accumulation numerics.

    Note: the 4D head axis costs one TPU tile-relayout per input at the
    kernel boundary; layers should prefer :func:`mhla_chunk_fused_flat`,
    which takes the projection-natural [B, T, H*D] layout end to end.
    """
    b, t, h, dk = q.shape
    dv = v.shape[-1]
    o, states_out = mhla_chunk_fused_flat(
        q.reshape(b, t, h * dk),
        k.reshape(b, t, h * dk),
        v.reshape(b, t, h * dv),
        mixing_matrix,
        num_heads=h,
        chunk_size=chunk_size,
        output_final_state=output_final_state,
        segment_ids=segment_ids,
    )
    return o.reshape(b, t, h, dv), states_out
