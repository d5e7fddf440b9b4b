"""Fused Pallas path for chunked GLA (gated linear attention training op).

GLA shares the chunked-MHLA skeleton (SURVEY.md section 2.3 calls the
reference's ``fla/ops/gla/chunk.py`` the architectural template), so the
fused path is assembled FROM the MHLA kernels:

  A. decayed per-chunk states   U_j = (k_j e^{g_end_j - g_j})^T v_j
     -> ``_phase_a`` on pre-decayed keys (elementwise decay fused by XLA
     into the stream)
  B. state recurrence           s_j = s_{j-1} * e^{g_end_{j-1}} + U_{j-1}
     -> a lax.scan of ELEMENTWISE ops over the chunk axis (no einsum, no
     MXU; ~0.3 ms at 32k) — GLA's "mixing" is the per-channel decay chain,
     where MHLA has a learned [N, N] GEMM
  C. output                     o = (q e^g) @ s + tril((q e^g)(k e^-g)^T) v
     -> ``_phase_c_st`` with an IDENTITY near-mixing block: w = rep I rep^T
     masked causal is exactly "intra-chunk causal attention, zero
     cross-chunk", and the virtual-value dots read each chunk's prefix
     state. The supertile backward comes along for free (the identity
     block's gradient is discarded by autodiff).

Stability stance matches ``ops.gla_chunk`` (and the reference): decays are
applied as e^{g} / e^{-g} relative to the WITHIN-chunK cumulative sum, so
exponents are bounded by one chunk's worth of log-decay.

Reference: ``mhla_nlp/fla/ops/gla/chunk.py:1014-1160``.

PRODUCTION DEFAULT IS THE JNP OP. Measured on v5e at 32k/8h/128d bf16
(``benchmarks/gla_bench.py``, BENCH r4 ``benchmarks/RESULTS.jsonl``): fused
7.70 ms vs jnp 4.07 ms forward (0.53x), 10.58 vs 7.55 ms fwd+bwd — XLA
compiles GLA's 5D einsums better than this kernel assembly. The bottleneck
is phase C's virtual-value reads: GLA needs each chunk's PREFIX state (a
[G, H*Dk, Dv] stream per supertile where MHLA reads one mixed state), so
the supertile readout becomes HBM-bound on re-streamed states while XLA's
einsum form keeps the decay chain fused into the output GEMM. The Pallas
assembly stays available for interpret-mode correctness tests and via
``MHLA_TPU_GLA_FUSED=1`` for kernel iteration until it beats jnp.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .mhla_chunk_pallas import (
    _interpret,
    _phase_a,
    _phase_c_st,
    _pick_supertile,
    _use_pallas,
)


def _fused_enabled() -> bool:
    return os.environ.get("MHLA_TPU_GLA_FUSED", "0") == "1" or _interpret()


@functools.partial(jax.jit, static_argnames=("chunk_size", "output_final_state"))
def gla_chunk_fused(
    q: jax.Array,  # [B, T, H, Dk]
    k: jax.Array,
    v: jax.Array,  # [B, T, H, Dv]
    gk: jax.Array,  # [B, T, H, Dk] (or [B, T, H]) per-step log decay (<= 0)
    initial_state: Optional[jax.Array] = None,  # [B, H, Dk, Dv]
    chunk_size: int = 64,
    output_final_state: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Drop-in for :func:`mhla_tpu.ops.gla_chunk.gla_chunk` with the fused
    Pallas phases on TPU (falls back to the jnp op elsewhere)."""
    from ..ops.gla_chunk import _expand_gk, _pad_to_chunks, gla_chunk

    b, t, h, dk = q.shape
    dv = v.shape[-1]
    c = chunk_size
    gsz_probe = _pick_supertile(0, c, h, dk, dv, 2)
    if not (
        _use_pallas(c, dk, dv) and gsz_probe * c >= 128 and _fused_enabled()
    ):
        return gla_chunk(
            q, k, v, gk, initial_state=initial_state, chunk_size=chunk_size,
            output_final_state=output_final_state,
        )

    in_dtype = q.dtype
    f32 = jnp.float32
    cdt = jnp.bfloat16 if in_dtype == jnp.bfloat16 else f32
    scale = dk**-0.5

    gk = _expand_gk(gk, dk)
    q = _pad_to_chunks(q, c)
    k = _pad_to_chunks(k, c)
    v = _pad_to_chunks(v, c)
    gk = _pad_to_chunks(gk.astype(f32), c)
    n_real = q.shape[1] // c

    gsz = _pick_supertile(n_real, c, h, dk, dv, 2 if cdt == jnp.bfloat16 else 4)
    n = ((n_real + gsz - 1) // gsz) * gsz
    pad_n = n - n_real

    def to_chunks(x, d):
        x = x.reshape(b, n_real, c, h * d)
        if pad_n:
            x = jnp.pad(x, ((0, 0), (0, pad_n), (0, 0), (0, 0)))
        return x

    q4 = to_chunks(q, dk)
    k4 = to_chunks(k, dk)
    v4 = to_chunks(v, dv)
    g4 = to_chunks(gk, dk)  # fp32 [B, N, C, H*Dk]

    gcum = jnp.cumsum(g4, axis=2)  # inclusive within-chunk cumsum
    glast = gcum[:, :, -1]  # [B, N, H*Dk]

    # pre-decayed streams (elementwise; XLA fuses the exp into the copies)
    qd4 = (q4.astype(f32) * jnp.exp(gcum) * scale).astype(cdt)
    kd4 = (k4.astype(f32) * jnp.exp(-gcum)).astype(cdt)
    kc4 = (k4.astype(f32) * jnp.exp(glast[:, :, None] - gcum)).astype(cdt)
    v4c = v4.astype(cdt)

    # A: decayed per-chunk state contributions U_j [B, N, H*Dk, Dv]
    u4 = _phase_a(kc4, v4c, h)

    # B: per-channel decay recurrence over chunks (exclusive prefix states)
    decay = jnp.exp(glast)  # [B, N, H*Dk] fp32
    s0 = (
        initial_state.astype(f32).transpose(0, 1, 2, 3).reshape(b, h * dk, dv)
        if initial_state is not None
        else jnp.zeros((b, h * dk, dv), f32)
    )

    def scan_step(s, xs):
        u_j, d_j = xs  # [B, H*Dk, Dv], [B, H*Dk]
        s_next = s * d_j[..., None] + u_j.astype(f32)
        return s_next, s.astype(cdt)  # emit the state BEFORE this chunk

    s_final, states4 = jax.lax.scan(
        scan_step,
        s0,
        (u4.transpose(1, 0, 2, 3), decay.transpose(1, 0, 2)),
    )
    states4 = states4.transpose(1, 0, 2, 3)  # [B, N, H*Dk, Dv]

    # C: supertile readout + intra-chunk causal attention. An identity
    # near-mixing block makes the [S, S] weight exactly blockdiag(tril):
    # cross-chunk pairs weight 0 (they ride in via the prefix states).
    ns = n // gsz
    s_len = gsz * c
    mb = jnp.broadcast_to(jnp.eye(gsz, dtype=f32), (ns, gsz, gsz))
    o = _phase_c_st(
        qd4.reshape(b, ns, s_len, h * dk),
        kd4.reshape(b, ns, s_len, h * dk),
        v4c.reshape(b, ns, s_len, h * dv),
        states4,
        mb,
        gsz,
        c,
        h,
    )
    o = o.reshape(b, n * c, h, dv)[:, :t].astype(in_dtype)
    if not output_final_state:
        return o, None
    # final state: carry after the last REAL chunk (pad chunks have
    # decay 1 and U 0, so the scan carry is already correct)
    return o, s_final.reshape(b, h, dk, dv)
