"""Fused Pallas path for chunked GLA (gated linear attention training op).

GLA's chunked form (``ops.gla_chunk``, reference template
``mhla_nlp/fla/ops/gla/chunk.py:1014-1160``) is a per-channel-decay state
recurrence plus intra-chunk causal attention. The first fused attempt here
assembled it from the MHLA phase kernels (pre-decayed phase A -> XLA
``lax.scan`` over 512 chunks -> identity-near-mixing phase C) and measured
0.53x the jnp op at 32k: the 512-step elementwise scan is latency-bound and
the per-chunk prefix states round-trip HBM twice (268 MB).

This version is ONE sequential-grid ``pallas_call`` over supertiles of
G chunks (the TPU analogue of the reference Triton kernel's SRAM-resident
state loop, and the same shape as ``delta_chunk_pallas`` but G chunks per
grid step instead of one):

  - the state lives in VMEM scratch across grid steps — per-chunk prefix
    states never touch HBM — and is stored TRANSPOSED, [H*Dv, Dk] (z = S^T
    per head): the per-channel decay is a Dk-vector, so in z-form every
    decay application is a [1, Dk] ROW broadcast (lane-aligned on the
    8x128 VPU) and every state GEMM consumes z without relayout. The
    S-form needs [Dk, 1] column broadcasts and a second [B, NS, H*Dk, G]
    decay stream whose 16-byte minor dim DMAs pathologically;
  - per supertile, the intra-chunk term is ONE wide block-diagonal-masked
    attention per head ([S, S] with S = G*C — big MXU tiles; the masked-out
    cross-chunk scores are cheaper than the strided small-GEMM alternative);
  - the recurrence is decomposed so NO GEMM sits on the sequential chain:
    stage 1 computes the per-chunk contributions u_g^T = v^T (kd e^{g_last})
    (independent MXU dots), stage 2 runs the decay chain as G elementwise
    VMEM ops (VPU), stage 3 reads the stored entry states for the
    cross-chunk output dots (independent again);
  - phase A is folded in: the decayed state contribution uses
    k e^{g_last - G} = kd * e^{g_last}, so only ONE decayed key stream is
    read (the old assembly streamed kd4 AND kc4).

The backward is a second sequential-grid kernel walking supertiles in
REVERSE (reversed BlockSpec index maps), carrying the state cotangent in
VMEM scratch with the same three-stage decomposition. It recomputes the G
per-chunk entry states of each supertile from the supertile-entry state
saved by the forward ([B, NS, H*Dv, Dk] fp32 — G-times smaller than
per-chunk residuals), then emits dqd/dkd/dv/de^{g} in one pass; the
elementwise decay chains (qd = q e^G scale, kd = k e^{-G}, within-chunk
cumsum) are differentiated OUTSIDE the kernel by XLA.

Stability stance matches ``ops.gla_chunk`` (and the reference): decays are
applied relative to the WITHIN-chunk cumulative sum, so exponents are
bounded by one chunk's worth of log-decay.

Also serves mamba2 via the SSD<->GLA duality (scalar-per-head gk).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mhla_chunk_pallas import _hslice, _interpret, _use_pallas

_VMEM_BUDGET = 12 * 1024 * 1024


def _pick_gsz(c: int, h: int, dk: int, dv: int, nbytes: int) -> int:
    """Largest G in {8,4,2,1} whose double-buffered backward working set
    fits the VMEM budget (the chunk count is padded up to a multiple)."""
    for g in (8, 4, 2, 1):
        s = g * c
        inb = (2 * s * h * dk + 2 * s * h * dv) * nbytes + h * dk * dv * 4
        outb = (2 * s * h * dk + s * h * dv) * nbytes + g * h * dk * 4
        scratch = h * dk * dv * 4 + 2 * g * dk * dv * 4
        if 2 * (inb + outb) + scratch <= _VMEM_BUDGET or g == 1:
            return g
    return 1


def _blockdiag_tril(s_len: int, c: int):
    ii = jax.lax.broadcasted_iota(jnp.int32, (s_len, s_len), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (s_len, s_len), 1)
    return (ii // c == jj // c) & (ii >= jj)


def _gla_fwd_kernel(
    nh, dk, dv, c, gsz, collect,
    qd_ref, kd_ref, v_ref, egl_ref, s0_ref,
    o_ref, sout_ref, *rest,
):
    if collect:
        st_ref, s_ref = rest
    else:
        (s_ref,) = rest
    f32 = jnp.float32
    cdt = qd_ref.dtype
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=f32)  # noqa: E731
    dot_bt = lambda a, b: jax.lax.dot_general(  # noqa: E731  (a @ b^T)
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=f32
    )
    dot_t = lambda a, b: jax.lax.dot_general(  # noqa: E731  (a^T @ b)
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )

    @pl.when(pl.program_id(1) == 0)
    def _init():
        s_ref[...] = s0_ref[0]

    if collect:
        st_ref[0, 0] = s_ref[...]  # supertile-ENTRY state (bwd residual)

    s_len = gsz * c
    mask = _blockdiag_tril(s_len, c)

    # All state arrays are z = S^T per head ([Dv, Dk]); every decay is a
    # [1, Dk] row broadcast. Every intermediate stays a VALUE (never a
    # scratch ref): Mosaic orders ref accesses as memory ops, so scratch
    # round-trips serialize the whole step, while values let the compiler
    # pipeline all the independent dots (the MHLA supertile kernels make
    # the same choice). Only the state carry itself touches s_ref.
    rowmask = [
        (jax.lax.broadcasted_iota(jnp.int32, (s_len, dv), 0) // c) == g
        for g in range(gsz)
    ]
    for hi in range(nh):
        hv = slice(hi * dv, (hi + 1) * dv)
        hk = slice(hi * dk, (hi + 1) * dk)
        qh = _hslice(qd_ref[0, 0], hi, dk)  # [S, Dk] cdt (scale folded in)
        kh = _hslice(kd_ref[0, 0], hi, dk)
        vh = _hslice(v_ref[0, 0], hi, dv)
        egl = egl_ref[0, 0, :, hk]  # [gsz, Dk] f32

        # per-chunk contributions u_g^T = v^T (kd e^{g_last}) — independent
        us = []
        for g in range(gsz):
            sl = slice(g * c, (g + 1) * c)
            kc = (kh[sl].astype(f32) * egl[g : g + 1]).astype(cdt)
            us.append(dot_t(vh[sl], kc))  # [Dv, Dk] f32

        # decay recurrence (elementwise, VPU): zs[g] = chunk-ENTRY state
        z = s_ref[hv, :]
        zs = []
        for g in range(gsz):
            zs.append(z)
            z = z * egl[g : g + 1] + us[g]
        s_ref[hv, :] = z

        # intra-chunk causal attention: one wide masked GEMM pair
        scores = jnp.where(mask, dot_bt(qh, kh), 0.0)  # [S, S] f32
        o = dot(scores.astype(cdt), vh)  # [S, Dv] f32

        # cross-chunk readout: full-supertile dots, row-masked per chunk
        # (G medium dots pipeline better than G small row-sliced ones)
        for g in range(gsz):
            far = dot_bt(qh, zs[g].astype(cdt))  # [S, Dv]
            o = o + jnp.where(rowmask[g], far, 0.0)
        o_ref[0, 0, :, hv] = o.astype(o_ref.dtype)
    sout_ref[0] = s_ref[...]


def _gla_bwd_kernel(
    nh, dk, dv, c, gsz, ns,
    qd_ref, kd_ref, v_ref, egl_ref, st_ref, do_ref, dsfin_ref,
    dq_ref, dk_ref, dv_ref, degl_ref, ds0_ref,
    ds_ref,
):
    """Reverse-supertile step. All supertile-indexed refs carry REVERSED
    index maps, so grid step si processes supertile ns-1-si and ``ds_ref``
    (the cotangent of the supertile-entry state, z-form) flows backward.
    Per-chunk entry states are recomputed forward from the supertile-entry
    state saved by the forward; per-chunk exit-state cotangents run as the
    mirror reverse chain. Both live as VALUES (see the forward kernel's
    note on why scratch round-trips would serialize the step)."""
    f32 = jnp.float32
    cdt = qd_ref.dtype
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=f32)  # noqa: E731
    dot_bt = lambda a, b: jax.lax.dot_general(  # noqa: E731
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=f32
    )
    dot_t = lambda a, b: jax.lax.dot_general(  # noqa: E731
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )

    @pl.when(pl.program_id(1) == 0)
    def _init():
        ds_ref[...] = dsfin_ref[0]

    s_len = gsz * c
    mask = _blockdiag_tril(s_len, c)

    for hi in range(nh):
        hk = slice(hi * dk, (hi + 1) * dk)
        hv = slice(hi * dv, (hi + 1) * dv)
        qh = _hslice(qd_ref[0, 0], hi, dk)  # [S, Dk] cdt
        kh = _hslice(kd_ref[0, 0], hi, dk)
        vh = _hslice(v_ref[0, 0], hi, dv)
        doh = _hslice(do_ref[0, 0], hi, dv)
        egl = egl_ref[0, 0, :, hk]  # [gsz, Dk] f32

        # independent per-chunk dots: u^T and the cotangent source terms
        # P_g^T = do[g]^T qd[g]
        us, ps, kcs = [], [], []
        for g in range(gsz):
            sl = slice(g * c, (g + 1) * c)
            kc = (kh[sl].astype(f32) * egl[g : g + 1]).astype(cdt)
            kcs.append(kc)
            us.append(dot_t(vh[sl], kc))  # [Dv, Dk]
            ps.append(dot_t(doh[sl], qh[sl]))  # [Dv, Dk]

        # elementwise recurrences (VPU): forward state replay (zs[g] =
        # chunk-ENTRY state) and reverse cotangent chain (dzs[g] =
        # chunk-EXIT state cotangent)
        z = st_ref[0, 0, hv, :]  # supertile-entry state [Dv, Dk] f32
        zs = []
        for g in range(gsz):
            zs.append(z)
            z = z * egl[g : g + 1] + us[g]
        dz = ds_ref[hv, :]  # cotangent of the supertile-EXIT state
        dzs = [None] * gsz
        for g in reversed(range(gsz)):
            dzs[g] = dz
            dz = dz * egl[g : g + 1] + ps[g]
        ds_ref[hv, :] = dz

        # intra-chunk attention gradients (batched over the supertile)
        scores = jnp.where(mask, dot_bt(qh, kh), 0.0)  # [S, S] f32
        dp = jnp.where(mask, dot_bt(doh, vh), 0.0)
        dp_c = dp.astype(cdt)
        dq_intra = dot(dp_c, kh)  # [S, Dk] f32
        dk_intra = dot_t(dp_c, qh)
        dv_intra = dot_t(scores.astype(cdt), doh)  # [S, Dv] f32

        # per-chunk gradient rows from the entry states / exit cotangents
        # (all dots independent; the two recurrences above were pure VPU)
        degl_rows = []
        for g in range(gsz):
            sl = slice(g * c, (g + 1) * c)
            z_g = zs[g].astype(cdt)  # entry state of chunk g (z-form)
            dz_g = dzs[g]  # cotangent of chunk g's exit state (z-form)
            kc = kcs[g]
            dz_c = dz_g.astype(cdt)

            # S' = S * e^{gl} + kc^T v   (z' = z * e^{gl} + v^T kc)
            dkc = dot(vh[sl], dz_c)  # [C, Dk]
            dv_row = dv_intra[sl] + dot_bt(kc, dz_c)  # [C, Dv]
            # o[g] = qd[g] @ S_g  (+ intra)
            dq_row = dq_intra[sl] + dot(doh[sl], z_g)  # [C, Dk]
            # kc = kd * e^{gl}
            dk_row = dk_intra[sl] + dkc * egl[g : g + 1]
            # de^{gl}: state-decay part sum_Dv(S_g ⊙ dS') + kc part
            # sum_C(dkc ⊙ kd) — both land as [1, Dk] rows, no relayout
            degl_rows.append(
                jnp.sum(zs[g] * dz_g, axis=0, keepdims=True)
                + jnp.sum(dkc * kh[sl].astype(f32), axis=0, keepdims=True)
            )

            dq_ref[0, 0, sl, hk] = dq_row.astype(dq_ref.dtype)
            dk_ref[0, 0, sl, hk] = dk_row.astype(dk_ref.dtype)
            dv_ref[0, 0, sl, hv] = dv_row.astype(dv_ref.dtype)
        degl_ref[0, 0, :, hk] = jnp.concatenate(degl_rows, axis=0)

    @pl.when(pl.program_id(1) == ns - 1)
    def _final():
        ds0_ref[0] = ds_ref[...]


def _prep(q, k, v, gk, chunk_size):
    """Shared fwd/bwd preprocessing: pad to chunks, pad chunks to supertiles,
    head-flat chunk views, decay streams. Returns the padded views plus the
    geometry tuple."""
    from ..ops.gla_chunk import _expand_gk
    from ..ops.mhla_chunk import _pad_to_chunks

    b, t, h, dk = q.shape
    dv = v.shape[-1]
    c = chunk_size
    f32 = jnp.float32
    in_dtype = q.dtype
    cdt = jnp.bfloat16 if in_dtype == jnp.bfloat16 else f32
    scale = dk**-0.5

    gk = _expand_gk(gk, dk)
    q = _pad_to_chunks(q, c)
    k = _pad_to_chunks(k, c)
    v = _pad_to_chunks(v, c)
    gk = _pad_to_chunks(gk.astype(f32), c)
    n_real = q.shape[1] // c

    gsz = _pick_gsz(c, h, dk, dv, 2 if cdt == jnp.bfloat16 else 4)
    n = ((n_real + gsz - 1) // gsz) * gsz
    pad_n = n - n_real

    def to_chunks(x, d):
        x = x.reshape(b, n_real, c, h * d)
        if pad_n:
            x = jnp.pad(x, ((0, 0), (0, pad_n), (0, 0), (0, 0)))
        return x

    q4 = to_chunks(q, dk)
    k4 = to_chunks(k, dk)
    v4 = to_chunks(v, dv).astype(cdt)
    g4 = to_chunks(gk, dk)  # fp32 [B, N, C, H*Dk]; pad chunks have g = 0

    gcum = jnp.cumsum(g4, axis=2)  # inclusive within-chunk cumsum
    glast = gcum[:, :, -1]  # [B, N, H*Dk]

    qd4 = (q4.astype(f32) * jnp.exp(gcum) * scale).astype(cdt)
    kd4 = (k4.astype(f32) * jnp.exp(-gcum)).astype(cdt)
    egl = jnp.exp(glast)  # [B, N, H*Dk] f32 (pad chunks: e^0 = 1)

    ns = n // gsz
    s_len = gsz * c
    shape = lambda d: (b, ns, s_len, h * d)  # noqa: E731
    qd = qd4.reshape(shape(dk))
    kd = kd4.reshape(shape(dk))
    vv = v4.reshape(shape(dv))
    egl_s = egl.reshape(b, ns, gsz, h * dk)
    geom = (b, t, h, dk, dv, c, gsz, n, ns, in_dtype, cdt)
    return qd, kd, vv, egl_s, gcum, geom


def _z_of(s, b, h, dk, dv):
    """[B, H, Dk, Dv] state -> flat z-form [B, H*Dv, Dk]."""
    return s.astype(jnp.float32).transpose(0, 1, 3, 2).reshape(b, h * dv, dk)


def _s_of(z, b, h, dk, dv):
    """Flat z-form [B, H*Dv, Dk] -> [B, H, Dk, Dv]."""
    return z.reshape(b, h, dv, dk).transpose(0, 1, 3, 2)


def _gla_fused_fwd_impl(q, k, v, gk, s0, chunk_size, collect_states=False):
    qd, kd, vv, egl_s, _, geom = _prep(q, k, v, gk, chunk_size)
    b, t, h, dk, dv, c, gsz, n, ns, in_dtype, cdt = geom
    f32 = jnp.float32
    s_len = gsz * c
    s0z = _z_of(s0, b, h, dk, dv)

    tok = lambda d: pl.BlockSpec(  # noqa: E731
        (1, 1, s_len, h * d), lambda bi, ni: (bi, ni, 0, 0)
    )
    egl_spec = pl.BlockSpec((1, 1, gsz, h * dk), lambda bi, ni: (bi, ni, 0, 0))
    state = pl.BlockSpec((1, h * dv, dk), lambda bi, ni: (bi, 0, 0))

    out_specs = [tok(dv), state]
    out_shape = [
        jax.ShapeDtypeStruct((b, ns, s_len, h * dv), in_dtype),
        jax.ShapeDtypeStruct((b, h * dv, dk), f32),
    ]
    if collect_states:
        out_specs.append(
            pl.BlockSpec((1, 1, h * dv, dk), lambda bi, ni: (bi, ni, 0, 0))
        )
        out_shape.append(jax.ShapeDtypeStruct((b, ns, h * dv, dk), f32))
    outs = pl.pallas_call(
        functools.partial(_gla_fwd_kernel, h, dk, dv, c, gsz, collect_states),
        grid=(b, ns),
        in_specs=[tok(dk), tok(dk), tok(dv), egl_spec, state],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((h * dv, dk), f32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * ns * (s_len * s_len * (dk + dv) + gsz * s_len * dk * dv)
            + 2 * b * h * n * c * dk * dv,
            bytes_accessed=(2 * qd.size + 2 * vv.size) * qd.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(qd, kd, vv, egl_s, s0z)
    o = outs[0].reshape(b, n * c, h, dv)[:, :t].astype(in_dtype)
    s_final = _s_of(outs[1], b, h, dk, dv)
    if collect_states:
        return o, s_final, outs[2]
    return o, s_final


def _gla_bwd_impl(q, k, v, gk, s0, states4, do, ds, chunk_size):
    from ..ops.mhla_chunk import _pad_to_chunks

    qd, kd, vv, egl_s, gcum, geom = _prep(q, k, v, gk, chunk_size)
    b, t, h, dk, dv, c, gsz, n, ns, in_dtype, cdt = geom
    f32 = jnp.float32
    s_len = gsz * c

    dop = _pad_to_chunks(do.astype(cdt), c)
    n_real = dop.shape[1] // c
    do4 = dop.reshape(b, n_real, c, h * dv)
    if n > n_real:
        do4 = jnp.pad(do4, ((0, 0), (0, n - n_real), (0, 0), (0, 0)))
    do_s = do4.reshape(b, ns, s_len, h * dv)
    dsz = _z_of(ds, b, h, dk, dv)

    rev = lambda bi, ni: (bi, ns - 1 - ni, 0, 0)  # noqa: E731
    tok = lambda d: pl.BlockSpec((1, 1, s_len, h * d), rev)  # noqa: E731
    egl_spec = pl.BlockSpec((1, 1, gsz, h * dk), rev)
    st4_spec = pl.BlockSpec((1, 1, h * dv, dk), rev)
    state = pl.BlockSpec((1, h * dv, dk), lambda bi, ni: (bi, 0, 0))

    dqd, dkd, dv4, degl, ds0 = pl.pallas_call(
        functools.partial(_gla_bwd_kernel, h, dk, dv, c, gsz, ns),
        grid=(b, ns),
        in_specs=[
            tok(dk), tok(dk), tok(dv), egl_spec, st4_spec, tok(dv), state,
        ],
        out_specs=(tok(dk), tok(dk), tok(dv), egl_spec, state),
        out_shape=(
            jax.ShapeDtypeStruct((b, ns, s_len, h * dk), f32),
            jax.ShapeDtypeStruct((b, ns, s_len, h * dk), f32),
            jax.ShapeDtypeStruct((b, ns, s_len, h * dv), f32),
            jax.ShapeDtypeStruct((b, ns, gsz, h * dk), f32),
            jax.ShapeDtypeStruct((b, h * dv, dk), f32),
        ),
        scratch_shapes=[pltpu.VMEM((h * dv, dk), f32)],
        cost_estimate=pl.CostEstimate(
            flops=6 * b * h * ns * (s_len * s_len * (dk + dv))
            + 6 * b * h * n * c * 2 * dk * dv,
            bytes_accessed=(4 * qd.size + 4 * vv.size) * qd.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(qd, kd, vv, egl_s, states4, do_s, dsz)

    # elementwise decay chains, differentiated here (fused by XLA):
    #   qd = q e^{G} scale   -> dq = dqd e^{G} scale ; dG += dqd * qd
    #   kd = k e^{-G}        -> dk = dkd e^{-G}      ; dG -= dkd * kd
    #   egl = e^{G_last}     -> dG_last += degl * egl
    #   G  = cumsum(g)       -> dg = reverse-cumsum(dG)
    scale = dk**-0.5
    egc = jnp.exp(gcum)  # [B, N, C, H*Dk] f32
    dqd4 = dqd.reshape(b, n, c, h * dk)
    dkd4 = dkd.reshape(b, n, c, h * dk)

    def q4_of(x):  # original (padded) chunk view, f32
        xx = _pad_to_chunks(x.astype(f32), c).reshape(b, n_real, c, h * dk)
        if n > n_real:
            xx = jnp.pad(xx, ((0, 0), (0, n - n_real), (0, 0), (0, 0)))
        return xx

    from ..ops.gla_chunk import _expand_gk

    q4 = q4_of(q)
    k4 = q4_of(k)
    dq4 = dqd4 * egc * scale
    dk4 = dkd4 * jnp.exp(-gcum)
    dgcum = dqd4 * (q4 * egc * scale) - dkd4 * (k4 * jnp.exp(-gcum))
    # e^{G_last} chain lands on the last within-chunk position
    degl_chunk = degl.reshape(b, n, h * dk) * jnp.exp(
        gcum[:, :, -1]
    )  # [B, N, H*Dk]
    dgcum = dgcum.at[:, :, -1, :].add(degl_chunk)
    dg4 = jnp.flip(jnp.cumsum(jnp.flip(dgcum, 2), axis=2), 2)

    def unpad(x4, d):
        return x4.reshape(b, n * c, h, d)[:, :t]

    dq_out = unpad(dq4, dk).astype(q.dtype)
    dk_out = unpad(dk4, dk).astype(k.dtype)
    dv_out = unpad(dv4.reshape(b, n, c, h * dv), dv).astype(v.dtype)
    gk_exp = _expand_gk(gk, dk)
    dg_out = unpad(dg4, dk).astype(gk_exp.dtype)
    ds0_out = _s_of(ds0, b, h, dk, dv).astype(s0.dtype)
    return dq_out, dk_out, dv_out, dg_out, ds0_out


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _gla_fused(q, k, v, gk, s0, chunk_size, output_final_state):
    o, s = _gla_fused_fwd_impl(q, k, v, gk, s0, chunk_size)
    return o, (s if output_final_state else jnp.zeros_like(s))


def _gla_fused_fwd(q, k, v, gk, s0, chunk_size, output_final_state):
    o, s, states4 = _gla_fused_fwd_impl(
        q, k, v, gk, s0, chunk_size, collect_states=True
    )
    out = (o, (s if output_final_state else jnp.zeros_like(s)))
    return out, (q, k, v, gk, s0, states4)


def _gla_fused_bwd(chunk_size, output_final_state, res, cts):
    q, k, v, gk, s0, states4 = res
    do, ds = cts
    if not output_final_state:
        ds = jnp.zeros_like(ds)
    return _gla_bwd_impl(q, k, v, gk, s0, states4, do, ds, chunk_size)


_gla_fused.defvjp(_gla_fused_fwd, _gla_fused_bwd)


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
    sequential-supertile Pallas kernels on TPU (falls back to the jnp op
    elsewhere). The gk cotangent flows through the pre-kernel broadcast, so
    per-head [B, T, H] decays differentiate correctly."""
    from ..ops.gla_chunk import _expand_gk, gla_chunk

    b, t, h, dk = q.shape
    dv = v.shape[-1]
    if not (_use_pallas(chunk_size, dk, dv) and t >= chunk_size):
        return gla_chunk(
            q, k, v, gk, initial_state=initial_state, chunk_size=chunk_size,
            output_final_state=output_final_state,
        )
    gk = _expand_gk(gk, dk)
    s0 = (
        initial_state
        if initial_state is not None
        else jnp.zeros((b, h, dk, dv), jnp.float32)
    )
    o, s = _gla_fused(q, k, v, gk, s0, chunk_size, output_final_state)
    return o, (s if output_final_state else None)
