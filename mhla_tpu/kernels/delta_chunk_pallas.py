"""Fused Pallas kernels for the chunked (WY-form) gated delta rule.

The reference's training path is a fused Triton kernel family
(``mhla_nlp/fla/ops/gated_delta_rule/{wy_fast,chunk}.py``) that keeps the
recurrent state in SRAM across a sequential chunk loop. The TPU analogue
here follows the same sequential-supertile shape that won for GLA
(``gla_chunk_pallas.py``): ONE ``pallas_call`` whose grid walks
(batch, supertile) in order — TPU grids execute sequentially on a core —
with the [H*Dk, Dv] fp32 state in VMEM scratch across grid steps and G
chunks processed per step. Per chunk (all in VMEM):

    A     = beta_i * (K K^T) * exp(G_i - G_j)   masked strictly-lower
    T     = (I + A)^-1                          (Neumann: A nilpotent)
    u     = T (beta * V);  w = T (beta * e^G * K)
    v_eff = u - w @ S
    o     = (Q e^G) @ S * scale + ((Q K^T) * e^{G_i - G_j} masked) v_eff
    S     = e^{g_last} S + (K e^{g_last - G})^T v_eff

Design notes (the first, one-chunk-per-step fp32 version measured only
1.44x the jnp op at 32k — these are what moved it):

  - every MXU dot takes bf16 (``cdt``) inputs with fp32 accumulation when
    the op runs in bf16 — the fp32-input version pays the ~6x multi-pass
    fp32 MXU rate on EVERY dot, which was the dominant cost;
  - G chunks per grid step: the WY solve / kk / qk / u / w of the G chunks
    (and of all heads) are INDEPENDENT dots the compiler can pipeline
    around the two chained GEMMs per chunk (v_eff = u - w S and the state
    update) that the delta rule's math genuinely serializes — with one
    chunk per step there is nothing to overlap them with;
  - the pairwise decay exp(G_i - G_j) CANNOT be factored into per-token
    streams (e^{-G} overflows at delta-rule decay magnitudes — see
    ``ops/delta_rule.py``), so the masked [C, C] decay matrices are
    precomputed by XLA and streamed ([B, NS, S, H*C] bf16, ~34 MB at 32k
    = cheaper than 16.8M in-kernel transcendentals plus the 1-wide
    [C, 1] gate slices the old kernel took them from);
  - every intermediate is a VALUE; only the state carry touches scratch
    (Mosaic orders ref accesses, so scratch round-trips serialize the
    step — the same lesson as the GLA/MHLA supertile kernels);
  - backward residuals are the supertile-entry states only (G-times fewer
    than per-chunk saves, stored in the compute dtype), re-expanded to
    per-chunk entry states by an in-kernel forward replay.

The backward is a second sequential-grid kernel walking supertiles in
REVERSE (reversed BlockSpec index maps), carrying the state cotangent in
VMEM scratch. Per supertile it recomputes the per-chunk WY quantities
(independent dots), replays the forward state chain, runs the mirrored
reverse cotangent chain, and emits dq/dk/dv/dG/dbeta; the q/k L2-norm and
the within-chunk cumsum (g -> G) are differentiated outside the kernel
(cheap elementwise XLA).

Semantics match :func:`mhla_tpu.ops.delta_rule.gated_delta_chunk` exactly
(same oracle tests). Reference: ``fla/ops/gated_delta_rule/chunk.py``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mhla_chunk_pallas import _hslice, _interpret, _use_pallas

_VMEM_BUDGET = 13 * 1024 * 1024

# Mosaic's default scoped-VMEM limit is 16 MiB, and its stack accounting
# charges kernel-body temporaries beyond the double-buffered blocks the
# G-picker budgets for (the 32k bf16 backward allocates a 24.5 MiB stack
# and OOMs at the default). v5e has 128 MiB of VMEM per core; raise the
# scoped limit and let _pick_gsz keep the real block working set bounded.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)


def _pick_gsz(c: int, h: int, dk: int, dv: int, nbytes: int) -> int:
    """Largest G in {8,4,2,1} whose double-buffered BACKWARD working set
    (blocks + per-chunk live values) fits the VMEM budget. One shared G
    for fwd and bwd keeps the saved-state layout consistent."""
    for g in (8, 4, 2, 1):
        s = g * c
        inb = (
            (2 * s * h * dk + 2 * s * h * dv) * nbytes  # qn, kn, v, do
            + 2 * s * h * c * nbytes  # decay matrices
            + 3 * s * h * 4  # gate columns
            + g * h * 4  # e^{g_last} scalars
            + h * dk * dv * nbytes  # saved entry state (cdt)
            + h * dk * dv * 4  # final-state cotangent
        )
        outb = (
            (2 * s * h * dk + s * h * dv) * nbytes  # dq, dk, dv (cdt)
            + 2 * s * h * 4  # dG, dbeta
            + h * dk * dv * 4  # ds0
        )
        live = g * (2 * c * c + 3 * c * dv + 3 * c * dk + 3 * dk * dv) * 4
        if 2 * (inb + outb) + h * dk * dv * 4 + live <= _VMEM_BUDGET or g == 1:
            return g
    return 1


def _neumann_inv(a, c):
    """(I + A)^-1 for strictly-lower-triangular A (nilpotent) as a Neumann
    product of log2(C) squarings. The products MUST be true fp32: the
    partial products are alternating sums with real cancellation, and bf16
    inputs here amplify through the v_eff -> state feedback to ~11% output
    error at 2k tokens (measured). Plain f32 jnp.dot is NOT enough — the
    TPU default matmul precision truncates f32 dot inputs to one bf16 pass
    (measured bit-identical to the bf16 kernel), so the dots carry an
    explicit HIGHEST precision. Everything downstream of the solve is safe
    in the compute dtype."""
    f32 = jnp.float32
    hi = jax.lax.Precision.HIGHEST
    eye = jnp.eye(c, dtype=f32)
    steps = max((c - 1).bit_length() - 1, 0)
    x = -a
    t_inv = eye + x
    for _ in range(steps):
        x = jnp.dot(x, x, preferred_element_type=f32, precision=hi)
        t_inv = jnp.dot(
            t_inv, eye + x, preferred_element_type=f32, precision=hi
        )
    return t_inv


def _delta_fwd_kernel(
    nh, dk, dv, c, gsz, scale, collect,
    qn_ref, kn_ref, v_ref, ds_ref, di_ref, eg_ref, ec_ref, bt_ref, el_ref,
    s0_ref, o_ref, sout_ref, *rest,
):
    if collect:
        st_ref, s_ref = rest
    else:
        (s_ref,) = rest
    f32 = jnp.float32
    cdt = qn_ref.dtype
    # On the f32 (non-bf16) path the jnp oracle traces under HIGHEST matmul
    # precision; match it so the already-slow f32 path is also the exact one.
    prec = jax.lax.Precision.HIGHEST if cdt == f32 else None
    dot = lambda a, b: jnp.dot(  # noqa: E731
        a, b, preferred_element_type=f32, precision=prec
    )
    dot_bt = lambda a, b: jax.lax.dot_general(  # noqa: E731  (a @ b^T)
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=f32, precision=prec,
    )
    dot_t = lambda a, b: jax.lax.dot_general(  # noqa: E731  (a^T @ b)
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=f32, precision=prec,
    )

    @pl.when(pl.program_id(1) == 0)
    def _init():
        s_ref[...] = s0_ref[0]

    if collect:
        st_ref[0, 0] = s_ref[...].astype(st_ref.dtype)  # supertile ENTRY

    egv = eg_ref[0, 0]  # [S, H] f32 gate columns
    ecv = ec_ref[0, 0]
    btv = bt_ref[0, 0]
    elv = el_ref[0, 0]  # [G, H] f32

    for hi in range(nh):
        qh = _hslice(qn_ref[0, 0], hi, dk)  # [S, Dk] cdt
        kh = _hslice(kn_ref[0, 0], hi, dk)
        vh = _hslice(v_ref[0, 0], hi, dv)
        dsh = _hslice(ds_ref[0, 0], hi, c)  # [S, C] cdt (strict decay)
        dih = _hslice(di_ref[0, 0], hi, c)  # [S, C] cdt (incl decay * scale)

        # per-chunk WY quantities — independent across chunks and heads
        pre = []
        for g in range(gsz):
            sl = slice(g * c, (g + 1) * c)
            kg, qg, vg = kh[sl], qh[sl], vh[sl]
            beta_col = btv[sl, hi : hi + 1]  # [C, 1] f32
            eg_col = egv[sl, hi : hi + 1]
            ec_col = ecv[sl, hi : hi + 1]
            kk = dot_bt(kg, kg)  # [C, C] f32
            a = kk * dsh[sl].astype(f32) * beta_col  # strict-masked
            t_inv = _neumann_inv(a, c).astype(cdt)
            vb = (vg.astype(f32) * beta_col).astype(cdt)
            u = dot(t_inv, vb)  # [C, Dv] f32
            wsrc = (kg.astype(f32) * (eg_col * beta_col)).astype(cdt)
            w = dot(t_inv, wsrc).astype(cdt)  # [C, Dk]
            p = (dot_bt(qg, kg) * dih[sl].astype(f32)).astype(cdt)  # [C, C]
            qd = (qg.astype(f32) * (eg_col * scale)).astype(cdt)
            kc = (kg.astype(f32) * ec_col).astype(cdt)
            pre.append((u, w, p, qd, kc))

        # the delta rule's genuinely sequential part: two chained GEMMs per
        # chunk (heads are independent chains, so the MXU still overlaps)
        z = s_ref[hi * dk : (hi + 1) * dk, :]  # [Dk, Dv] f32
        for g in range(gsz):
            u, w, p, qd, kc = pre[g]
            sl = slice(g * c, (g + 1) * c)
            zc = z.astype(cdt)
            v_eff = u - dot(w, zc)  # [C, Dv] f32
            v_eff_c = v_eff.astype(cdt)
            o = dot(qd, zc) + dot(p, v_eff_c)
            o_ref[0, 0, sl, hi * dv : (hi + 1) * dv] = o.astype(o_ref.dtype)
            z = z * elv[g, hi] + dot_t(kc, v_eff_c)
        s_ref[hi * dk : (hi + 1) * dk, :] = z
    sout_ref[0] = s_ref[...]


def _delta_bwd_kernel(
    nh, dk, dv, c, gsz, scale, ns,
    qn_ref, kn_ref, v_ref, ds_ref, di_ref, eg_ref, ec_ref, bt_ref, el_ref,
    st_ref, do_ref, dsfin_ref,
    dq_ref, dk_ref, dv_ref, dg_ref, dbeta_ref, ds0_ref,
    ds_scr,
):
    """Reverse-supertile step: all supertile-indexed refs carry REVERSED
    index maps, so grid step si processes supertile ns-1-si and ``ds_scr``
    (the chunk-exit state cotangent) flows backward through the sequence.
    Per-chunk entry states are recomputed by replaying the forward chain
    from the supertile-entry state saved by the forward."""
    f32 = jnp.float32
    cdt = qn_ref.dtype
    prec = jax.lax.Precision.HIGHEST if cdt == f32 else None
    dot = lambda a, b: jnp.dot(  # noqa: E731
        a, b, preferred_element_type=f32, precision=prec
    )
    dot_bt = lambda a, b: jax.lax.dot_general(  # noqa: E731
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=f32, precision=prec,
    )
    dot_t = lambda a, b: jax.lax.dot_general(  # noqa: E731
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=f32, precision=prec,
    )

    @pl.when(pl.program_id(1) == 0)
    def _init():
        ds_scr[...] = dsfin_ref[0]

    egv = eg_ref[0, 0]
    ecv = ec_ref[0, 0]
    btv = bt_ref[0, 0]
    elv = el_ref[0, 0]
    rowpos = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)
    ones_c = jnp.ones((c, 1), f32)
    dg_heads, dbeta_heads = [], []

    for hi in range(nh):
        qh = _hslice(qn_ref[0, 0], hi, dk)
        kh = _hslice(kn_ref[0, 0], hi, dk)
        vh = _hslice(v_ref[0, 0], hi, dv)
        doh = _hslice(do_ref[0, 0], hi, dv)
        dsh = _hslice(ds_ref[0, 0], hi, c)
        dih = _hslice(di_ref[0, 0], hi, c)

        # stage 1: independent per-chunk recompute (same as the forward)
        pre = []
        for g in range(gsz):
            sl = slice(g * c, (g + 1) * c)
            kg, qg, vg = kh[sl], qh[sl], vh[sl]
            beta_col = btv[sl, hi : hi + 1]
            eg_col = egv[sl, hi : hi + 1]
            ec_col = ecv[sl, hi : hi + 1]
            kk = dot_bt(kg, kg)
            kkds = kk * dsh[sl].astype(f32)  # strict decayed (pre-beta)
            a = kkds * beta_col
            t_inv = _neumann_inv(a, c).astype(cdt)
            vb = (vg.astype(f32) * beta_col).astype(cdt)
            u = dot(t_inv, vb)
            kneg = kg.astype(f32) * eg_col  # k e^G, f32
            wsrc_f = kneg * beta_col
            w = dot(t_inv, wsrc_f.astype(cdt))
            p = dot_bt(qg, kg) * dih[sl].astype(f32)  # scale inside dih
            qd_f = qg.astype(f32) * (eg_col * scale)
            kc_f = kg.astype(f32) * ec_col
            pre.append((kkds, a, t_inv, u, w, p, qd_f, kc_f, kneg, wsrc_f))

        # stage 2: forward replay — per-chunk ENTRY states and v_eff
        z = st_ref[0, 0, hi * dk : (hi + 1) * dk, :].astype(f32)
        zs, veffs = [], []
        for g in range(gsz):
            _, _, _, u, w, _, _, kc_f, _, _ = pre[g]
            zs.append(z)
            v_eff = u - dot(w.astype(cdt), z.astype(cdt))
            veffs.append(v_eff)
            z = z * elv[g, hi] + dot_t(
                kc_f.astype(cdt), v_eff.astype(cdt)
            )

        # stage 3+4: reverse cotangent chain; per-chunk grads ride along
        dz = ds_scr[hi * dk : (hi + 1) * dk, :]  # chunk-EXIT cotangent
        dg_cols = [None] * gsz
        dbeta_cols = [None] * gsz
        for g in reversed(range(gsz)):
            kkds, a, t_inv, u, w, p, qd_f, kc_f, kneg, wsrc_f = pre[g]
            sl = slice(g * c, (g + 1) * c)
            kg, qg, vg = kh[sl], qh[sl], vh[sl]
            do_g = doh[sl]
            beta_col = btv[sl, hi : hi + 1]
            eg_col = egv[sl, hi : hi + 1]
            ec_col = ecv[sl, hi : hi + 1]
            s_in, v_eff = zs[g], veffs[g]
            s_in_c = s_in.astype(cdt)
            v_eff_c = v_eff.astype(cdt)
            dz_c = dz.astype(cdt)
            qd_c = qd_f.astype(cdt)

            # chain: dv_eff needs THIS chunk's exit cotangent dz
            dv_eff = dot_t(p.astype(cdt), do_g) + dot(kc_f.astype(cdt), dz_c)
            dv_eff_c = dv_eff.astype(cdt)
            # entry-state cotangent -> previous chunk
            dz_prev = (
                dz * elv[g, hi]
                + dot_t(qd_c, do_g)
                - dot_t(w.astype(cdt), dv_eff_c)
            )

            # S' = e^gl S + kc^T v_eff
            dkc = dot_bt(v_eff_c, dz_c)  # [C, Dk]
            dgl = elv[g, hi] * jnp.sum(s_in * dz)
            # o = qd S + P v_eff
            dqd = dot_bt(do_g, s_in_c)  # [C, Dk]
            dp = dot_bt(do_g, v_eff_c)  # [C, C]
            # u = T vb, w = T wsrc: dx = T^T dy; dA = -(T^T dy) y^T
            du_c = dv_eff_c
            dw = -dot_bt(dv_eff_c, s_in_c)  # [C, Dk]
            dmu = dot_t(t_inv, du_c)  # [C, Dv]
            dmw = dot_t(t_inv, dw.astype(cdt))  # [C, Dk]
            da = -(
                dot_bt(dmu.astype(cdt), u.astype(cdt))
                + dot_bt(dmw.astype(cdt), w.astype(cdt))
            )  # [C, C]; upper triangle auto-masked by every consumer below

            # A = beta ⊙ kkds
            dkk = (da * dsh[sl].astype(f32) * beta_col).astype(cdt)
            dk_g = dot(dkk, kg) + dot_t(dkk, kg)
            dbeta_g = jnp.sum(da * kkds, 1, keepdims=True)
            # u, w source terms
            dv_g = dmu * beta_col
            dbeta_g = dbeta_g + jnp.sum(dmu * vg.astype(f32), 1, keepdims=True)
            dk_g = dk_g + dmw * (eg_col * beta_col)
            dbeta_g = dbeta_g + jnp.sum(dmw * kneg, 1, keepdims=True)
            dg_g = jnp.sum(dmw * wsrc_f, 1, keepdims=True)
            # intra attention scores (scale+decay inside dih)
            dqk = (dp * dih[sl].astype(f32)).astype(cdt)
            dq_g = dqd * (eg_col * scale) + dot(dqk, kg)
            dk_g = dk_g + dot_t(dqk, qg)
            # kc = k e^{gl - G}
            dk_g = dk_g + dkc * ec_col
            dg_g = dg_g - jnp.sum(dkc * kc_f, 1, keepdims=True)
            dgl = dgl + jnp.sum(dkc * kc_f)
            # qd = q e^G scale
            dg_g = dg_g + jnp.sum(dqd * qd_f, 1, keepdims=True)
            # pairwise exp(G_i - G_j): +row sums, -col sums (MXU transpose)
            m = da * a + dp * p
            dg_g = dg_g + jnp.sum(m, 1, keepdims=True) - dot_t(m, ones_c)
            dg_g = dg_g + jnp.where(rowpos == c - 1, dgl, 0.0)

            dq_ref[0, 0, sl, hi * dk : (hi + 1) * dk] = dq_g.astype(
                dq_ref.dtype
            )
            dk_ref[0, 0, sl, hi * dk : (hi + 1) * dk] = dk_g.astype(
                dk_ref.dtype
            )
            dv_ref[0, 0, sl, hi * dv : (hi + 1) * dv] = dv_g.astype(
                dv_ref.dtype
            )
            dg_cols[g] = dg_g
            dbeta_cols[g] = dbeta_g
            dz = dz_prev
        ds_scr[hi * dk : (hi + 1) * dk, :] = dz
        dg_heads.append(jnp.concatenate(dg_cols, axis=0))  # [S, 1]
        dbeta_heads.append(jnp.concatenate(dbeta_cols, axis=0))

    dg_ref[0, 0] = jnp.concatenate(dg_heads, axis=1)  # [S, H]
    dbeta_ref[0, 0] = jnp.concatenate(dbeta_heads, axis=1)

    @pl.when(pl.program_id(1) == ns - 1)
    def _final():
        ds0_ref[0] = ds_scr[...]


def _prep(qn, kn, v, g, beta, chunk_size):
    """Shared fwd/bwd preprocessing: pad to chunks, pad chunks to
    supertiles, head-flat supertile views, decay-matrix and gate-column
    streams. qn/kn are the (already L2-normed) fp32 q/k."""
    from ..ops.mhla_chunk import _pad_to_chunks

    b, t, h, dk = qn.shape
    dv = v.shape[-1]
    c = chunk_size
    f32 = jnp.float32
    in_dtype = v.dtype
    cdt = jnp.bfloat16 if in_dtype == jnp.bfloat16 else f32
    scale = dk**-0.5

    qp = _pad_to_chunks(qn, c)
    kp = _pad_to_chunks(kn, c)
    vp = _pad_to_chunks(v.astype(f32), c)
    gp = _pad_to_chunks(g.astype(f32), c)
    bp = _pad_to_chunks(beta.astype(f32), c)
    n_real = qp.shape[1] // c

    gsz = _pick_gsz(c, h, dk, dv, 2 if cdt == jnp.bfloat16 else 4)
    n = ((n_real + gsz - 1) // gsz) * gsz
    pad_n = n - n_real

    def to_chunks(x, d):
        x = x.reshape(b, n_real, c, h * d)
        if pad_n:
            x = jnp.pad(x, ((0, 0), (0, pad_n), (0, 0), (0, 0)))
        return x

    q4 = to_chunks(qp, dk).astype(cdt)
    k4 = to_chunks(kp, dk).astype(cdt)
    v4 = to_chunks(vp, dv).astype(cdt)
    g4 = gp.reshape(b, n_real, c, h)
    b4 = bp.reshape(b, n_real, c, h)
    if pad_n:
        g4 = jnp.pad(g4, ((0, 0), (0, pad_n), (0, 0), (0, 0)))
        b4 = jnp.pad(b4, ((0, 0), (0, pad_n), (0, 0), (0, 0)))

    gcum = jnp.cumsum(g4, axis=2)  # inclusive within-chunk cumsum, f32
    gl = gcum[:, :, -1]  # [B, N, H]

    # pairwise decay matrices (exp(G_i - G_j), masked) — cannot be factored
    # into per-token streams: e^{-G} overflows at delta decay magnitudes
    gd = gcum[:, :, :, :, None] - gcum.transpose(0, 1, 3, 2)[:, :, None]
    ii = jnp.arange(c)[:, None, None]
    jj = jnp.arange(c)[None, None, :]
    ninf = jnp.float32(-jnp.inf)
    ds5 = jnp.exp(jnp.where(ii > jj, gd, ninf)).astype(cdt)
    di5 = (jnp.exp(jnp.where(ii >= jj, gd, ninf)) * scale).astype(cdt)
    ds4 = ds5.reshape(b, n, c, h * c)
    di4 = di5.reshape(b, n, c, h * c)

    eg4 = jnp.exp(gcum)  # [B, N, C, H] f32
    ec4 = jnp.exp(gl[:, :, None, :] - gcum)
    el4 = jnp.exp(gl)  # [B, N, H]

    ns = n // gsz
    s_len = gsz * c
    sh = lambda d: (b, ns, s_len, h * d)  # noqa: E731
    streams = (
        q4.reshape(sh(dk)),
        k4.reshape(sh(dk)),
        v4.reshape(sh(dv)),
        ds4.reshape(b, ns, s_len, h * c),
        di4.reshape(b, ns, s_len, h * c),
        eg4.reshape(b, ns, s_len, h),
        ec4.reshape(b, ns, s_len, h),
        b4.reshape(b, ns, s_len, h),
        el4.reshape(b, ns, gsz, h),
    )
    geom = (b, t, h, dk, dv, c, gsz, n, ns, in_dtype, cdt)
    return streams, geom


def _specs(geom):
    b, t, h, dk, dv, c, gsz, n, ns, in_dtype, cdt = geom
    s_len = gsz * c
    fwd = lambda bi, ni: (bi, ni, 0, 0)  # noqa: E731
    rev = lambda bi, ni: (bi, ns - 1 - ni, 0, 0)  # noqa: E731

    def tok(d, idx):
        return pl.BlockSpec((1, 1, s_len, h * d), idx)

    def col(idx):
        return pl.BlockSpec((1, 1, s_len, h), idx)

    el = lambda idx: pl.BlockSpec((1, 1, gsz, h), idx)  # noqa: E731
    state = pl.BlockSpec((1, h * dk, dv), lambda bi, ni: (bi, 0, 0))
    st4 = lambda idx: pl.BlockSpec((1, 1, h * dk, dv), idx)  # noqa: E731
    return fwd, rev, tok, col, el, state, st4


def _delta_fused_fwd_impl(
    q, k, v, g, beta, s0, chunk_size, use_qk_l2norm, collect_states=False
):
    """Padded/shaped Pallas dispatch. q/k/v: [B, T, H, D]; g/beta [B, T, H];
    s0 [B, H, Dk, Dv] fp32. Returns (o [B, T, H, Dv], s_final) plus, with
    ``collect_states``, the supertile-entry states [B, NS, H*Dk, Dv] in the
    compute dtype (the backward kernel's residual)."""
    from ..ops.delta_rule import l2norm

    f32 = jnp.float32
    if use_qk_l2norm:
        qn, kn = l2norm(q.astype(f32)), l2norm(k.astype(f32))
    else:
        qn, kn = q.astype(f32), k.astype(f32)
    streams, geom = _prep(qn, kn, v, g, beta, chunk_size)
    b, t, h, dk, dv, c, gsz, n, ns, in_dtype, cdt = geom
    s_len = gsz * c
    fwd, rev, tok, col, el, state, st4 = _specs(geom)
    s0f = s0.astype(f32).reshape(b, h * dk, dv)
    scale = dk**-0.5

    in_specs = [
        tok(dk, fwd), tok(dk, fwd), tok(dv, fwd),
        tok(c, fwd), tok(c, fwd),
        col(fwd), col(fwd), col(fwd), el(fwd), state,
    ]
    out_specs = [tok(dv, fwd), state]
    out_shape = [
        jax.ShapeDtypeStruct((b, ns, s_len, h * dv), in_dtype),
        jax.ShapeDtypeStruct((b, h * dk, dv), f32),
    ]
    if collect_states:
        out_specs.append(st4(fwd))
        out_shape.append(jax.ShapeDtypeStruct((b, ns, h * dk, dv), cdt))
    nb = streams[0].dtype.itemsize
    outs = pl.pallas_call(
        functools.partial(
            _delta_fwd_kernel, h, dk, dv, c, gsz, scale, collect_states
        ),
        grid=(b, ns),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((h * dk, dv), f32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * n * c * (3 * c * (dk + dv) // 2 + 3 * dk * dv),
            bytes_accessed=(
                streams[0].size * 2 + streams[2].size * 2 + streams[3].size * 2
            )
            * nb,
            transcendentals=0,
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(*streams, s0f)
    o4, s_out = outs[0], outs[1]
    o = o4.reshape(b, n * c, h, dv)[:, :t]
    s_final = s_out.reshape(b, h, dk, dv)
    if collect_states:
        return o, s_final, outs[2]
    return o, s_final


def _delta_bwd_impl(
    q, k, v, g, beta, s0, states4, do, ds, chunk_size, use_qk_l2norm
):
    """Fused backward dispatch. Differentiates the L2 norm and the
    within-chunk cumsum outside the kernel (elementwise XLA); the kernel
    emits cotangents w.r.t. the normed q/k and the inclusive cumsum G."""
    from ..ops.delta_rule import l2norm
    from ..ops.mhla_chunk import _pad_to_chunks

    f32 = jnp.float32
    qf, kf = q.astype(f32), k.astype(f32)
    if use_qk_l2norm:
        qn, q_vjp = jax.vjp(l2norm, qf)
        kn, k_vjp = jax.vjp(l2norm, kf)
    else:
        qn, kn = qf, kf
    streams, geom = _prep(qn, kn, v, g, beta, chunk_size)
    b, t, h, dk, dv, c, gsz, n, ns, in_dtype, cdt = geom
    s_len = gsz * c
    fwd, rev, tok, col, el, state, st4 = _specs(geom)
    scale = dk**-0.5

    dop = _pad_to_chunks(do.astype(cdt), c)
    n_real = dop.shape[1] // c
    do4 = dop.reshape(b, n_real, c, h * dv)
    if n > n_real:
        do4 = jnp.pad(do4, ((0, 0), (0, n - n_real), (0, 0), (0, 0)))
    do_s = do4.reshape(b, ns, s_len, h * dv)
    dsf = ds.astype(f32).reshape(b, h * dk, dv)

    dq4, dk4, dv4, dg4, dbeta4, ds0 = pl.pallas_call(
        functools.partial(_delta_bwd_kernel, h, dk, dv, c, gsz, scale, ns),
        grid=(b, ns),
        in_specs=[
            tok(dk, rev), tok(dk, rev), tok(dv, rev),
            tok(c, rev), tok(c, rev),
            col(rev), col(rev), col(rev), el(rev),
            st4(rev), tok(dv, rev), state,
        ],
        out_specs=(
            tok(dk, rev), tok(dk, rev), tok(dv, rev),
            col(rev), col(rev), state,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, ns, s_len, h * dk), cdt),
            jax.ShapeDtypeStruct((b, ns, s_len, h * dk), cdt),
            jax.ShapeDtypeStruct((b, ns, s_len, h * dv), cdt),
            jax.ShapeDtypeStruct((b, ns, s_len, h), f32),
            jax.ShapeDtypeStruct((b, ns, s_len, h), f32),
            jax.ShapeDtypeStruct((b, h * dk, dv), f32),
        ),
        scratch_shapes=[pltpu.VMEM((h * dk, dv), f32)],
        cost_estimate=pl.CostEstimate(
            flops=6 * b * h * n * c * (3 * c * (dk + dv) // 2 + 3 * dk * dv),
            bytes_accessed=(
                streams[0].size * 4 + streams[2].size * 4 + streams[3].size * 2
            )
            * streams[0].dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(*streams, states4, do_s, dsf)

    # G = within-chunk inclusive cumsum(g)  =>  dg_t = sum_{t' >= t} dG_t'
    dgc = dg4.reshape(b, n, c, h)
    dgc = jnp.flip(jnp.cumsum(jnp.flip(dgc, 2), axis=2), 2)

    def unpad(x4, d):
        return x4.reshape(b, n * c, h, d)[:, :t]

    dqn = unpad(dq4, dk).astype(f32)
    dkn = unpad(dk4, dk).astype(f32)
    dv_out = unpad(dv4, dv).astype(v.dtype)
    dg_out = dgc.reshape(b, n * c, h)[:, :t].astype(g.dtype)
    dbeta_out = dbeta4.reshape(b, n * c, h)[:, :t].astype(beta.dtype)
    if use_qk_l2norm:
        dq_out = q_vjp(dqn)[0].astype(q.dtype)
        dk_out = k_vjp(dkn)[0].astype(k.dtype)
    else:
        dq_out = dqn.astype(q.dtype)
        dk_out = dkn.astype(k.dtype)
    ds0_out = ds0.reshape(b, h, dk, dv).astype(s0.dtype)
    return dq_out, dk_out, dv_out, dg_out, dbeta_out, ds0_out


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _delta_fused(q, k, v, g, beta, s0, chunk_size, output_final_state,
                 use_qk_l2norm):
    o, s = _delta_fused_fwd_impl(q, k, v, g, beta, s0, chunk_size, use_qk_l2norm)
    return o, (s if output_final_state else jnp.zeros_like(s))


def _delta_fused_fwd(q, k, v, g, beta, s0, chunk_size, output_final_state,
                     use_qk_l2norm):
    o, s, states4 = _delta_fused_fwd_impl(
        q, k, v, g, beta, s0, chunk_size, use_qk_l2norm, collect_states=True
    )
    out = (o, (s if output_final_state else jnp.zeros_like(s)))
    return out, (q, k, v, g, beta, s0, states4)


def _delta_fused_bwd(chunk_size, output_final_state, use_qk_l2norm, res, cts):
    q, k, v, g, beta, s0, states4 = res
    do, ds = cts
    if not output_final_state:
        # the primal returned a constant zeros block for s: no flow back
        ds = jnp.zeros_like(ds)
    return _delta_bwd_impl(
        q, k, v, g, beta, s0, states4, do, ds, chunk_size, use_qk_l2norm
    )


_delta_fused.defvjp(_delta_fused_fwd, _delta_fused_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("chunk_size", "output_final_state", "use_qk_l2norm"),
)
def gated_delta_chunk_fused(
    q: jax.Array,  # [B, T, H, Dk]
    k: jax.Array,
    v: jax.Array,  # [B, T, H, Dv]
    g: jax.Array,  # [B, T, H] log decay (<= 0)
    beta: jax.Array,  # [B, T, H]
    initial_state: Optional[jax.Array] = None,
    chunk_size: int = 64,
    output_final_state: bool = False,
    use_qk_l2norm: bool = True,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Drop-in for :func:`mhla_tpu.ops.delta_rule.gated_delta_chunk` with
    the fused sequential-supertile Pallas kernels on TPU (falls back to the
    jnp op elsewhere)."""
    from ..ops.delta_rule import gated_delta_chunk

    b, t, h, dk = q.shape
    dv = v.shape[-1]
    if not (_use_pallas(chunk_size, dk, dv) and t >= chunk_size):
        return gated_delta_chunk(
            q, k, v, g, beta, initial_state=initial_state,
            chunk_size=chunk_size, output_final_state=output_final_state,
            use_qk_l2norm=use_qk_l2norm,
        )
    s0 = (
        initial_state
        if initial_state is not None
        else jnp.zeros((b, h, dk, dv), jnp.float32)
    )
    o, s = _delta_fused(
        q, k, v, g, beta, s0, chunk_size, output_final_state, use_qk_l2norm
    )
    return o, (s if output_final_state else None)
