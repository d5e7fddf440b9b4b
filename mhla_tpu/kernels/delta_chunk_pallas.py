"""Fused Pallas forward for the chunked (WY-form) gated delta rule.

The reference's training path is a fused Triton kernel family
(``mhla_nlp/fla/ops/gated_delta_rule/{wy_fast,chunk}.py``) that keeps the
recurrent state in SRAM across a sequential chunk loop. The TPU analogue:
ONE ``pallas_call`` whose grid walks (batch, chunk) in order — TPU grids
execute sequentially on a core, so the [H*Dk, Dv] fp32 state lives in VMEM
scratch across chunk steps, and per chunk everything (the WY solve, the
delta-corrected values, the output, the state update) happens in VMEM:

    A     = beta * (K K^T) * exp(G_i - G_j)   masked strictly-lower
    T     = (I + A)^-1                        (Neumann: A nilpotent)
    u     = T (beta * V);  w = T (beta * e^G * K)
    v_eff = u - w @ S
    o     = (Q e^G) @ S * scale + ((Q K^T) * e^{G_i - G_j} masked) v_eff
    S     = e^{g_last} S + (K e^{g_last - G})^T v_eff

vs the jnp op (``ops.gated_delta_chunk``), which materializes the [N, C, C]
decay/attention tensors in HBM and runs the recurrence as a ``lax.scan``
of XLA matmuls. The fused kernel reads q/k/v once and writes o once — no
intermediate HBM traffic at all.

The backward is a second sequential-grid kernel walking the chunks in
REVERSE (reversed BlockSpec index maps over the same (batch, chunk) grid),
carrying the [H*Dk, Dv] fp32 state-cotangent in VMEM scratch. Per chunk it
recomputes the WY solve from the saved chunk-entry states (written by the
forward when grads are needed) and emits dq/dk/dv/dG/dbeta in VMEM — the
same flash-style recompute stance as ``mhla_chunk_pallas``'s backward. The
within-chunk cumsum (g -> G) and the q/k L2-norm are differentiated outside
the kernel (cheap elementwise XLA).

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


def _chunk_masks(c):
    idx_r = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    idx_c = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    return idx_r > idx_c, idx_r >= idx_c


def _wy_solve(kh, vh, gc, beta, c, strict):
    """Recompute the per-chunk WY quantities (shared by fwd/bwd kernels).

    Returns (t_inv, u, w, kk, dec_strict, eg) for one head's chunk:
    A = beta * (K K^T) * exp(G_i - G_j) strictly-lower; t_inv = (I+A)^-1
    via the Neumann product (A nilpotent); u = T (beta v);
    w = T (beta e^G k).
    """
    f32 = jnp.float32
    eye = jnp.eye(c, dtype=f32)
    steps = max((c - 1).bit_length() - 1, 0)
    gd = gc - gc.reshape(1, c)
    dec_strict = jnp.where(strict, jnp.exp(gd), 0.0)
    kk = jax.lax.dot_general(
        kh, kh, (((1,), (1,)), ((), ())), preferred_element_type=f32
    )
    a = kk * dec_strict * beta
    x = -a
    t_inv = eye + x
    for _ in range(steps):
        x = jnp.dot(x, x, preferred_element_type=f32)
        t_inv = jnp.dot(t_inv, eye + x, preferred_element_type=f32)
    eg = jnp.exp(gc)
    u = jnp.dot(t_inv, beta * vh, preferred_element_type=f32)
    w = jnp.dot(t_inv, (beta * eg) * kh, preferred_element_type=f32)
    return t_inv, u, w, kk, dec_strict, eg


def _delta_kernel(
    nh, dk, dv, c, scale, collect,
    q_ref, k_ref, v_ref, gc_ref, beta_ref, s0_ref,
    o_ref, sout_ref, *rest,
):
    if collect:
        st4_ref, s_ref = rest
    else:
        (s_ref,) = rest
    f32 = jnp.float32

    @pl.when(pl.program_id(1) == 0)
    def _init():
        s_ref[...] = s0_ref[0]

    if collect:
        st4_ref[0, 0] = s_ref[...]  # state at chunk ENTRY (bwd residual)

    strict, incl = _chunk_masks(c)

    for hi in range(nh):
        qh = _hslice(q_ref[0, 0], hi, dk).astype(f32)
        kh = _hslice(k_ref[0, 0], hi, dk).astype(f32)
        vh = _hslice(v_ref[0, 0], hi, dv).astype(f32)
        gc = gc_ref[0, 0, :, hi : hi + 1].astype(f32)  # [C, 1]
        beta = beta_ref[0, 0, :, hi : hi + 1].astype(f32)
        glast = gc[c - 1, 0]

        t_inv, u, w, kk, dec_strict, eg = _wy_solve(kh, vh, gc, beta, c, strict)
        gd = gc - gc.reshape(1, c)
        dec_incl = jnp.where(incl, jnp.exp(gd), 0.0)

        s_h = s_ref[hi * dk : (hi + 1) * dk, :]  # [Dk, Dv] fp32
        v_eff = u - jnp.dot(w, s_h, preferred_element_type=f32)

        qk = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=f32
        ) * dec_incl
        o = (
            jnp.dot(qh * eg, s_h, preferred_element_type=f32)
            + jnp.dot(qk, v_eff, preferred_element_type=f32)
        ) * scale
        o_ref[0, 0, :, hi * dv : (hi + 1) * dv] = o.astype(o_ref.dtype)

        kc = kh * jnp.exp(glast - gc)
        s_new = s_h * jnp.exp(glast) + jax.lax.dot_general(
            kc, v_eff, (((0,), (0,)), ((), ())), preferred_element_type=f32
        )
        s_ref[hi * dk : (hi + 1) * dk, :] = s_new
    sout_ref[0] = s_ref[...]


def _delta_fused_fwd_impl(
    q, k, v, g, beta, s0, chunk_size, use_qk_l2norm, collect_states=False
):
    """Padded/shaped Pallas dispatch. q/k/v: [B, T, H, D]; g/beta [B, T, H];
    s0 [B, H, Dk, Dv] fp32. Returns (o [B, T, H, Dv], s_final) plus, with
    ``collect_states``, the chunk-entry states [B, N, H*Dk, Dv] fp32 (the
    backward kernel's residual)."""
    from ..ops.delta_rule import l2norm
    from ..ops.mhla_chunk import _pad_to_chunks

    in_dtype = q.dtype
    b, t, h, dk = q.shape
    dv = v.shape[-1]
    c = chunk_size
    f32 = jnp.float32
    if use_qk_l2norm:
        # l2norm outputs fp32; feed the kernel fp32 q/k (no rounding to the
        # input dtype — the jnp op keeps the normed streams fp32 too, and
        # the extra DMA is negligible against the per-chunk MXU work)
        q, k = l2norm(q.astype(f32)), l2norm(k.astype(f32))
    q = _pad_to_chunks(q, c)
    k = _pad_to_chunks(k, c)
    v = _pad_to_chunks(v, c)
    g = _pad_to_chunks(g.astype(f32), c)
    beta = _pad_to_chunks(beta.astype(f32), c)
    n = q.shape[1] // c

    # head-flat chunk layout [B, N, C, H*D] — contiguous full-row DMAs
    q4 = q.reshape(b, n, c, h * dk)
    k4 = k.reshape(b, n, c, h * dk)
    v4 = v.reshape(b, n, c, h * dv)
    gc4 = jnp.cumsum(g.reshape(b, n, c, h), axis=2)  # [B, N, C, H] fp32
    beta4 = beta.reshape(b, n, c, h)
    s0f = s0.astype(f32).reshape(b, h * dk, dv)

    tok = lambda d: pl.BlockSpec(  # noqa: E731
        (1, 1, c, h * d), lambda bi, ni: (bi, ni, 0, 0)
    )
    small = pl.BlockSpec((1, 1, c, h), lambda bi, ni: (bi, ni, 0, 0))
    state = pl.BlockSpec((1, h * dk, dv), lambda bi, ni: (bi, 0, 0))
    scale = dk**-0.5
    out_specs = [tok(dv), state]
    out_shape = [
        jax.ShapeDtypeStruct((b, n, c, h * dv), in_dtype),
        jax.ShapeDtypeStruct((b, h * dk, dv), f32),
    ]
    if collect_states:
        out_specs.append(
            pl.BlockSpec((1, 1, h * dk, dv), lambda bi, ni: (bi, ni, 0, 0))
        )
        out_shape.append(jax.ShapeDtypeStruct((b, n, h * dk, dv), f32))
    outs = pl.pallas_call(
        functools.partial(_delta_kernel, h, dk, dv, c, scale, collect_states),
        grid=(b, n),
        in_specs=[tok(dk), tok(dk), tok(dv), small, small, state],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((h * dk, dv), f32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * n * c * (3 * c * (dk + dv) // 2 + 3 * dk * dv),
            bytes_accessed=(q4.size + k4.size + 2 * v4.size)
            * q4.dtype.itemsize,
            transcendentals=b * h * n * c * c,
        ),
        interpret=_interpret(),
    )(q4, k4, v4, gc4, beta4, s0f)
    o4, s_out = outs[0], outs[1]
    o = o4.reshape(b, n * c, h, dv)[:, :t]
    if collect_states:
        return o, s_out.reshape(b, h, dk, dv), outs[2]
    return o, s_out.reshape(b, h, dk, dv)


def _delta_bwd_kernel(
    nh, dk, dv, c, scale, n,
    q_ref, k_ref, v_ref, gc_ref, beta_ref, st_ref, do_ref, dsfin_ref,
    dq_ref, dk_ref, dv_ref, dg_ref, dbeta_ref, ds0_ref, ds_ref,
):
    """Reverse-chunk step: all chunk-indexed refs carry REVERSED index maps,
    so grid step ni processes chunk n-1-ni and ``ds_ref`` (the cotangent of
    the chunk-entry state) flows backward through the sequence."""
    f32 = jnp.float32
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=f32)  # noqa: E731
    dot_t = lambda a, b: jax.lax.dot_general(  # noqa: E731  (a^T @ b)
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )
    dot_bt = lambda a, b: jax.lax.dot_general(  # noqa: E731  (a @ b^T)
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=f32
    )

    @pl.when(pl.program_id(1) == 0)
    def _init():
        ds_ref[...] = dsfin_ref[0]

    strict, incl = _chunk_masks(c)
    rowpos = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)
    dg_cols, dbeta_cols = [], []

    for hi in range(nh):
        qh = _hslice(q_ref[0, 0], hi, dk).astype(f32)
        kh = _hslice(k_ref[0, 0], hi, dk).astype(f32)
        vh = _hslice(v_ref[0, 0], hi, dv).astype(f32)
        doh = _hslice(do_ref[0, 0], hi, dv).astype(f32)
        gc = gc_ref[0, 0, :, hi : hi + 1].astype(f32)  # [C, 1]
        beta = beta_ref[0, 0, :, hi : hi + 1].astype(f32)
        glast = gc[c - 1, 0]
        egl = jnp.exp(glast)

        # recompute the forward chunk quantities from the entry state
        t_inv, u, w, kk, dec_strict, eg = _wy_solve(
            kh, vh, gc, beta, c, strict
        )
        gd = gc - gc.reshape(1, c)
        dec_incl = jnp.where(incl, jnp.exp(gd), 0.0)
        s_in = st_ref[0, 0, hi * dk : (hi + 1) * dk, :]  # [Dk, Dv] fp32
        dso = ds_ref[hi * dk : (hi + 1) * dk, :]  # dL/dS_out of this chunk
        v_eff = u - dot(w, s_in)
        qk_full = dot_bt(qh, kh) * dec_incl  # unscaled intra scores
        kc = kh * jnp.exp(glast - gc)
        qdec = qh * eg

        # S_out = e^gl S + kc^T v_eff
        dv_eff = dot(kc, dso)  # [C, Dv]
        dkc = dot_bt(v_eff, dso)  # [C, Dk]
        dgl = egl * jnp.sum(s_in * dso)

        # o = scale * (qdec @ S + qk_full @ v_eff)
        dqdec = scale * dot_bt(doh, s_in)  # [C, Dk]
        dP = scale * dot_bt(doh, v_eff)  # [C, C]
        dv_eff = dv_eff + scale * dot_t(qk_full, doh)
        dqk = dP * dec_incl  # d(qh kh^T)
        dGd = dP * qk_full  # pairwise decay cotangent (o term)

        # cotangent of the chunk-ENTRY state (flows to the previous chunk)
        ds_in = (
            egl * dso + scale * dot_t(qdec, doh) - dot_t(w, dv_eff)
        )

        # u = T (beta v), w = T (beta e^G k):  for y = T x,
        # dx = T^T dy and dA = -(T^T dy) y^T  (A strictly lower)
        du = dv_eff
        dw = -dot_bt(dv_eff, s_in)  # [C, Dk]
        dmu = dot_t(t_inv, du)
        dmw = dot_t(t_inv, dw)
        da = -(dot_bt(dmu, u) + dot_bt(dmw, w))
        da = jnp.where(strict, da, 0.0)

        # A = beta ⊙ (K K^T) ⊙ dec_strict
        dkk = da * dec_strict * beta
        dk_h = dot(dkk, kh) + dot_t(dkk, kh)
        dbeta_h = jnp.sum(da * kk * dec_strict, 1, keepdims=True)
        dGd = dGd + da * (kk * dec_strict * beta)  # = da ⊙ A

        dv_h = beta * dmu
        dbeta_h = dbeta_h + jnp.sum(dmu * vh, 1, keepdims=True)
        dk_h = dk_h + (beta * eg) * dmw
        dbeta_h = dbeta_h + jnp.sum(dmw * (eg * kh), 1, keepdims=True)
        dg_h = jnp.sum(dmw * ((beta * eg) * kh), 1, keepdims=True)

        # intra attention scores
        dq_h = dqdec * eg + dot(dqk, kh)
        dk_h = dk_h + dot_t(dqk, qh)

        # kc = k e^{gl - G}
        dk_h = dk_h + dkc * jnp.exp(glast - gc)
        dg_h = dg_h - jnp.sum(dkc * kc, 1, keepdims=True)
        dgl = dgl + jnp.sum(dkc * kc)

        # qdec = q e^G
        dg_h = dg_h + jnp.sum(dqdec * qdec, 1, keepdims=True)

        # pairwise exp(G_i - G_j) terms: +rows, -cols; gl lands on G[C-1].
        # The column sum rides the MXU as dGd^T @ 1 — a [C] reduce +
        # reshape would need a cross-lane relayout in Mosaic.
        ones_c = jnp.ones((c, 1), f32)
        dg_h = (
            dg_h + jnp.sum(dGd, 1, keepdims=True) - dot_t(dGd, ones_c)
        )
        dg_h = dg_h + jnp.where(rowpos == c - 1, dgl, 0.0)

        dq_ref[0, 0, :, hi * dk : (hi + 1) * dk] = dq_h
        dk_ref[0, 0, :, hi * dk : (hi + 1) * dk] = dk_h
        dv_ref[0, 0, :, hi * dv : (hi + 1) * dv] = dv_h
        dg_cols.append(dg_h)
        dbeta_cols.append(dbeta_h)
        ds_ref[hi * dk : (hi + 1) * dk, :] = ds_in

    dg_ref[0, 0] = jnp.concatenate(dg_cols, axis=1)
    dbeta_ref[0, 0] = jnp.concatenate(dbeta_cols, axis=1)

    @pl.when(pl.program_id(1) == n - 1)
    def _final():
        ds0_ref[0] = ds_ref[...]


def _delta_bwd_impl(
    q, k, v, g, beta, s0, states4, do, ds, chunk_size, use_qk_l2norm
):
    """Fused backward dispatch. Differentiates the L2 norm and the
    within-chunk cumsum outside the kernel (elementwise XLA); the kernel
    emits cotangents w.r.t. the normed q/k and the inclusive cumsum G."""
    from ..ops.delta_rule import l2norm
    from ..ops.mhla_chunk import _pad_to_chunks

    b, t, h, dk = q.shape
    dv = v.shape[-1]
    c = chunk_size
    f32 = jnp.float32
    qf, kf = q.astype(f32), k.astype(f32)
    if use_qk_l2norm:
        qn, q_vjp = jax.vjp(l2norm, qf)
        kn, k_vjp = jax.vjp(l2norm, kf)
    else:
        qn, kn = qf, kf

    qp = _pad_to_chunks(qn, c)
    kp = _pad_to_chunks(kn, c)
    vp = _pad_to_chunks(v.astype(f32), c)
    gp = _pad_to_chunks(g.astype(f32), c)
    bp = _pad_to_chunks(beta.astype(f32), c)
    dop = _pad_to_chunks(do.astype(f32), c)
    n = qp.shape[1] // c

    q4 = qp.reshape(b, n, c, h * dk)
    k4 = kp.reshape(b, n, c, h * dk)
    v4 = vp.reshape(b, n, c, h * dv)
    do4 = dop.reshape(b, n, c, h * dv)
    gc4 = jnp.cumsum(gp.reshape(b, n, c, h), axis=2)
    beta4 = bp.reshape(b, n, c, h)
    dsf = ds.astype(f32).reshape(b, h * dk, dv)

    rev = lambda bi, ni: (bi, n - 1 - ni, 0, 0)  # noqa: E731
    tok = lambda d: pl.BlockSpec((1, 1, c, h * d), rev)  # noqa: E731
    small = pl.BlockSpec((1, 1, c, h), rev)
    state = pl.BlockSpec((1, h * dk, dv), lambda bi, ni: (bi, 0, 0))
    st4 = pl.BlockSpec((1, 1, h * dk, dv), rev)
    scale = dk**-0.5
    dq4, dk4, dv4, dg4, dbeta4, ds0 = pl.pallas_call(
        functools.partial(_delta_bwd_kernel, h, dk, dv, c, scale, n),
        grid=(b, n),
        in_specs=[
            tok(dk), tok(dk), tok(dv), small, small, st4, tok(dv), state,
        ],
        out_specs=(tok(dk), tok(dk), tok(dv), small, small, state),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, c, h * dk), f32),
            jax.ShapeDtypeStruct((b, n, c, h * dk), f32),
            jax.ShapeDtypeStruct((b, n, c, h * dv), f32),
            jax.ShapeDtypeStruct((b, n, c, h), f32),
            jax.ShapeDtypeStruct((b, n, c, h), f32),
            jax.ShapeDtypeStruct((b, h * dk, dv), f32),
        ),
        scratch_shapes=[pltpu.VMEM((h * dk, dv), f32)],
        cost_estimate=pl.CostEstimate(
            flops=6 * b * h * n * c * (3 * c * (dk + dv) // 2 + 3 * dk * dv),
            bytes_accessed=(2 * q4.size + 2 * k4.size + 4 * v4.size)
            * q4.dtype.itemsize,
            transcendentals=3 * b * h * n * c * c,
        ),
        interpret=_interpret(),
    )(q4, k4, v4, gc4, beta4, states4, do4, dsf)

    # G = within-chunk inclusive cumsum(g)  =>  dg_t = sum_{t' >= t} dG_t'
    dgc = jnp.flip(jnp.cumsum(jnp.flip(dg4, 2), axis=2), 2)

    def unpad(x4, d):
        return x4.reshape(b, n * c, h, d)[:, :t]

    dqn = unpad(dq4, dk)
    dkn = unpad(dk4, dk)
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


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(6, 7, 8)
)
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
    the fused sequential-grid Pallas forward on TPU (falls back to the jnp
    op elsewhere)."""
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
