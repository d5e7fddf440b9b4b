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

The backward recomputes through the jnp op (``jax.vjp`` of the chunked
form): the delta-rule reverse scan is as sequential as the forward, and
training uses of this family are secondary to MHLA — the fused forward is
what inference/prefill and evals ride.

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


def _delta_kernel(
    nh, dk, dv, c, scale,
    q_ref, k_ref, v_ref, gc_ref, beta_ref, s0_ref,
    o_ref, sout_ref, s_ref,
):
    f32 = jnp.float32

    @pl.when(pl.program_id(1) == 0)
    def _init():
        s_ref[...] = s0_ref[0]

    idx_r = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    idx_c = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    strict = idx_r > idx_c
    incl = idx_r >= idx_c
    eye = jnp.eye(c, dtype=f32)
    steps = max((c - 1).bit_length() - 1, 0)

    for hi in range(nh):
        qh = _hslice(q_ref[0, 0], hi, dk).astype(f32)
        kh = _hslice(k_ref[0, 0], hi, dk).astype(f32)
        vh = _hslice(v_ref[0, 0], hi, dv).astype(f32)
        gc = gc_ref[0, 0, :, hi : hi + 1].astype(f32)  # [C, 1]
        beta = beta_ref[0, 0, :, hi : hi + 1].astype(f32)
        glast = gc[c - 1, 0]

        # pairwise decay exp(G_i - G_j), masked (differences <= 0: stable)
        gd = gc - gc.reshape(1, c)
        dec_strict = jnp.where(strict, jnp.exp(gd), 0.0)
        dec_incl = jnp.where(incl, jnp.exp(gd), 0.0)

        a = jax.lax.dot_general(
            kh, kh, (((1,), (1,)), ((), ())), preferred_element_type=f32
        ) * dec_strict * beta
        # (I + A)^-1 for nilpotent A: product of log2(C) squarings
        x = -a
        t_inv = eye + x
        for _ in range(steps):
            x = jnp.dot(x, x, preferred_element_type=f32)
            t_inv = jnp.dot(t_inv, eye + x, preferred_element_type=f32)

        u = jnp.dot(t_inv, beta * vh, preferred_element_type=f32)
        w = jnp.dot(t_inv, (beta * jnp.exp(gc)) * kh, preferred_element_type=f32)

        s_h = s_ref[hi * dk : (hi + 1) * dk, :]  # [Dk, Dv] fp32
        v_eff = u - jnp.dot(w, s_h, preferred_element_type=f32)

        qk = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=f32
        ) * dec_incl
        o = (
            jnp.dot(qh * jnp.exp(gc), s_h, preferred_element_type=f32)
            + jnp.dot(qk, v_eff, preferred_element_type=f32)
        ) * scale
        o_ref[0, 0, :, hi * dv : (hi + 1) * dv] = o.astype(o_ref.dtype)

        kc = kh * jnp.exp(glast - gc)
        s_new = s_h * jnp.exp(glast) + jax.lax.dot_general(
            kc, v_eff, (((0,), (0,)), ((), ())), preferred_element_type=f32
        )
        s_ref[hi * dk : (hi + 1) * dk, :] = s_new
    sout_ref[0] = s_ref[...]


def _delta_fused_fwd_impl(q, k, v, g, beta, s0, chunk_size, use_qk_l2norm):
    """Padded/shaped Pallas dispatch. q/k/v: [B, T, H, D]; g/beta [B, T, H];
    s0 [B, H, Dk, Dv] fp32. Returns (o [B, T, H, Dv], s_final)."""
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
    o4, s_out = pl.pallas_call(
        functools.partial(_delta_kernel, h, dk, dv, c, scale),
        grid=(b, n),
        in_specs=[tok(dk), tok(dk), tok(dv), small, small, state],
        out_specs=(tok(dv), state),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, c, h * dv), in_dtype),
            jax.ShapeDtypeStruct((b, h * dk, dv), f32),
        ),
        scratch_shapes=[pltpu.VMEM((h * dk, dv), f32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * n * c * (3 * c * (dk + dv) // 2 + 3 * dk * dv),
            bytes_accessed=(q4.size + k4.size + 2 * v4.size)
            * q4.dtype.itemsize,
            transcendentals=b * h * n * c * c,
        ),
        interpret=_interpret(),
    )(q4, k4, v4, gc4, beta4, s0f)
    o = o4.reshape(b, n * c, h, dv)[:, :t]
    return o, s_out.reshape(b, h, dk, dv)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(6, 7, 8)
)
def _delta_fused(q, k, v, g, beta, s0, chunk_size, output_final_state,
                 use_qk_l2norm):
    o, s = _delta_fused_fwd_impl(q, k, v, g, beta, s0, chunk_size, use_qk_l2norm)
    return o, (s if output_final_state else jnp.zeros_like(s))


def _delta_fused_fwd(q, k, v, g, beta, s0, chunk_size, output_final_state,
                     use_qk_l2norm):
    out = _delta_fused(
        q, k, v, g, beta, s0, chunk_size, output_final_state, use_qk_l2norm
    )
    return out, (q, k, v, g, beta, s0)


def _delta_fused_bwd(chunk_size, output_final_state, use_qk_l2norm, res, do):
    """Backward recomputes through the jnp chunked op (the delta reverse
    scan is as sequential as the forward; training of this secondary family
    rides the oracle-exact jnp path)."""
    from ..ops.delta_rule import gated_delta_chunk

    q, k, v, g, beta, s0 = res

    def f(q, k, v, g, beta, s0):
        o, s = gated_delta_chunk(
            q, k, v, g, beta, initial_state=s0, chunk_size=chunk_size,
            output_final_state=True, use_qk_l2norm=use_qk_l2norm,
        )
        return o, (s if output_final_state else jnp.zeros_like(s))

    _, vjp = jax.vjp(f, q, k, v, g, beta, s0)
    return vjp(do)


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
