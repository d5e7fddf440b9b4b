"""Fused Pallas path for non-causal blockwise MHLA (vision / video).

The blockwise op (``mhla_tpu.ops.mhla_blockwise``) is three phases:

  A. per-block states   kv_j = k_j^T v_j                (Pallas, shared
                        with the causal kernel's phase A)
  B. dense block mixing kv~ = M @ kv                    (Pallas; [N, N]
                        VMEM-resident, rank-3 dot keeps the tiling)
  C. readout            o_i = q_i @ kv~_i               (Pallas supertile:
                        G blocks of rows share one grid cell so every MXU
                        dot is [G*C, Dk] x [Dk, Dv] instead of a 150-row
                        weight-reload-bound matmul)

The jnp einsum formulation ("bnchk,bnchv->bnhkv" etc.) makes XLA
materialize head-major relayouts of every 100 MB stream at the 31.5k-token
video scale — the fused path stays in the projection-natural head-flat
[B, N, C, H*D] layout end to end. The optional mixed normalizer
(``normalize_out``; reference quirk documented in ops/mhla_blockwise.py)
stays in jnp but is reformulated as an elementwise multiply + minor-dim
segment reduce, which XLA fuses without relayout.

Reference semantics: ``mhla_videogen/.../wan/mhla_utils.py:292-366``
(MHLA_Video_Uni), ``mhla_dit/mhla/mhla.py:251-275`` (MHLA4DiT).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .mhla_chunk_pallas import (
    _VMEM_BUDGET_ST,
    _hslice,
    _interpret,
    _mix_pallas,
    _phase_a,
    _use_pallas,
)


# ---------------------------------------------------------------------------
# dense block mixing (full [N, N] matrix — non-causal)
# ---------------------------------------------------------------------------


@jax.custom_vjp
def mix_states_dense(m: jax.Array, states4: jax.Array):
    """``mixed[i] = sum_j m[i, j] states[j]`` for a DENSE [N, N] matrix.

    Same VMEM-resident Pallas kernel as the causal ``mix_states`` with a
    single full band; the rank-3 dot keeps the [Rtile, Dv] minor tiling so
    no relayout reaches HBM."""
    n = m.shape[0]
    if _mix_dense_ok(n, states4.shape[-1]):
        return _mix_pallas(m, states4, lower=True, bands=[(0, n)])
    out = jnp.einsum(
        "ij,bjrd->bird", m, states4, preferred_element_type=jnp.float32
    )
    return out.astype(states4.dtype)


def _mix_dense_ok(n: int, dv: int) -> bool:
    on_tpu = jax.default_backend() == "tpu"
    return (on_tpu or _interpret()) and n >= 8 and dv % 128 == 0


def _mix_dense_fwd(m, states4):
    return mix_states_dense(m, states4), (m, states4)


def _mix_dense_bwd(res, dout):
    m, states4 = res
    dout = dout.astype(states4.dtype)
    n = m.shape[0]
    if _mix_dense_ok(n, states4.shape[-1]):
        dstates = _mix_pallas(m.T, dout, lower=True, bands=[(0, n)])
    else:
        dstates = jnp.einsum(
            "ji,bjrd->bird", m, dout, preferred_element_type=jnp.float32
        ).astype(states4.dtype)
    dm = jnp.einsum(
        "bird,bjrd->ij", dout, states4, preferred_element_type=jnp.float32
    ).astype(m.dtype)
    return dm, dstates


mix_states_dense.defvjp(_mix_dense_fwd, _mix_dense_bwd)


# ---------------------------------------------------------------------------
# phase C — supertile readout (no intra term: non-causal mixing is fully
# in the mixed states)
# ---------------------------------------------------------------------------


def _readout_fwd_kernel(g, c, nh, dk, dv, q_ref, mt_ref, o_ref):
    s = g * c
    rowmask = [
        (jax.lax.broadcasted_iota(jnp.int32, (s, dv), 0) // c) == gg
        for gg in range(g)
    ]
    for hi in range(nh):
        qh = _hslice(q_ref[0, 0], hi, dk)  # [S, Dk]
        o = jnp.zeros((s, dv), jnp.float32)
        for gg in range(g):
            mth = mt_ref[0, gg, hi * dk : (hi + 1) * dk, :]  # [Dk, Dv]
            t = jnp.dot(qh, mth, preferred_element_type=jnp.float32)
            o = o + jnp.where(rowmask[gg], t, 0.0)
        o_ref[0, 0, :, hi * dv : (hi + 1) * dv] = o.astype(o_ref.dtype)


def _readout_bwd_kernel(g, c, nh, dk, dv, q_ref, mt_ref, do_ref, dq_ref, dmt_ref):
    s = g * c
    rowmask_v = [
        (jax.lax.broadcasted_iota(jnp.int32, (s, dv), 0) // c) == gg
        for gg in range(g)
    ]
    rowmask_k = [
        (jax.lax.broadcasted_iota(jnp.int32, (s, dk), 0) // c) == gg
        for gg in range(g)
    ]
    for hi in range(nh):
        qh = _hslice(q_ref[0, 0], hi, dk)
        doh = _hslice(do_ref[0, 0], hi, dv)
        dq = jnp.zeros((s, dk), jnp.float32)
        for gg in range(g):
            mth = mt_ref[0, gg, hi * dk : (hi + 1) * dk, :]
            dog = jnp.where(rowmask_v[gg], doh, 0).astype(doh.dtype)
            dq = dq + jax.lax.dot_general(
                dog, mth, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            qg = jnp.where(rowmask_k[gg], qh, 0).astype(qh.dtype)
            dmt = jax.lax.dot_general(
                qg, doh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dmt_ref[0, gg, hi * dk : (hi + 1) * dk, :] = dmt.astype(
                dmt_ref.dtype
            )
        dq_ref[0, 0, :, hi * dk : (hi + 1) * dk] = dq.astype(dq_ref.dtype)


def _pick_readout_group(n, c, h, dk, dv, nbytes, bwd: bool) -> int:
    for g in (8, 7, 6, 5, 4, 3, 2, 1):
        if n % g:
            continue
        s = g * c
        blocks = (3 if not bwd else 4) * s * h * max(dk, dv) * nbytes
        blocks += (1 if not bwd else 2) * g * h * dk * dv * nbytes
        if 2 * blocks <= _VMEM_BUDGET_ST:
            return g
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _readout(q4, mixed4, g, c, h):
    """o = per-block q @ mixed. q4: [B, NS, S, H*Dk] view, mixed4:
    [B, N, H*Dk, Dv] -> [B, NS, S, H*Dv]."""
    b, ns, s, hdk = q4.shape
    dk = hdk // h
    dv = mixed4.shape[-1]
    nbytes = q4.dtype.itemsize
    return pl.pallas_call(
        functools.partial(_readout_fwd_kernel, g, c, h, dk, dv),
        grid=(b, ns),
        in_specs=[
            pl.BlockSpec((1, 1, s, hdk), lambda bi, ni: (bi, ni, 0, 0)),
            pl.BlockSpec((1, g, hdk, dv), lambda bi, ni: (bi, ni, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, s, h * dv), lambda bi, ni: (bi, ni, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, ns, s, h * dv), q4.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * ns * g * s * dk * dv,
            bytes_accessed=(2 * q4.size + mixed4.size) * nbytes,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(q4, mixed4)


def _readout_fwd(q4, mixed4, g, c, h):
    return _readout(q4, mixed4, g, c, h), (q4, mixed4)


def _readout_bwd(g, c, h, res, do4):
    q4, mixed4 = res
    do4 = do4.astype(q4.dtype)
    b, ns, s, hdk = q4.shape
    dk = hdk // h
    dv = mixed4.shape[-1]
    nbytes = q4.dtype.itemsize
    outs = pl.pallas_call(
        functools.partial(_readout_bwd_kernel, g, c, h, dk, dv),
        grid=(b, ns),
        in_specs=[
            pl.BlockSpec((1, 1, s, hdk), lambda bi, ni: (bi, ni, 0, 0)),
            pl.BlockSpec((1, g, hdk, dv), lambda bi, ni: (bi, ni, 0, 0)),
            pl.BlockSpec((1, 1, s, h * dv), lambda bi, ni: (bi, ni, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, s, hdk), lambda bi, ni: (bi, ni, 0, 0)),
            pl.BlockSpec((1, g, hdk, dv), lambda bi, ni: (bi, ni, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, ns, s, hdk), q4.dtype),
            jax.ShapeDtypeStruct((b, ns * g, hdk, dv), mixed4.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * ns * g * s * dk * dv,
            bytes_accessed=2 * (2 * q4.size + mixed4.size) * nbytes,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(q4, mixed4, do4)
    return outs


_readout.defvjp(_readout_fwd, _readout_bwd)


# ---------------------------------------------------------------------------
# blockify / unblockify — the 3D block rearrange as Pallas kernels, with
# RoPE fused in. XLA's 6D transpose for rearrange_to_blocks_3d plus the
# [B,T,H,D] rope views cost ~4x roofline at the 31.5k video scale (and the
# transpose pair compiles pathologically); here each (f,h,w) block cell is
# one strided DMA and rope is a lane-roll in VMEM. Both ops are LINEAR in
# x, so the backward of blockify(+rope) is exactly unblockify(+rope with
# negated sin) — rotation transpose — and vice versa.
# ---------------------------------------------------------------------------


def _rope_rows(x, cos, sin_signed, nh, dh):
    """Rotate-half on head-flat rows [C, H*Dh]: per head,
    y = x * cos + swap_halves(x) * sin_signed (sin_signed already carries
    the [-sin, +sin] half signs). ``cos``/``sin_signed`` are [C, Dh] —
    every head shares the same angle table, so the tables are Dh wide
    instead of H*Dh (12x less table DMA at the Wan scale)."""
    f32 = jnp.float32
    parts = []
    half = dh // 2
    ch = cos.astype(f32)
    sh = sin_signed.astype(f32)
    for hi in range(nh):
        xh = _hslice(x, hi, dh).astype(f32)
        swapped = jnp.concatenate([xh[:, half:], xh[:, :half]], axis=1)
        parts.append(xh * ch + swapped * sh)
    return jnp.concatenate(parts, axis=1) if nh > 1 else parts[0]


def _tbl_slice(tbl_ref, wi, pw, c, dh):
    return tbl_ref[:, :, wi * pw : (wi + 1) * pw, :].reshape(c, dh)


def _blockify_kernel(nw, pw, c, nh, dh, rope, x_ref, cos_ref, sin_ref, o_ref):
    ft = x_ref.shape[-1]
    x = x_ref[0]  # [pf, ph, W, Ftile]
    for wi in range(nw):
        sub = x[:, :, wi * pw : (wi + 1) * pw, :].reshape(c, ft)
        if rope:
            cos = _tbl_slice(cos_ref, wi, pw, c, dh)
            sin = _tbl_slice(sin_ref, wi, pw, c, dh)
            sub = _rope_rows(sub, cos, sin, nh, dh)
        o_ref[0, wi] = sub.astype(o_ref.dtype)


def _unblockify_kernel(nw, pw, pf, ph, nh, dh, rope, x_ref, cos_ref, sin_ref, o_ref):
    ft = x_ref.shape[-1]
    c = x_ref.shape[-2]
    for wi in range(nw):
        sub = x_ref[0, wi]  # [C, Ftile]
        if rope:
            cos = _tbl_slice(cos_ref, wi, pw, c, dh)
            sin = _tbl_slice(sin_ref, wi, pw, c, dh)
            sub = _rope_rows(sub, cos, sin, nh, dh)
        o_ref[0, :, :, wi * pw : (wi + 1) * pw, :] = sub.reshape(
            pf, ph, pw, ft
        ).astype(o_ref.dtype)


def _block_geometry(grid, layout):
    (fg, hg, wg), (nf, nh_, nw) = grid, layout
    pf, ph, pw = fg // nf, hg // nh_, wg // nw
    return pf, ph, pw, pf * ph * pw, nf * nh_ * nw


_VMEM_BUDGET_BLOCKIFY = 8 * 1024 * 1024  # rope temporaries run fp32 in VMEM


def _ftile_candidates(fdim, dh):
    for ft in (fdim, fdim // 2, fdim // 3, fdim // 4, fdim // 6, fdim // 12, dh):
        if ft > 0 and fdim % ft == 0 and ft % dh == 0:
            yield ft


def _pick_ftile(fdim, dh, cnw, nbytes, rope):
    # tables are [*, Dh] (shared across heads), single fetch per (fi, hi)
    fixed = 2 * 2 * cnw * dh * nbytes if rope else 0
    for ft in _ftile_candidates(fdim, dh):
        work = 2 * cnw * ft * nbytes * 2 + (2 * cnw * ft * 4 if rope else 0)
        if work + fixed <= _VMEM_BUDGET_BLOCKIFY:
            return ft
    return dh


def _blockify_pallas(x, grid, layout, tables, num_heads, inverse: bool):
    """x: flat [B, T, F] (inverse=False) or blocked [B, N, C, F]
    (inverse=True). tables: optional (cos_flat, sin_signed_flat) [T, F].

    Each grid cell covers one (f-block, h-block) stripe spanning the FULL
    W axis (Mosaic's second-minor block rule) and a tile of the feature
    axis; the nw w-blocks are split/merged in VMEM."""
    (fg, hg, wg), (nf, nh_, nw) = grid, layout
    pf, ph, pw, c, n = _block_geometry(grid, layout)
    b = x.shape[0]
    fdim = x.shape[-1]
    dh = fdim // num_heads
    rope = tables is not None
    ft = _pick_ftile(fdim, dh, c * nw, x.dtype.itemsize, rope)
    nh_t = ft // dh  # heads per feature tile
    cos, sin = tables if rope else (
        jnp.zeros((1, 1, 1, dh), x.dtype),
        jnp.zeros((1, 1, 1, dh), x.dtype),
    )
    if rope:
        cos = cos.reshape(fg, hg, wg, dh).astype(x.dtype)
        sin = sin.reshape(fg, hg, wg, dh).astype(x.dtype)
    # tables are per-head [*, Dh] (all heads share the angles); the index
    # map ignores ki, so with ki the innermost grid axis Mosaic fetches the
    # block once per (fi, hi) stripe instead of once per feature tile
    tbl_spec = pl.BlockSpec(
        (pf, ph, wg, dh) if rope else (1, 1, 1, dh),
        (lambda bi, fi, hi, ki: (fi, hi, 0, 0))
        if rope
        else (lambda bi, fi, hi, ki: (0, 0, 0, 0)),
    )
    stripe = pl.BlockSpec(
        (1, pf, ph, wg, ft), lambda bi, fi, hi, ki: (bi, fi, hi, 0, ki)
    )
    blocked = pl.BlockSpec(
        (1, nw, c, ft), lambda bi, fi, hi, ki: (bi, fi * nh_ + hi, 0, ki)
    )
    if not inverse:
        kern = functools.partial(_blockify_kernel, nw, pw, c, nh_t, dh, rope)
        in_specs = [stripe, tbl_spec, tbl_spec]
        out_spec, out_shape = blocked, (b, n, c, fdim)
        xv = x.reshape(b, fg, hg, wg, fdim)
    else:
        kern = functools.partial(
            _unblockify_kernel, nw, pw, pf, ph, nh_t, dh, rope
        )
        in_specs = [blocked, tbl_spec, tbl_spec]
        out_spec, out_shape = stripe, (b, fg, hg, wg, fdim)
        xv = x
    out = pl.pallas_call(
        kern,
        grid=(b, nf, nh_, fdim // ft),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * x.size if rope else 0,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(xv, cos, sin)
    if inverse:
        out = out.reshape(b, fg * hg * wg, fdim)
    return out


def _neg_sin(tables):
    if tables is None:
        return None
    cos, sin = tables
    return cos, -sin


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def blockify(x, tables, grid, layout, num_heads):
    """Flat [B, T, F] -> blocked [B, N, C, F], with rotate-half RoPE fused
    when ``tables = (cos_flat, sin_signed_flat)`` is given ([T, F], the
    per-head cos tiled across heads and sin carrying [-,+] half signs)."""
    return _blockify_pallas(x, grid, layout, tables, num_heads, inverse=False)


def _blockify_fwd(x, tables, grid, layout, num_heads):
    return blockify(x, tables, grid, layout, num_heads), tables


def _blockify_bwd(grid, layout, num_heads, tables, dout):
    dx = _blockify_pallas(
        dout, grid, layout, _neg_sin(tables), num_heads, inverse=True
    )
    dtab = None if tables is None else jax.tree.map(jnp.zeros_like, tables)
    return dx, dtab


blockify.defvjp(_blockify_fwd, _blockify_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def unblockify(xb, tables, grid, layout, num_heads):
    """Blocked [B, N, C, F] -> flat [B, T, F] (inverse permutation), with
    optional fused RoPE applied in flat token order."""
    return _blockify_pallas(xb, grid, layout, tables, num_heads, inverse=True)


def _unblockify_fwd(xb, tables, grid, layout, num_heads):
    return unblockify(xb, tables, grid, layout, num_heads), tables


def _unblockify_bwd(grid, layout, num_heads, tables, dout):
    dxb = _blockify_pallas(
        dout, grid, layout, _neg_sin(tables), num_heads, inverse=False
    )
    dtab = None if tables is None else jax.tree.map(jnp.zeros_like, tables)
    return dxb, dtab


unblockify.defvjp(_unblockify_fwd, _unblockify_bwd)


def rope_tables_flat(
    grid,
    head_dim: int,
    num_heads: int,
    dtype=jnp.float32,
    theta: float = 10000.0,
    max_pos: int = 1024,
):
    """(cos_flat, sin_signed_flat) [T, Dh] for the fused blockify rope:
    rotate-half as y = x*cos + swap_halves(x)*sin_signed. All heads share
    the same angle table, so the tables are Dh wide (``num_heads`` is kept
    in the signature for call-site clarity but does not affect shapes)."""
    del num_heads
    from ..ops.rotary import rope_angles_3d

    ang = jnp.asarray(
        rope_angles_3d(grid, head_dim, theta, max_pos), jnp.float32
    )  # [T, Dh/2]
    cos = jnp.cos(ang)
    sin = jnp.sin(ang)
    cos_h = jnp.concatenate([cos, cos], axis=-1)  # [T, Dh]
    sin_h = jnp.concatenate([-sin, sin], axis=-1)
    return cos_h.astype(dtype), sin_h.astype(dtype)


# ---------------------------------------------------------------------------
# fused attention-island prologue / epilogue
#
# The reference's fp32 attention island (mhla_utils.py:308) casts q/k/v to
# float and runs RMSNorm -> relu(+eps) -> RoPE -> block rearrange as separate
# torch ops. Composed the same way here, each step is a full ~193 MB HBM
# stream at the 31.5k-token fp32 scale (cast w, norm r+w, blockify r+w per
# input). ``blockify_island`` fuses the whole prologue into the blockify
# Pallas pass: read the projection output ONCE in its native (bf16) dtype,
# do norm/relu/rope in fp32 VMEM, write the blocked island-dtype tensor —
# and optionally emit the no-RoPE copy the normalizer needs from the same
# read. ``unblockify_island`` is the mirrored epilogue (per-head RMSNorm +
# output cast fused into the inverse rearrange).
# ---------------------------------------------------------------------------


def _island_kernel(
    nw, pw, c, nh, dh, rope, use_norm, relu_eps, mid_dtype,
    x_ref, inv_ref, g_ref, cos_ref, sin_ref, *o_refs,
):
    ft = x_ref.shape[-1]
    f32 = jnp.float32
    x = x_ref[0]  # [pf, ph, W, Ftile]
    o_ref = o_refs[0]
    nope_ref = o_refs[1] if len(o_refs) > 1 else None
    for wi in range(nw):
        sub = x[:, :, wi * pw : (wi + 1) * pw, :].reshape(c, ft).astype(f32)
        if use_norm:
            inv = (
                inv_ref[0][:, :, wi * pw : (wi + 1) * pw, :]
                .reshape(c, 1)
                .astype(f32)
            )
            sub = sub * inv * g_ref[0].astype(f32)[None, :]
            if mid_dtype is not None:
                # replicate the composed path's rounding between ops so the
                # bf16 island matches the unfused semantics bit-for-bit
                sub = sub.astype(mid_dtype).astype(f32)
        if relu_eps is not None:
            sub = jnp.maximum(sub, 0.0) + relu_eps
            if mid_dtype is not None:
                sub = sub.astype(mid_dtype).astype(f32)
        if nope_ref is not None:
            nope_ref[0, wi] = sub.astype(nope_ref.dtype)
        if rope:
            cos = _tbl_slice(cos_ref, wi, pw, c, dh)
            sin = _tbl_slice(sin_ref, wi, pw, c, dh)
            sub = _rope_rows(sub, cos, sin, nh, dh)
        o_ref[0, wi] = sub.astype(o_ref.dtype)


def _pick_ftile_island(fdim, dh, c, nw, xbytes, obytes, nout, rope):
    cnw = c * nw
    fixed = 2 * cnw * 4 + (2 * 2 * cnw * dh * 4 if rope else 0)  # inv + tables
    for ft in _ftile_candidates(fdim, dh):
        # double-buffered in/out blocks + fp32 per-w-block temporaries
        work = 2 * cnw * ft * (xbytes + nout * obytes) + 4 * c * ft * 4
        if work + fixed <= _VMEM_BUDGET_BLOCKIFY:
            return ft
    return dh


def _island_pallas(x, inv, gamma, tables, grid, layout, num_heads,
                   relu_eps, mid_dtype, out_dtype, emit_nope):
    (fg, hg, wg), (nf, nh_, nw) = grid, layout
    pf, ph, pw, c, n = _block_geometry(grid, layout)
    b = x.shape[0]
    fdim = x.shape[-1]
    dh = fdim // num_heads
    rope = tables is not None
    use_norm = gamma is not None
    nout = 2 if emit_nope else 1
    ft = _pick_ftile_island(
        fdim, dh, c, nw, x.dtype.itemsize, jnp.dtype(out_dtype).itemsize,
        nout, rope,
    )
    nh_t = ft // dh

    if rope:
        cos, sin = (t.reshape(fg, hg, wg, dh).astype(jnp.float32) for t in tables)
    else:
        cos = sin = jnp.zeros((1, 1, 1, dh), jnp.float32)
    if use_norm:
        inv5 = inv.reshape(b, fg, hg, wg, 1)
        g2 = gamma.reshape(1, fdim).astype(jnp.float32)
    else:
        inv5 = jnp.ones((1, 1, 1, 1, 1), jnp.float32)
        g2 = jnp.ones((1, fdim), jnp.float32)

    stripe = pl.BlockSpec(
        (1, pf, ph, wg, ft), lambda bi, fi, hi, ki: (bi, fi, hi, 0, ki)
    )
    inv_spec = pl.BlockSpec(
        (1, pf, ph, wg, 1) if use_norm else (1, 1, 1, 1, 1),
        (lambda bi, fi, hi, ki: (bi, fi, hi, 0, 0))
        if use_norm
        else (lambda bi, fi, hi, ki: (0, 0, 0, 0, 0)),
    )
    g_spec = pl.BlockSpec((1, ft), lambda bi, fi, hi, ki: (0, ki))
    tbl_spec = pl.BlockSpec(
        (pf, ph, wg, dh) if rope else (1, 1, 1, dh),
        (lambda bi, fi, hi, ki: (fi, hi, 0, 0))
        if rope
        else (lambda bi, fi, hi, ki: (0, 0, 0, 0)),
    )
    blocked = pl.BlockSpec(
        (1, nw, c, ft), lambda bi, fi, hi, ki: (bi, fi * nh_ + hi, 0, ki)
    )
    out_shape = [jax.ShapeDtypeStruct((b, n, c, fdim), out_dtype)] * nout
    outs = pl.pallas_call(
        functools.partial(
            _island_kernel, nw, pw, c, nh_t, dh, rope, use_norm,
            relu_eps, mid_dtype,
        ),
        grid=(b, nf, nh_, fdim // ft),
        in_specs=[stripe, inv_spec, g_spec, tbl_spec, tbl_spec],
        out_specs=tuple([blocked] * nout),
        out_shape=tuple(out_shape),
        cost_estimate=pl.CostEstimate(
            flops=8 * x.size,
            bytes_accessed=x.size * x.dtype.itemsize
            + nout * x.size * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(x.reshape(b, fg, hg, wg, fdim), inv5, g2, cos, sin)
    return outs if emit_nope else (outs[0], None)


def _island_inv(x, gamma, norm_eps, mid_dtype):
    """Per-token inverse RMS [B, T] fp32 (stats pass; XLA fuses it into the
    producing projection's epilogue where possible)."""
    if gamma is None:
        return None
    f32 = jnp.float32
    xf = x.astype(mid_dtype).astype(f32) if mid_dtype is not None else x.astype(f32)
    return jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1) + norm_eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10))
def blockify_island(
    x, tables, gamma, grid, layout, num_heads,
    norm_eps=1e-6, relu_eps=None, mid_dtype=None, out_dtype=jnp.float32,
    emit_nope=False,
):
    """Fused island prologue: flat [B, T, F] (native dtype) ->
    ``(blocked_rope, blocked_nope | None)`` in ``out_dtype``, applying
    full-dim RMSNorm (``gamma`` [F], fp32 stats), ``relu(x) + relu_eps``,
    and rotate-half RoPE (``tables`` = [T, Dh] cos / sin_signed) inside the
    blockify pass. ``mid_dtype`` (e.g. bf16) reproduces the composed path's
    rounding between ops; None keeps full fp32 through the chain.
    ``emit_nope`` additionally returns the post-relu, pre-RoPE copy the
    blockwise normalizer consumes — from the same single read of ``x``.

    Replaces cast -> RMSNorm -> relu -> blockify (4-6 full HBM streams per
    input at the 31.5k-token fp32 island) with one stats pass over the
    native-dtype input plus one fused Pallas pass.
    """
    inv = _island_inv(x, gamma, norm_eps, mid_dtype)
    return _island_pallas(
        x, inv, gamma, tables, grid, layout, num_heads,
        relu_eps, mid_dtype, out_dtype, emit_nope,
    )


def _blockify_island_fwd(x, tables, gamma, grid, layout, num_heads,
                         norm_eps, relu_eps, mid_dtype, out_dtype, emit_nope):
    out = blockify_island(
        x, tables, gamma, grid, layout, num_heads,
        norm_eps, relu_eps, mid_dtype, out_dtype, emit_nope,
    )
    return out, (x, tables, gamma)


def _blockify_island_bwd(grid, layout, num_heads, norm_eps, relu_eps,
                         mid_dtype, out_dtype, emit_nope, res, dout):
    x, tables, gamma = res
    f32 = jnp.float32
    dy, dnope = dout
    # transpose of (rope o blockify): unblockify with negated sin
    dr = _blockify_pallas(
        dy.astype(f32), grid, layout, _neg_sin(tables), num_heads, inverse=True
    )
    if dnope is not None:
        dr = dr + _blockify_pallas(
            dnope.astype(f32), grid, layout, None, num_heads, inverse=True
        )
    xf = x.astype(mid_dtype).astype(f32) if mid_dtype is not None else x.astype(f32)
    if gamma is not None:
        inv = jax.lax.rsqrt(
            jnp.mean(xf * xf, axis=-1, keepdims=True) + norm_eps
        )
        gf = gamma.astype(f32)
        xn = xf * inv * gf
    else:
        inv, gf, xn = None, None, xf
    dxn = jnp.where(xn > 0, dr, 0.0) if relu_eps is not None else dr
    dgamma = None
    if gamma is not None:
        dgamma = jnp.sum(dxn * xf * inv, axis=tuple(range(x.ndim - 1))).astype(
            gamma.dtype
        )
        u = dxn * gf
        fdim = x.shape[-1]
        dx = inv * u - xf * (inv**3 / fdim) * jnp.sum(
            u * xf, axis=-1, keepdims=True
        )
    else:
        dx = dxn
    dtab = None if tables is None else jax.tree.map(jnp.zeros_like, tables)
    return dx.astype(x.dtype), dtab, dgamma


blockify_island.defvjp(_blockify_island_fwd, _blockify_island_bwd)


def _unisland_kernel(
    nw, pw, pf, ph, nh, dh, eps, mid_dtype, x_ref, g_ref, o_ref
):
    ft = x_ref.shape[-1]
    c = x_ref.shape[-2]
    f32 = jnp.float32
    gh = g_ref[0].astype(f32)[None, :]  # [1, Dh] shared across heads
    for wi in range(nw):
        sub = x_ref[0, wi].astype(f32)  # [C, Ftile]
        if mid_dtype is not None:
            sub = sub.astype(mid_dtype).astype(f32)
        parts = []
        for hi in range(nh):
            xh = _hslice(sub, hi, dh)
            ss = jnp.sum(xh * xh, axis=1, keepdims=True) / dh
            parts.append(xh * jax.lax.rsqrt(ss + eps) * gh)
        y = jnp.concatenate(parts, axis=1) if nh > 1 else parts[0]
        o_ref[0, :, :, wi * pw : (wi + 1) * pw, :] = y.reshape(
            pf, ph, pw, ft
        ).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def unblockify_island(
    xb, gamma_head, grid, layout, num_heads,
    norm_eps=1e-6, mid_dtype=None, out_dtype=jnp.float32,
):
    """Fused island epilogue: blocked [B, N, C, F] -> flat [B, T, F]
    ``out_dtype``, with the per-head RMSNorm (``gamma_head`` [Dh], the
    reference's g_norm) applied in VMEM. Per-(token, head) norms commute
    with the block permutation, so norm-in-blocked-order == norm-then-
    unblockify. ``mid_dtype`` reproduces the composed path's rounding
    (unblockify -> cast -> norm) when the island runs wider than the model
    dtype. Replaces unblockify + cast + rms_norm_heads_flat (~5 streams)
    with one pass."""
    (fg, hg, wg), (nf, nh_, nw) = grid, layout
    pf, ph, pw, c, n = _block_geometry(grid, layout)
    b = xb.shape[0]
    fdim = xb.shape[-1]
    dh = fdim // num_heads
    ft = _pick_ftile_island(
        fdim, dh, c, nw, xb.dtype.itemsize, jnp.dtype(out_dtype).itemsize,
        1, rope=False,
    )
    nh_t = ft // dh
    g2 = gamma_head.reshape(1, dh).astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(
            _unisland_kernel, nw, pw, pf, ph, nh_t, dh, norm_eps, mid_dtype
        ),
        grid=(b, nf, nh_, fdim // ft),
        in_specs=[
            pl.BlockSpec(
                (1, nw, c, ft), lambda bi, fi, hi, ki: (bi, fi * nh_ + hi, 0, ki)
            ),
            pl.BlockSpec((1, dh), lambda bi, fi, hi, ki: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, pf, ph, wg, ft), lambda bi, fi, hi, ki: (bi, fi, hi, 0, ki)
        ),
        out_shape=jax.ShapeDtypeStruct((b, fg, hg, wg, fdim), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=6 * xb.size,
            bytes_accessed=xb.size * xb.dtype.itemsize
            + xb.size * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(xb, g2)
    return out.reshape(b, fg * hg * wg, fdim)


def _unblockify_island_fwd(xb, gamma_head, grid, layout, num_heads,
                           norm_eps, mid_dtype, out_dtype):
    out = unblockify_island(
        xb, gamma_head, grid, layout, num_heads, norm_eps, mid_dtype, out_dtype
    )
    return out, (xb, gamma_head)


def _unblockify_island_bwd(grid, layout, num_heads, norm_eps, mid_dtype,
                           out_dtype, res, dy):
    xb, gamma_head = res
    f32 = jnp.float32
    fdim = xb.shape[-1]
    dh = fdim // num_heads
    # transpose of the permutation, then the per-head norm vjp in blocked
    # layout (segment matmuls keep the head reductions relayout-free)
    dyb = _blockify_pallas(
        dy.astype(f32), grid, layout, None, num_heads, inverse=False
    )
    xf = (
        xb.astype(mid_dtype).astype(f32)
        if mid_dtype is not None
        else xb.astype(f32)
    )
    seg = (
        jnp.arange(fdim)[:, None] // dh
        == jnp.arange(num_heads)[None, :]
    ).astype(f32)  # [F, H]
    ss = jnp.einsum("bncf,fh->bnch", xf * xf, seg) / dh
    inv = jax.lax.rsqrt(ss + norm_eps)
    inv_f = jnp.einsum("bnch,fh->bncf", inv, seg)
    gf = jnp.tile(gamma_head.astype(f32), num_heads)
    u = dyb * gf
    dot = jnp.einsum("bncf,fh->bnch", u * xf, seg) / dh
    dxb = inv_f * u - xf * inv_f**3 * jnp.einsum("bnch,fh->bncf", dot, seg)
    ph_map = (
        jnp.arange(fdim)[:, None] % dh == jnp.arange(dh)[None, :]
    ).astype(f32)  # [F, Dh]
    dgamma = jnp.einsum("bncf,fd->d", dyb * xf * inv_f, ph_map).astype(
        gamma_head.dtype
    )
    return dxb.astype(xb.dtype), dgamma


unblockify_island.defvjp(_unblockify_island_fwd, _unblockify_island_bwd)


def rms_norm_heads_flat(x, scale, num_heads: int, eps: float = 1e-6):
    """Per-head RMSNorm on head-flat [B, T, H*Dh] WITHOUT a [B,T,H,Dh]
    relayout: the per-head sum-of-squares rides through two skinny matmuls
    against a 0/1 head-segment matrix (MXU, tiling preserved)."""
    f32 = jnp.float32
    fdim = x.shape[-1]
    dh = fdim // num_heads
    seg = (
        jnp.arange(fdim)[:, None] // dh == jnp.arange(num_heads)[None, :]
    ).astype(f32)  # [F, H]
    ss = jnp.einsum(
        "btf,fh->bth", x.astype(f32) ** 2, seg, preferred_element_type=f32
    )
    inv = jax.lax.rsqrt(ss / dh + eps)
    inv_flat = jnp.einsum(
        "bth,fh->btf", inv, seg, preferred_element_type=f32
    )
    return (x.astype(f32) * inv_flat * jnp.tile(scale, num_heads)).astype(
        x.dtype
    )


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------


def mhla_blockwise_fused(
    q4: jax.Array,  # [B, N, C, H*Dk]  (head-flat, positive features)
    k4: jax.Array,
    v4: jax.Array,
    mixing_matrix: jax.Array,  # [N, N] fp32
    num_heads: int,
    q_nope4: Optional[jax.Array] = None,
    k_nope4: Optional[jax.Array] = None,
    normalize: bool = True,
    eps: float = 1e-6,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """Blockwise non-causal MHLA on head-flat [B, N, C, H*D] tensors.

    Drop-in for :func:`mhla_tpu.ops.mhla_blockwise.mhla_blockwise_mh`
    modulo layout (callers keep the projection-natural flat layout).
    Falls back to the einsum op off-TPU or for Mosaic-incompatible dims.
    """
    b, n, c, hdk = q4.shape
    h = num_heads
    dk = hdk // h
    dv = v4.shape[-1] // h
    f32 = jnp.float32
    in_dtype = q4.dtype
    cdt = compute_dtype or f32

    if not _use_pallas(8, dk, dv):  # c handled natively; dims must tile
        from ..ops.mhla_blockwise import mhla_blockwise_mh

        out5 = mhla_blockwise_mh(
            q4.reshape(b, n, c, h, dk),
            k4.reshape(b, n, c, h, dk),
            v4.reshape(b, n, c, h, dv),
            mixing_matrix,
            q_nope=None if q_nope4 is None else q_nope4.reshape(b, n, c, h, dk),
            k_nope=None if k_nope4 is None else k_nope4.reshape(b, n, c, h, dk),
            normalize=normalize,
            eps=eps,
            compute_dtype=compute_dtype,
        )
        return out5.reshape(b, n, c, h * dv)

    q4 = q4.astype(cdt)
    k4 = k4.astype(cdt)
    v4 = v4.astype(cdt)
    m = mixing_matrix.astype(cdt)

    kv = _phase_a(k4, v4, h)  # [B, N, H*Dk, Dv]
    mixed = mix_states_dense(m, kv)

    g = _pick_readout_group(n, c, h, dk, dv, q4.dtype.itemsize, bwd=True)
    ns = n // g
    qs = q4.reshape(b, ns, g * c, hdk)
    out = _readout(qs, mixed, g, c, h).reshape(b, n, c, h * dv)

    if normalize:
        qn = q4 if q_nope4 is None else q_nope4.astype(cdt)
        kn = k4 if k_nope4 is None else k_nope4.astype(cdt)
        # reference quirk: z_i = sum_j M[i,j] (q_j @ ksum_j) — the mixing
        # applies to the per-block scalar field indexed by the QUERY's own
        # block (see ops/mhla_blockwise.py docstring). Elementwise multiply
        # + minor-dim segment reduce: no relayout.
        ksum = jnp.sum(kn.astype(f32), axis=2)  # [B, N, H*Dk]
        sz = (qn.astype(f32) * ksum[:, :, None, :]).reshape(
            b, n, c, h, dk
        ).sum(axis=-1)  # [B, N, C, H] fp32
        z = jnp.einsum(
            "ij,bjch->bich", mixing_matrix.astype(f32), sz,
            preferred_element_type=f32,
        ) + eps
        out = (
            out.reshape(b, n, c, h, dv).astype(f32) / z[..., None]
        ).reshape(b, n, c, h * dv)
    return out.astype(in_dtype)
