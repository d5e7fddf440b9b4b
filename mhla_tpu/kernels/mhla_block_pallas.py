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
    the [-sin, +sin] half signs)."""
    f32 = jnp.float32
    parts = []
    half = dh // 2
    for hi in range(nh):
        xh = _hslice(x, hi, dh).astype(f32)
        swapped = jnp.concatenate([xh[:, half:], xh[:, :half]], axis=1)
        ch = _hslice(cos, hi, dh).astype(f32)
        sh = _hslice(sin_signed, hi, dh).astype(f32)
        parts.append(xh * ch + swapped * sh)
    return jnp.concatenate(parts, axis=1)


def _blockify_kernel(nw, pw, c, nh, dh, rope, x_ref, cos_ref, sin_ref, o_ref):
    ft = x_ref.shape[-1]
    x = x_ref[0]  # [pf, ph, W, Ftile]
    for wi in range(nw):
        sub = x[:, :, wi * pw : (wi + 1) * pw, :].reshape(c, ft)
        if rope:
            cos = cos_ref[:, :, wi * pw : (wi + 1) * pw, :].reshape(c, ft)
            sin = sin_ref[:, :, wi * pw : (wi + 1) * pw, :].reshape(c, ft)
            sub = _rope_rows(sub, cos, sin, nh, dh)
        o_ref[0, wi] = sub.astype(o_ref.dtype)


def _unblockify_kernel(nw, pw, pf, ph, nh, dh, rope, x_ref, cos_ref, sin_ref, o_ref):
    ft = x_ref.shape[-1]
    c = x_ref.shape[-2]
    for wi in range(nw):
        sub = x_ref[0, wi]  # [C, Ftile]
        if rope:
            cos = cos_ref[:, :, wi * pw : (wi + 1) * pw, :].reshape(c, ft)
            sin = sin_ref[:, :, wi * pw : (wi + 1) * pw, :].reshape(c, ft)
            sub = _rope_rows(sub, cos, sin, nh, dh)
        o_ref[0, :, :, wi * pw : (wi + 1) * pw, :] = sub.reshape(
            pf, ph, pw, ft
        ).astype(o_ref.dtype)


def _block_geometry(grid, layout):
    (fg, hg, wg), (nf, nh_, nw) = grid, layout
    pf, ph, pw = fg // nf, hg // nh_, wg // nw
    return pf, ph, pw, pf * ph * pw, nf * nh_ * nw


_VMEM_BUDGET_BLOCKIFY = 8 * 1024 * 1024  # rope temporaries run fp32 in VMEM


def _pick_ftile(fdim, dh, cnw, nbytes, rope):
    for ft in (fdim, fdim // 2, fdim // 3, fdim // 4, fdim // 6, fdim // 12, dh):
        if ft <= 0 or fdim % ft or ft % dh:
            continue
        if (4 if rope else 2) * cnw * ft * nbytes * 2 <= _VMEM_BUDGET_BLOCKIFY:
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
        jnp.zeros((1, 1, 1, fdim), x.dtype),
        jnp.zeros((1, 1, 1, fdim), x.dtype),
    )
    if rope:
        cos = cos.reshape(fg, hg, wg, fdim).astype(x.dtype)
        sin = sin.reshape(fg, hg, wg, fdim).astype(x.dtype)
    tbl_spec = pl.BlockSpec(
        (pf, ph, wg, ft) if rope else (1, 1, 1, fdim),
        (lambda bi, fi, hi, ki: (fi, hi, 0, ki))
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
    """(cos_flat, sin_signed_flat) [T, H*Dh] for the fused blockify rope:
    rotate-half as y = x*cos + swap_halves(x)*sin_signed."""
    from ..ops.rotary import rope_angles_3d

    ang = jnp.asarray(
        rope_angles_3d(grid, head_dim, theta, max_pos), jnp.float32
    )  # [T, Dh/2]
    cos = jnp.cos(ang)
    sin = jnp.sin(ang)
    cos_h = jnp.concatenate([cos, cos], axis=-1)  # [T, Dh]
    sin_h = jnp.concatenate([-sin, sin], axis=-1)
    return (
        jnp.tile(cos_h, (1, num_heads)).astype(dtype),
        jnp.tile(sin_h, (1, num_heads)).astype(dtype),
    )


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
