"""Fused feature-map + rotate-half rotary on head-flat [B, T, H*D] rows.

The causal MHLA layer applies ``rope(fmap(x))`` to q and k after the
projections (reference order ``mhla_nlp/fla/layers/mhla.py:297-311``). On the
head-flat layout the rotate-half swap is a per-128-lane-segment half swap; in
jnp that's 4H minor-axis slices at 64-lane offsets, which Mosaic/XLA compile
to lane-shift relayouts (measured slower than the 4D-view form it was meant
to replace). In VMEM the slices are free, so this one Pallas pass does
feature map + rotation at memory speed and the layer never materializes a
[B, T, H, D] view.

The rotation is linear, so the backward is the same kernel with negated sin
applied to the cotangent, times the feature map's derivative at the saved
raw input (relu'/elu' masks — flash-style recompute, no extra residuals).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .mhla_chunk_pallas import _interpret

_FMAPS = (None, "relu", "elu", "identity", "t2r")


def _fmap_fwd(x, name):
    if name in ("relu", "t2r"):
        return jnp.maximum(x, 0.0)
    if name == "elu":
        return jnp.where(x > 0, x + 1.0, jnp.exp(x))  # elu(x)+1
    return x


def _fmap_deriv(x, name):
    if name in ("relu", "t2r"):
        return (x > 0).astype(jnp.float32)
    if name == "elu":
        return jnp.where(x > 0, 1.0, jnp.exp(x))
    return jnp.ones_like(x)


def _rope_rows_f32(x, cos, sin_signed, nh, dh):
    """x [R, H*Dh] fp32 -> rotated fp32; cos/sin_signed [R, Dh] (cos
    duplicated over halves; sin carrying the [-sin, +sin] signs)."""
    half = dh // 2
    parts = []
    for hi in range(nh):
        xh = x[:, hi * dh : (hi + 1) * dh]
        swapped = jnp.concatenate([xh[:, half:], xh[:, :half]], axis=1)
        parts.append(xh * cos + swapped * sin_signed)
    return jnp.concatenate(parts, axis=1)


def _tbl(ref):
    """Table block -> [R, Dh] fp32; tables are [T, Dh] (shared across the
    batch) or [B, T, Dh] (per-token gathered rows, the packed-varlen path)."""
    t = ref[...].astype(jnp.float32)
    return t[0] if t.ndim == 3 else t


def _fwd_kernel(nh, dh, fm, x_ref, cos_ref, sin_ref, o_ref):
    x = x_ref[0].astype(jnp.float32)
    y = _rope_rows_f32(_fmap_fwd(x, fm), _tbl(cos_ref), _tbl(sin_ref), nh, dh)
    o_ref[0] = y.astype(o_ref.dtype)


def _bwd_kernel(nh, dh, fm, dy_ref, x_ref, cos_ref, sin_ref, dx_ref):
    # dx = fmap'(x) * rope_{-sin}(dy)   (rotation transpose = negated sin)
    dy = dy_ref[0].astype(jnp.float32)
    g = _rope_rows_f32(dy, _tbl(cos_ref), -_tbl(sin_ref), nh, dh)
    dx_ref[0] = (g * _fmap_deriv(x_ref[0].astype(jnp.float32), fm)).astype(
        dx_ref.dtype
    )


def _pick_rows(t: int) -> Optional[int]:
    for r in (512, 256, 128, 64, 32, 16, 8):
        if t % r == 0:
            return r
    return None


def _use_kernel(t: int, dh: int) -> bool:
    on_tpu = jax.default_backend() == "tpu"
    return (
        (on_tpu or _interpret())
        and dh % 128 == 0
        and _pick_rows(t) is not None
    )


def _run(kern_body, nh, dh, fm, out_dtype, x, *tensors):
    b, t, f = x.shape
    rows = _pick_rows(t)
    row_spec = pl.BlockSpec((1, rows, f), lambda bi, ti: (bi, ti, 0))

    def spec_for(a):
        if a.ndim == 3 and a.shape[-1] == f:
            return row_spec  # another [B, T, H*D] stream (bwd's saved x)
        if a.ndim == 3:  # per-token [B, T, Dh] table (varlen positions)
            return pl.BlockSpec((1, rows, dh), lambda bi, ti: (bi, ti, 0))
        return pl.BlockSpec((rows, dh), lambda bi, ti: (ti, 0))

    in_specs = [row_spec] + [spec_for(a) for a in tensors]
    return pl.pallas_call(
        functools.partial(kern_body, nh, dh, fm),
        grid=(b, t // rows),
        in_specs=in_specs,
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, f), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=6 * x.size,
            bytes_accessed=(
                2 * x.size + sum(a.size for a in tensors)
            ) * x.dtype.itemsize,
            transcendentals=x.size if fm == "elu" else 0,
        ),
        interpret=_interpret(),
    )(x, *tensors)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4)
)
def _fused(x, cos_h, sin_h, num_heads, fm):
    dh = x.shape[-1] // num_heads
    return _run(_fwd_kernel, num_heads, dh, fm, x.dtype, x, cos_h, sin_h)


def _fused_fwd(x, cos_h, sin_h, num_heads, fm):
    return _fused(x, cos_h, sin_h, num_heads, fm), (x, cos_h, sin_h)


def _fused_bwd(num_heads, fm, res, dy):
    x, cos_h, sin_h = res
    dh = x.shape[-1] // num_heads
    dx = _run(
        _bwd_kernel, num_heads, dh, fm, x.dtype, dy.astype(x.dtype), x,
        cos_h, sin_h,
    )
    return dx, None, None


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_fmap_rope_flat(
    x: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    num_heads: int,
    feature_map: Optional[str] = None,
    offset: int | jax.Array = 0,
    positions: Optional[jax.Array] = None,
) -> jax.Array:
    """``rope(fmap(x))`` on head-flat x [B, T, H*Dh] with the standard
    [>=T+offset, Dh/2] rotary tables. One fused Pallas pass on TPU; jnp
    (``ops.rotary.apply_rotary_flat``) elsewhere. Exactly matches
    ``apply_rotary(fmap(x4d), cos, sin, offset)`` on the [B,T,H,Dh] view.

    ``positions`` [B, T] selects explicit per-token table rows instead of
    the contiguous offset range (packed varlen: each document restarts at
    position 0, like the reference's rotary cu_seqlens path); the gathered
    [B, T, Dh] tables stream through the same kernel."""
    assert feature_map in _FMAPS, feature_map
    t = x.shape[1]
    dh = x.shape[-1] // num_heads
    assert cos.shape[-1] * 2 == dh, "full-head-dim rotary tables required"
    if not _use_kernel(t, dh):
        from ..ops.feature_maps import get_feature_map
        from ..ops.rotary import apply_rotary_flat

        return apply_rotary_flat(
            get_feature_map(feature_map)(x), cos, sin, num_heads,
            offset=offset, positions=positions,
        )
    if positions is not None:
        cos_t = cos[positions]  # [B, T, Dh/2]
        sin_t = sin[positions]
    else:
        cos_t = jax.lax.dynamic_slice_in_dim(cos, offset, t, axis=0)  # [T, .]
        sin_t = jax.lax.dynamic_slice_in_dim(sin, offset, t, axis=0)
    cos_h = jnp.concatenate([cos_t, cos_t], axis=-1)  # [(B,) T, Dh]
    sin_h = jnp.concatenate([-sin_t, sin_t], axis=-1)
    return _fused(x, cos_h, sin_h, num_heads, feature_map)
