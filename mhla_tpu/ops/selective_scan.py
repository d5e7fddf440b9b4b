"""Mamba-1 selective scan (S6) — chunked associative-scan formulation.

Reference semantics: ``mhla_nlp/fla/layers/mamba.py`` ``slow_forward``
(:~135-210, itself the HF Mamba slow path): per token, with diagonal state
``h [Dm, N]``,

    h_t = exp(A * dt_t) * h_{t-1} + (dt_t * B_t) * x_t      # per channel d
    y_t = h_t @ C_t + D * x_t

The recurrence is elementwise-diagonal (no matmul structure to chunk onto
the MXU, unlike mamba2/GLA), so the TPU-native parallel form is a
first-order linear associative scan: within each chunk the prefix
(decay, increment) pairs combine in log2(C) depth on the VPU, and only the
chunk-to-chunk carry is sequential. Memory stays bounded at one
``[B, C, Dm, N]`` tile per step instead of the full ``[B, T, Dm, N]``.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _combine(left, right):
    """First-order recurrence monoid: h -> a*h + b."""
    a1, b1 = left
    a2, b2 = right
    return a1 * a2, b1 * a2 + b2


@partial(jax.jit, static_argnames=("chunk_size", "output_final_state"))
def selective_scan_chunk(
    x: jax.Array,  # [B, T, Dm]
    dt: jax.Array,  # [B, T, Dm] (post-softplus, > 0)
    a: jax.Array,  # [Dm, N] (negative)
    b_in: jax.Array,  # [B, T, N]
    c_in: jax.Array,  # [B, T, N]
    d: jax.Array,  # [Dm]
    initial_state: Optional[jax.Array] = None,  # [B, Dm, N]
    chunk_size: int = 64,
    output_final_state: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    in_dtype = x.dtype
    bsz, t, dm = x.shape
    n = a.shape[-1]
    cs = chunk_size
    pad = (-t) % cs
    if pad:
        widths = ((0, 0), (0, pad), (0, 0))
        x, dt, b_in, c_in = (jnp.pad(u, widths) for u in (x, dt, b_in, c_in))
    nc = x.shape[1] // cs

    x = x.astype(jnp.float32)
    dt = dt.astype(jnp.float32)
    a = a.astype(jnp.float32)
    b_in = b_in.astype(jnp.float32)
    c_in = c_in.astype(jnp.float32)

    def chunked(u):
        return u.reshape((bsz, nc, cs) + u.shape[2:]).swapaxes(0, 1)

    xs = (chunked(x), chunked(dt), chunked(b_in), chunked(c_in))

    h0 = (
        initial_state.astype(jnp.float32)
        if initial_state is not None
        else jnp.zeros((bsz, dm, n), jnp.float32)
    )

    def scan_chunk(h, inp):
        x_i, dt_i, b_i, c_i = inp  # [B, C, Dm] / [B, C, N]
        # decay exp(A dt) and increment dt*B*x, per (token, channel, state)
        aa = jnp.exp(a[None, None] * dt_i[..., None])  # [B, C, Dm, N]
        bu = (dt_i * x_i)[..., None] * b_i[:, :, None, :]
        pa, pb = jax.lax.associative_scan(_combine, (aa, bu), axis=1)
        h_all = pa * h[:, None] + pb  # [B, C, Dm, N]
        y = jnp.einsum("bcdn,bcn->bcd", h_all, c_i) + d * x_i
        return h_all[:, -1], y

    h, y = jax.lax.scan(scan_chunk, h0, xs)
    y = y.swapaxes(0, 1).reshape(bsz, nc * cs, dm)[:, :t]
    return y.astype(in_dtype), (h if output_final_state else None)


@partial(jax.jit, static_argnames=("output_final_state",))
def selective_scan_recurrent(
    x: jax.Array,
    dt: jax.Array,
    a: jax.Array,
    b_in: jax.Array,
    c_in: jax.Array,
    d: jax.Array,
    initial_state: Optional[jax.Array] = None,
    output_final_state: bool = False,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Token-by-token oracle / decode path (identical semantics)."""
    in_dtype = x.dtype
    bsz, t, dm = x.shape
    n = a.shape[-1]
    x = x.astype(jnp.float32)
    dt = dt.astype(jnp.float32)
    a = a.astype(jnp.float32)
    b_in = b_in.astype(jnp.float32)
    c_in = c_in.astype(jnp.float32)

    h0 = (
        initial_state.astype(jnp.float32)
        if initial_state is not None
        else jnp.zeros((bsz, dm, n), jnp.float32)
    )

    def step(h, inp):
        x_t, dt_t, b_t, c_t = inp  # [B, Dm] / [B, N]
        h = h * jnp.exp(a[None] * dt_t[..., None]) + (dt_t * x_t)[
            ..., None
        ] * b_t[:, None, :]
        y = jnp.einsum("bdn,bn->bd", h, c_t) + d * x_t
        return h, y

    xs = tuple(u.swapaxes(0, 1) for u in (x, dt, b_in, c_in))
    h, y = jax.lax.scan(step, h0, xs)
    y = y.swapaxes(0, 1).astype(in_dtype)
    return y, (h if output_final_state else None)
