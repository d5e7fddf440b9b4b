"""Gated delta rule op (DeltaNet with scalar forget gates).

Baseline family shipped by the reference (``fla/ops/gated_delta_rule``,
semantics from the self-contained fused recurrent kernel
``fused_recurrent.py:23-353``): per token, with state S [Dk, Dv],

    S  *= exp(g_t)                      # scalar per-head log decay
    v'  = beta_t * (v_t - S^T k_t)      # delta rule replacement
    S  += k_t v'^T
    o_t = (q_t * Dk**-0.5) S

q/k are L2-normalized (``use_qk_l2norm_in_kernel``).

Two forms:
- :func:`gated_delta_recurrent` — exact ``lax.scan`` over tokens (oracle +
  decode path).
- :func:`gated_delta_chunk` — the WY-representation training path
  (reference ``fla/ops/gated_delta_rule/wy_fast.py:28-298`` + ``chunk.py:221``
  re-derived for TPU): within each chunk the sequential delta corrections
  are obtained in closed form by inverting the unit-lower-triangular system
  ``(I + A) v' = beta*(v - decayed-prefix readout)``; the inverse is a
  Neumann product of log2(chunk) squared matmuls (A is nilpotent), so the
  whole chunk runs on the MXU and only the C-sized chunk scan is sequential.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def l2norm(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    return x * jax.lax.rsqrt(jnp.sum(x * x, -1, keepdims=True) + eps)


def _f32_matmuls(fn):
    """Trace the op under true-f32 matmul precision.

    The TPU default matmul precision truncates f32 dot inputs to one bf16
    pass. For most ops that is the right trade, but the delta rule's WY
    solve and v_eff = u - w S chain are alternating/cancelling sums whose
    truncation error feeds back through the state: measured ~11% output
    drift at 2k tokens. These ops are the SEMANTIC ANCHOR (oracle for the
    fused Pallas kernels and the decode path), so they pay for exactness;
    the fused kernel keeps bf16 on the safe dots and full f32 only on the
    Neumann solve (``kernels/delta_chunk_pallas._neumann_inv``).

    ``functools.wraps`` preserves the original signature, so ``jax.jit``
    still resolves the static argnames when they are passed positionally."""

    import inspect

    @functools.wraps(fn)
    def inner(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    statics = ("output_final_state", "use_qk_l2norm", "chunk_size")
    params = inspect.signature(fn).parameters
    return jax.jit(
        inner, static_argnames=tuple(s for s in statics if s in params)
    )


@_f32_matmuls
def gated_delta_recurrent(
    q: jax.Array,  # [B, T, H, Dk]
    k: jax.Array,  # [B, T, H, Dk]
    v: jax.Array,  # [B, T, H, Dv]
    g: jax.Array,  # [B, T, H] log decay (<= 0)
    beta: jax.Array,  # [B, T, H] in (0, 1) (or (0, 2) with neg eigval)
    initial_state: Optional[jax.Array] = None,
    output_final_state: bool = False,
    use_qk_l2norm: bool = True,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    in_dtype = q.dtype
    b, t, h, dk = q.shape
    dv = v.shape[-1]
    scale = dk**-0.5
    q, k, v = (x.astype(jnp.float32) for x in (q, k, v))
    g = g.astype(jnp.float32)
    beta = beta.astype(jnp.float32)
    if use_qk_l2norm:
        q, k = l2norm(q), l2norm(k)

    s0 = (
        initial_state.astype(jnp.float32)
        if initial_state is not None
        else jnp.zeros((b, h, dk, dv), jnp.float32)
    )

    def step(s, xs):
        q_t, k_t, v_t, g_t, b_t = xs  # [B, H, *]
        s = s * jnp.exp(g_t)[..., None, None]
        v_old = jnp.einsum("bhkv,bhk->bhv", s, k_t)
        v_new = b_t[..., None] * (v_t - v_old)
        s = s + jnp.einsum("bhk,bhv->bhkv", k_t, v_new)
        o_t = jnp.einsum("bhk,bhkv->bhv", q_t * scale, s)
        return s, o_t

    xs = (
        q.transpose(1, 0, 2, 3),
        k.transpose(1, 0, 2, 3),
        v.transpose(1, 0, 2, 3),
        g.transpose(1, 0, 2),
        beta.transpose(1, 0, 2),
    )
    s, o = jax.lax.scan(step, s0, xs)
    o = o.transpose(1, 0, 2, 3).astype(in_dtype)
    return o, (s if output_final_state else None)


def _tril_unit_inverse(a: jax.Array) -> jax.Array:
    """Inverse of (I + A) for strictly-lower-triangular A (batched [..., C, C]).

    A is nilpotent, so (I + A)^-1 = sum_p (-A)^p = prod_j (I + (-A)^(2^j))
    — log2(C) squarings + products, all MXU matmuls (TPU-friendly; the
    Triton reference does row-wise forward substitution instead).
    """
    c = a.shape[-1]
    eye = jnp.eye(c, dtype=a.dtype)
    x = -a
    inv = eye + x
    steps = max((c - 1).bit_length() - 1, 0)
    for _ in range(steps):
        x = x @ x
        inv = inv @ (eye + x)
    return inv


@_f32_matmuls
def gated_delta_chunk(
    q: jax.Array,  # [B, T, H, Dk]
    k: jax.Array,  # [B, T, H, Dk]
    v: jax.Array,  # [B, T, H, Dv]
    g: jax.Array,  # [B, T, H] log decay (<= 0)
    beta: jax.Array,  # [B, T, H]
    initial_state: Optional[jax.Array] = None,
    chunk_size: int = 64,
    output_final_state: bool = False,
    use_qk_l2norm: bool = True,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Chunked (WY-form) gated delta rule — the training path.

    Exactly matches :func:`gated_delta_recurrent` (property-tested); wall
    clock is O(T/C) sequential chunk steps instead of O(T) token steps.
    """
    from .mhla_chunk import _pad_to_chunks

    in_dtype = q.dtype
    b, t, h, dk = q.shape
    dv = v.shape[-1]
    c = chunk_size
    scale = dk**-0.5
    q, k, v = (x.astype(jnp.float32) for x in (q, k, v))
    if use_qk_l2norm:
        q, k = l2norm(q), l2norm(k)

    q = _pad_to_chunks(q, c)
    k = _pad_to_chunks(k, c)
    v = _pad_to_chunks(v, c)
    g = _pad_to_chunks(g.astype(jnp.float32), c)
    beta = _pad_to_chunks(beta.astype(jnp.float32), c)
    n = q.shape[1] // c

    # [N, B, H, C, D]: head-major, chunk-token minor — every contraction
    # below is then a plain batched [C, D]/[C, C] matmul (MXU-shaped)
    def chunked(x):
        if x.ndim == 4:
            return x.reshape(b, n, c, h, x.shape[-1]).transpose(1, 0, 3, 2, 4)
        return x.reshape(b, n, c, h).transpose(1, 0, 3, 2)  # [N, B, H, C]

    q, k, v = chunked(q), chunked(k), chunked(v)
    g, beta = chunked(g), chunked(beta)
    g_cum = jnp.cumsum(g, axis=-1)  # inclusive within-chunk cumsum
    g_last = g_cum[..., -1]  # [N, B, H]

    # pairwise decay exp(G_i - G_j) masked to j <= i (differences are <= 0
    # for g <= 0, so no overflow; the exp(-G) factoring used by gla_chunk
    # would blow up at delta-rule decay magnitudes)
    gd = g_cum[..., :, None] - g_cum[..., None, :]  # [N, B, H, C, C]
    idx = jnp.arange(c)
    incl = idx[:, None] >= idx[None, :]
    strict = idx[:, None] > idx[None, :]
    decay_incl = jnp.exp(jnp.where(incl, gd, -jnp.inf))
    decay_strict = jnp.exp(jnp.where(strict, gd, -jnp.inf))

    # WY solve, parallel over all chunks:
    # A[i,j] = beta_i <k_i, k_j> exp(G_i - G_j), j < i
    a = (k @ k.swapaxes(-1, -2)) * decay_strict * beta[..., :, None]
    t_inv = _tril_unit_inverse(a)

    # u = (I+A)^-1 (beta v); w = (I+A)^-1 (beta exp(G) k)
    u = t_inv @ (beta[..., None] * v)
    w = t_inv @ ((beta * jnp.exp(g_cum))[..., None] * k)

    # intra-chunk attention q_i k_j exp(G_i - G_j), j <= i
    qk = (q @ k.swapaxes(-1, -2)) * decay_incl * scale
    q_dec = q * jnp.exp(g_cum)[..., None] * scale
    k_carry = k * jnp.exp(g_last[..., None] - g_cum)[..., None]

    s0 = (
        initial_state.astype(jnp.float32)
        if initial_state is not None
        else jnp.zeros((b, h, dk, dv), jnp.float32)
    )

    def scan_chunk(s, xs):
        qk_i, q_i, w_i, u_i, kc_i, ge = xs  # [B, H, C, *] / ge [B, H]
        # delta-corrected values for this chunk given the incoming state
        v_eff = u_i - w_i @ s
        o = q_i @ s + qk_i @ v_eff
        s = s * jnp.exp(ge)[..., None, None] + kc_i.swapaxes(-1, -2) @ v_eff
        return s, o

    s, o = jax.lax.scan(scan_chunk, s0, (qk, q_dec, w, u, k_carry, g_last))
    # [N, B, H, C, Dv] -> [B, T, H, Dv]
    o = o.transpose(1, 0, 3, 2, 4).reshape(b, n * c, h, dv)[:, :t]
    return o.astype(in_dtype), (s if output_final_state else None)
