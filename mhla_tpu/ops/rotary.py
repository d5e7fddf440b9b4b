"""Rotary position embeddings (1D for LM; 3D for video).

1D: GPT-NeoX-style (non-interleaved rotate-half) matching the reference fla
``RotaryEmbedding`` (``mhla_nlp/fla/modules/rotary.py``) semantics used by the
causal MHLA layer: applied to the full head_k_dim of q and k, with a
``seqlen_offset`` for decode. On TPU this is left to XLA fusion (the
reference's Triton kernel buys nothing here).

3D: frame/height/width factorized rotary for video tokens, matching
``mhla_videogen/.../wan/model.py:140-178`` (``rope_params``/``rope_apply``).
The reference computes this in complex float64; TPU has no fast fp64, so we
compute in fp32 with the sin/cos formulation (validated against the fp64
reference in tests — see SURVEY.md section 5 numerics notes).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def rotary_freqs(dim: int, base: float = 10000.0) -> np.ndarray:
    """Inverse frequencies [dim/2]."""
    return 1.0 / (base ** (np.arange(0, dim, 2, dtype=np.float64) / dim))


def rotary_cos_sin(
    seq_len: int, dim: int, base: float = 10000.0, dtype=jnp.float32
) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables [seq_len, dim/2] (fp32 compute)."""
    inv = rotary_freqs(dim, base)
    t = np.arange(seq_len, dtype=np.float64)
    freqs = np.outer(t, inv)  # [T, dim/2]
    return jnp.asarray(np.cos(freqs), dtype), jnp.asarray(np.sin(freqs), dtype)


def rotary_xpos_tables(
    seq_len: int,
    dim: int,
    base: float = 10000.0,
    scale_base: float = 512.0,
    dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """XPos tables (Sun et al. 2212.10554): returns (cos_q, sin_q, cos_k,
    sin_k), each [seq_len, dim/2].

    Matches the reference fla ``RotaryEmbedding(scale_base=...)`` exactly
    (``mhla_nlp/fla/modules/rotary.py:395-441``): per-feature decay vector
    ``(arange(0, dim, 2) + 0.4 d) / (1.4 d)`` raised to the centered
    position power ``(t - seq_len // 2) / scale_base``; q tables carry
    ``scale``, k tables carry ``1/scale``, so attention scores pick up the
    relative factor ``scale^{(t_q - t_k)/scale_base}``. Because the scale
    multiplies the rotated output elementwise per feature pair, baking it
    into the cos/sin tables keeps :func:`apply_rotary` /
    ``apply_rotary_flat`` (and the fused fmap+rope kernel) unchanged —
    XPos is purely a table swap."""
    inv = rotary_freqs(dim, base)
    t = np.arange(seq_len, dtype=np.float64)
    freqs = np.outer(t, inv)  # [T, dim/2]
    scale_vec = (np.arange(0, dim, 2, dtype=np.float64) + 0.4 * dim) / (1.4 * dim)
    power = (t - seq_len // 2) / scale_base
    scale = scale_vec[None, :] ** power[:, None]  # [T, dim/2]
    cos, sin = np.cos(freqs), np.sin(freqs)
    return (
        jnp.asarray(cos * scale, dtype),
        jnp.asarray(sin * scale, dtype),
        jnp.asarray(cos / scale, dtype),
        jnp.asarray(sin / scale, dtype),
    )


def apply_rotary(
    x: jax.Array, cos: jax.Array, sin: jax.Array, offset: int | jax.Array = 0
) -> jax.Array:
    """Apply rotate-half rotary to x [B, T, H, D] using tables [>=T+offset, D/2]."""
    t = x.shape[1]
    d2 = cos.shape[-1]
    cos_t = jax.lax.dynamic_slice_in_dim(cos, offset, t, axis=0)[None, :, None, :]
    sin_t = jax.lax.dynamic_slice_in_dim(sin, offset, t, axis=0)[None, :, None, :]
    x1, x2 = x[..., :d2], x[..., d2 : 2 * d2]
    rot = jnp.concatenate([x1 * cos_t - x2 * sin_t, x2 * cos_t + x1 * sin_t], axis=-1)
    if x.shape[-1] > 2 * d2:  # partial-dim rotary: pass the tail through
        rot = jnp.concatenate([rot, x[..., 2 * d2 :]], axis=-1)
    return rot.astype(x.dtype)


def apply_rotary_flat(
    x: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    num_heads: int,
    offset: int | jax.Array = 0,
    positions: Optional[jax.Array] = None,
) -> jax.Array:
    """Rotate-half rotary on head-flat x [B, T, H*D] with the SAME small
    [>=T+offset, D/2] tables as :func:`apply_rotary` — exactly equal to
    applying it on the [B, T, H, D] view (full-head-dim rotary), without
    the view: per head segment, y = [x1*cos - x2*sin, x2*cos + x1*sin],
    built as 4H minor-axis slices that XLA fuses into one FMA pass. The
    [B,T,H,D] reshape is a real TPU tile-relayout copy (CLAUDE.md); tiling
    the tables to [T, H*D] would stream H*D/2-times the table bytes —
    this form avoids both.

    ``positions`` [B, T] overrides the contiguous [offset, offset+T) range
    with explicit per-token table rows — the packed-varlen path, where each
    document restarts at position 0 (the reference resets via rotary
    cu_seqlens, ``fla/modules/rotary.py``)."""
    t = x.shape[1]
    dh = x.shape[-1] // num_heads
    half = dh // 2
    assert cos.shape[-1] == half, "flat rotary requires full-head-dim tables"
    if positions is not None:
        cos_t = cos[positions].astype(jnp.float32)  # [B, T, half]
        sin_t = sin[positions].astype(jnp.float32)
    else:
        cos_t = jax.lax.dynamic_slice_in_dim(cos, offset, t, axis=0)[
            None
        ].astype(jnp.float32)
        sin_t = jax.lax.dynamic_slice_in_dim(sin, offset, t, axis=0)[
            None
        ].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    parts = []
    for hi in range(num_heads):
        x1 = xf[..., hi * dh : hi * dh + half]
        x2 = xf[..., hi * dh + half : (hi + 1) * dh]
        parts.append(x1 * cos_t - x2 * sin_t)
        parts.append(x2 * cos_t + x1 * sin_t)
    return jnp.concatenate(parts, axis=-1).astype(x.dtype)


# ---------------------------------------------------------------------------
# 3D rotary (video)
# ---------------------------------------------------------------------------

def rope_params_3d(
    max_pos: int, dim: int, theta: float = 10000.0
) -> np.ndarray:
    """Per-axis complex-free rotary table: returns angles [max_pos, dim/2].

    Matches the reference ``rope_params`` (``wan/model.py:140-148``):
    freqs = outer(arange(max_pos), 1/theta^(arange(0, dim, 2)/dim)).
    """
    inv = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    return np.outer(np.arange(max_pos, dtype=np.float64), inv)


def rope_angles_3d(
    grid: Sequence[int], head_dim: int, theta: float = 10000.0, max_pos: int = 1024
) -> np.ndarray:
    """Full angle table for an (F, H, W) token grid -> [F*H*W, head_dim/2].

    The half-dim c = head_dim // 2 is split [c - 2*(c//3), c//3, c//3] over
    (frame, height, width) axes (``wan/model.py:150-156``, ``mhla_utils.py:132``).
    """
    f, h, w = grid
    c = head_dim // 2
    cf, ch, cw = c - 2 * (c // 3), c // 3, c // 3
    ang_f = rope_params_3d(max_pos, 2 * cf, theta)[:f]  # [F, cf]
    ang_h = rope_params_3d(max_pos, 2 * ch, theta)[:h]  # [H, ch]
    ang_w = rope_params_3d(max_pos, 2 * cw, theta)[:w]  # [W, cw]
    out = np.concatenate(
        [
            np.broadcast_to(ang_f[:, None, None, :], (f, h, w, cf)),
            np.broadcast_to(ang_h[None, :, None, :], (f, h, w, ch)),
            np.broadcast_to(ang_w[None, None, :, :], (f, h, w, cw)),
        ],
        axis=-1,
    )
    return out.reshape(f * h * w, c)


@partial(jax.jit, static_argnames=())
def apply_rotary_interleaved(x: jax.Array, angles: jax.Array) -> jax.Array:
    """Interleaved (complex-pair) rotary: x [B, T, H, D], angles [T, D/2].

    Treats consecutive feature pairs (x[2i], x[2i+1]) as complex numbers and
    multiplies by exp(i * angle) — the jnp equivalent of the reference's
    ``view_as_complex`` path (``mhla_utils.py:127-156``), in fp32.

    NOTE: this layout forces minor-dimension-2 vector ops, which are slow on
    TPU (the VPU is 8x128). Attention paths should use
    :func:`apply_rotary_3d_halves` instead — see its docstring for the exact
    equivalence argument.
    """
    in_dtype = x.dtype
    b, t, h, d = x.shape
    xf = x.astype(jnp.float32).reshape(b, t, h, d // 2, 2)
    cos = jnp.cos(angles).astype(jnp.float32)[None, :, None, :]
    sin = jnp.sin(angles).astype(jnp.float32)[None, :, None, :]
    re = xf[..., 0] * cos - xf[..., 1] * sin
    im = xf[..., 0] * sin + xf[..., 1] * cos
    return jnp.stack([re, im], axis=-1).reshape(b, t, h, d).astype(in_dtype)


@partial(jax.jit, static_argnames=())
def apply_rotary_3d_halves(x: jax.Array, angles: jax.Array) -> jax.Array:
    """Rotate-half rotary with the 3D angle table: x [B, T, H, D],
    angles [T, D/2]. Lane-friendly TPU form of
    :func:`apply_rotary_interleaved`.

    Equivalence: this equals the interleaved form composed with the fixed
    feature permutation P = [0, 2, 4, ..., 1, 3, 5, ...] (evens then odds).
    A fixed permutation applied to BOTH q and k cancels in every downstream
    bilinear: attention scores q.k, chunk/block KV states k^T v read out by
    q, and the normalizer q.sum(k) are all exactly invariant. Apply it to
    q and k only (never v) and the model outputs match the interleaved form
    bit-for-modulo-reassociation. Verified in tests.
    """
    in_dtype = x.dtype
    d2 = angles.shape[-1]
    xf = x.astype(jnp.float32)
    cos = jnp.cos(angles).astype(jnp.float32)[None, :, None, :]
    sin = jnp.sin(angles).astype(jnp.float32)[None, :, None, :]
    x1, x2 = xf[..., :d2], xf[..., d2:]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    ).astype(in_dtype)
