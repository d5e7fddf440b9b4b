"""Long (full-sequence) causal convolutions via FFT.

TPU-native counterpart of the reference's LongConvolution /
ImplicitLongConvolution (``mhla_nlp/fla/modules/convolution.py:1034-1076``,
``:1078-1100`` positional embedding, ``:1102-1166`` implicit filter):
a learned length-L filter per channel applied as a CAUSAL linear
convolution through a 2L-point real FFT, plus the residual add the
reference's ``fft_conv`` (:1012-1027, gelu disabled by both callers)
applies. The implicit variant parameterizes the filter with a small MLP
over (t, Re e^{-i f w}, Im e^{-i f w}) positional features.

FFTs lower to XLA's native FFT on TPU; everything stays fp32 internally
(half-precision FFT accumulates visible error at video/LM lengths).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn


def fft_causal_conv(u: jax.Array, filt: jax.Array) -> jax.Array:
    """Causal linear convolution of ``u`` [B, T, H] with per-channel filter
    ``filt`` [H, L] (L >= T), plus the reference's residual add."""
    b, t, h = u.shape
    fft_size = 2 * t
    dt = u.dtype
    uf = jnp.fft.rfft(u.astype(jnp.float32), n=fft_size, axis=1)
    kf = jnp.fft.rfft(filt.astype(jnp.float32)[:, :t], n=fft_size, axis=-1)
    y = jnp.fft.irfft(uf * kf.T[None], n=fft_size, axis=1)[:, :t]
    return (y + u.astype(jnp.float32)).astype(dt)


class LongConvolution(nn.Module):
    """Explicit learned filter of length ``max_len`` per channel."""

    hidden_size: int
    max_len: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, T, H]
        filt = self.param(
            "filter",
            nn.initializers.normal(1.0),
            (self.hidden_size, self.max_len),
            jnp.float32,
        )
        return fft_causal_conv(x, filt)


def positional_features(emb_dim: int, seq_len: int) -> jnp.ndarray:
    """(t, Re z, Im z) features, z = e^{-i f w} (reference
    PositionalEmbedding, convolution.py:1078-1100). [1, L, emb_dim]."""
    assert emb_dim % 2 != 0 and emb_dim >= 3
    t = jnp.linspace(0, 1, seq_len)[None, :, None]
    bands = (emb_dim - 1) // 2
    t_rescaled = jnp.linspace(0, seq_len - 1, seq_len)[None, :, None]
    w = 2 * math.pi * t_rescaled / seq_len
    f = jnp.linspace(1e-4, bands - 1, bands)[None, None]
    z = jnp.exp(-1j * f * w)
    return jnp.concatenate([t, z.real, z.imag], axis=-1).astype(jnp.float32)


class ImplicitLongConvolution(nn.Module):
    """Filter parameterized by an MLP over positional features."""

    hidden_size: int
    max_len: int
    d_emb: int = 3
    d_hidden: int = 16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, T, H]
        t = x.shape[1]
        z = positional_features(self.d_emb, t)  # [1, T, d_emb]
        h = nn.Dense(self.d_hidden, dtype=jnp.float32, name="mlp_0")(z)
        h = jax.nn.relu(h)
        filt = nn.Dense(self.hidden_size, dtype=jnp.float32, name="mlp_1")(h)
        return fft_causal_conv(x, filt[0].T)  # [H, T]
