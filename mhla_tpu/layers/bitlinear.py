"""BitLinear: 1.58-bit weight / 8-bit activation fake-quantized linear.

TPU-native counterpart of the reference's BitLinear / FusedBitLinear
(``mhla_nlp/fla/modules/fused_bitlinear.py:26-66`` quantizers, ``:553-634``
layers): RMS-normalize the input, fake-quantize activations per token to
int8 and weights per tensor to {-1, 0, 1}, and run the matmul on the
dequantized values with straight-through-estimator gradients. The
reference fuses norm+quant+matmul in Triton; on TPU the same fusion falls
out of XLA (round/clip/scale are elementwise prologues of the dot), so one
jitted function replaces both the "fused" and plain variants.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def activation_quant(x: jax.Array) -> jax.Array:
    """Per-token (last-axis) int8 fake quantization
    (reference ``activation_quant``, fused_bitlinear.py:26)."""
    scale = 127.0 / jnp.clip(
        jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-5, None
    )
    return jnp.clip(jnp.round(x * scale), -128, 127) / scale


def weight_quant(w: jax.Array) -> jax.Array:
    """Per-tensor ternary (1.58-bit) fake quantization
    (reference ``weight_quant``, fused_bitlinear.py:43)."""
    scale = 1.0 / jnp.clip(jnp.mean(jnp.abs(w)), 1e-5, None)
    return jnp.clip(jnp.round(w * scale), -1, 1) / scale


def _ste(x: jax.Array, quant) -> jax.Array:
    """Straight-through estimator: forward = quant(x), gradient = identity."""
    return x + jax.lax.stop_gradient(quant(x) - x)


def bit_linear(
    x: jax.Array,
    weight: jax.Array,  # [in, out]
    bias: Optional[jax.Array] = None,
    norm_weight: Optional[jax.Array] = None,
    eps: float = 1e-8,
) -> jax.Array:
    """Functional BitLinear (reference ``bit_linear``, fused_bitlinear.py:528):
    RMS norm -> STE activation quant -> STE ternary-weight matmul."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    xn = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    if norm_weight is not None:
        xn = xn * norm_weight.astype(jnp.float32)
    xq = _ste(xn, activation_quant)
    wq = _ste(weight.astype(jnp.float32), weight_quant)
    y = jnp.dot(xq, wq)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dt)


class BitLinear(nn.Module):
    """RMS-normed, quantization-aware linear layer (BitNet b1.58 style)."""

    features: int
    use_bias: bool = False
    eps: float = 1e-8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (in_features, self.features),
            jnp.float32,
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        g = self.param("norm_scale", nn.initializers.ones, (in_features,), jnp.float32)
        return bit_linear(x.astype(self.dtype), w, b, g, self.eps)
