"""Normalization layers (fp32 compute, cast back to input dtype).

TPU-native equivalents of the reference's Triton norm kernels
(``mhla_nlp/fla/modules/layernorm.py``, ``fused_norm_gate.py``): on TPU, XLA
fuses these elementwise chains into neighbouring ops, so the default path is
plain jnp; a Pallas fused residual+norm kernel is available in
``mhla_tpu.kernels`` for the hot LM residual stream.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def rms_norm(x: jax.Array, weight: Optional[jax.Array], eps: float) -> jax.Array:
    dtype = x.dtype
    x = x.astype(jnp.float32)
    x = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
    if weight is not None:
        x = x * weight.astype(jnp.float32)
    return x.astype(dtype)


class RMSNorm(nn.Module):
    """RMSNorm over the last axis; reference ``fla.modules.RMSNorm``."""

    eps: float = 1e-6
    elementwise_affine: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = (
            self.param("weight", nn.initializers.ones, (x.shape[-1],), jnp.float32)
            if self.elementwise_affine
            else None
        )
        return rms_norm(x, w, self.eps)


class GatedRMSNorm(nn.Module):
    """RMSNorm(x) * swish(g) — reference ``FusedRMSNormGated``
    (``fla/modules/fused_norm_gate.py``), used as the MHLA output gate
    (``fla/layers/mhla.py:206-211,354``)."""

    eps: float = 1e-6
    elementwise_affine: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, g: jax.Array) -> jax.Array:
        w = (
            self.param("weight", nn.initializers.ones, (x.shape[-1],), jnp.float32)
            if self.elementwise_affine
            else None
        )
        y = rms_norm(x, w, self.eps)
        return (y.astype(jnp.float32) * jax.nn.silu(g.astype(jnp.float32))).astype(
            x.dtype
        )


class LayerNorm(nn.Module):
    """LayerNorm with optional bias, fp32 compute."""

    eps: float = 1e-6
    use_bias: bool = True
    use_scale: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dtype = x.dtype
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        if self.use_scale:
            w = self.param("weight", nn.initializers.ones, (x.shape[-1],), jnp.float32)
            y = y * w
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (x.shape[-1],), jnp.float32)
            y = y + b
        return y.astype(dtype)
