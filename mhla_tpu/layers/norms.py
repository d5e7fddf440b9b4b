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


class GatedRMSNormHeadsFlat(nn.Module):
    """Per-head RMSNorm(x) * swish(g) on head-flat [B, T, H*Dh] tensors.

    Param-compatible with :class:`GatedRMSNorm` applied to the [B, T, H, Dh]
    view (same ``weight`` of shape [Dh]), but the per-head sum-of-squares
    rides through two skinny segment matmuls (MXU, tiling preserved) instead
    of a 4D reshape — the [B,T,H*D] <-> [B,T,H,D] round trip is a real TPU
    tile-relayout copy and a per-head RMSNorm through the 4D view measures
    4x the flat one (CLAUDE.md)."""

    num_heads: int
    eps: float = 1e-5
    elementwise_affine: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, g: jax.Array) -> jax.Array:
        f32 = jnp.float32
        fdim = x.shape[-1]
        dh = fdim // self.num_heads
        seg = (
            jnp.arange(fdim)[:, None] // dh
            == jnp.arange(self.num_heads)[None, :]
        ).astype(x.dtype)  # [F, H]
        # stats in fp32: the 3-operand einsum keeps the bf16*bf16 squares
        # exact in the f32 accumulator (2.4e-7 vs 1.7e-2 max err for a bf16
        # `x * x`). It lowers as an all-batch-dims dot feeding the segment
        # GEMM; whether the f32 square stream stays fused on TPU is to be
        # re-measured against train_bench (an explicitly materialized fp32
        # [B,T,F] temporary once measured +5 ms/step).
        ss = jnp.einsum("btf,btf,fh->bth", x, x, seg, preferred_element_type=f32)
        inv = jax.lax.rsqrt(ss / dh + self.eps)
        scale = inv.astype(x.dtype)
        if self.elementwise_affine:
            w = self.param("weight", nn.initializers.ones, (dh,), jnp.float32)
            gate = jnp.tile(w, self.num_heads).astype(x.dtype) * jax.nn.silu(
                g.astype(f32)
            ).astype(x.dtype)
        else:
            gate = jax.nn.silu(g.astype(f32)).astype(x.dtype)
        return x * jnp.einsum("bth,fh->btf", scale, seg) * gate


class RMSNormHeadsFlat(nn.Module):
    """Per-head RMSNorm on head-flat [B, T, H*Dh] (ungated counterpart of
    :class:`GatedRMSNormHeadsFlat`; param-compatible with per-head
    :class:`RMSNorm`)."""

    num_heads: int
    eps: float = 1e-5
    elementwise_affine: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        f32 = jnp.float32
        fdim = x.shape[-1]
        dh = fdim // self.num_heads
        seg = (
            jnp.arange(fdim)[:, None] // dh
            == jnp.arange(self.num_heads)[None, :]
        ).astype(x.dtype)
        ss = jnp.einsum("btf,btf,fh->bth", x, x, seg, preferred_element_type=f32)
        inv = jax.lax.rsqrt(ss / dh + self.eps)
        y = x * jnp.einsum("bth,fh->btf", inv.astype(x.dtype), seg)
        if self.elementwise_affine:
            w = self.param("weight", nn.initializers.ones, (dh,), jnp.float32)
            y = y * jnp.tile(w, self.num_heads).astype(x.dtype)
        return y


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
