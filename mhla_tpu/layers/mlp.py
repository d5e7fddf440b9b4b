"""Gated MLP (SwiGLU), the LM block MLP.

Matches reference ``fla.modules.GatedMLP`` (``mhla_nlp/fla/modules/mlp.py``):
intermediate_size defaults to the multiple of 256 nearest above
``2/3 * hidden_size * hidden_ratio``. XLA fuses the swiglu elementwise chain
into the surrounding matmuls, so no custom kernel is needed on TPU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def swiglu(gate: jax.Array, up: jax.Array) -> jax.Array:
    return jax.nn.silu(gate) * up


def default_intermediate_size(hidden_size: int, hidden_ratio: int = 4) -> int:
    inter = int(hidden_size * hidden_ratio * 2 / 3)
    return 256 * ((inter + 255) // 256)


class GatedMLP(nn.Module):
    hidden_size: int
    hidden_ratio: int = 4
    intermediate_size: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        inter = self.intermediate_size or default_intermediate_size(
            self.hidden_size, self.hidden_ratio
        )
        # gate+up as one concatenated matmul (see layers/fused_dense.py);
        # param tree identical to separate nn.Dense modules
        from .fused_dense import fused_projections

        gate, up = fused_projections(
            x, [("gate_proj", inter), ("up_proj", inter)], self.dtype
        )
        return nn.Dense(
            self.hidden_size, use_bias=False, dtype=self.dtype,
            name="down_proj",
        )(swiglu(gate, up))


class MLP(nn.Module):
    """Plain MLP with configurable activation (ViT/DiT blocks)."""

    hidden_features: int
    out_features: Optional[int] = None
    activation: str = "gelu"
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out = self.out_features or x.shape[-1]
        act = {
            "gelu": lambda y: jax.nn.gelu(y, approximate=True),
            "gelu_exact": lambda y: jax.nn.gelu(y, approximate=False),
            "silu": jax.nn.silu,
            "relu": jax.nn.relu,
        }[self.activation]
        x = nn.Dense(self.hidden_features, use_bias=self.use_bias, dtype=self.dtype, name="fc1")(x)
        x = act(x)
        return nn.Dense(out, use_bias=self.use_bias, dtype=self.dtype, name="fc2")(x)
