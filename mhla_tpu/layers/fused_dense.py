"""Fused multi-projection Dense: several bias-free projections of one
input evaluated as ONE concatenated matmul.

Batch-1 decode is dispatch-bound, not FLOP-bound: the 340M step runs ~8
GEMVs per layer, and each [1, H] x [H, D] matmul pays fixed MXU setup that
dwarfs its weight streaming. Measured on v5e: the matmul-only 24-layer
skeleton drops 1.96 -> 0.97 ms/step (the pure HBM weight-bandwidth floor)
when the per-layer projections are merged. XLA fuses the weight
concatenate into the GEMM (operands are read in place, nothing is
materialized), so the merge is also free at training batch sizes.

The param tree exactly matches the individual ``nn.Dense(use_bias=False)``
modules this replaces — ``params[name]['kernel']`` with the same lecun-
normal init — so checkpoints and converters are unaffected.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class _DenseKernel(nn.Module):
    """Bare Dense kernel param (``params[name]['kernel']``-compatible)."""

    in_features: int
    out_features: int

    @nn.compact
    def __call__(self) -> jax.Array:
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.in_features, self.out_features),
            jnp.float32,
        )


def fused_projections(
    x: jax.Array,
    outs: Sequence[Tuple[str, int]],
    dtype: Any = jnp.float32,
) -> Tuple[jax.Array, ...]:
    """``[(name, out_features), ...]`` bias-free projections of ``x`` as a
    single concatenated matmul; returns the per-name outputs.

    Must be called inside the owning module's ``@nn.compact`` ``__call__``
    — the kernel params are declared at THAT scope, exactly where the
    equivalent ``nn.Dense(name=...)`` modules would put them."""
    in_features = x.shape[-1]
    kernels = [_DenseKernel(in_features, n, name=name)() for name, n in outs]
    w = jnp.concatenate(kernels, axis=1).astype(dtype)
    y = x.astype(dtype) @ w
    splits = []
    off = 0
    for _, n in outs:
        splits.append(y[..., off : off + n])
        off += n
    return tuple(splits)
