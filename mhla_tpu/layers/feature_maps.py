"""Learnable (parameterized) query/key feature maps for linear attention.

Flax re-designs of the reference's trainable feature-map zoo
(``mhla_nlp/fla/modules/feature_map.py:38-300``). The stateless maps
(relu/elu/dpfp/...) live in ``mhla_tpu.ops.feature_maps``; these carry
weights and therefore live as layers. Each map takes a per-head feature
tensor ``[..., head_dim]`` and returns ``[..., feature_dim]`` (feature_dim
may differ from head_dim — callers must size their KV states accordingly).

All upper-triangular "flattened outer product" maps use static index
tables, so everything stays jit-friendly with static shapes.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _triu_indices(n: int, offset: int = 0):
    rows, cols = np.triu_indices(n, k=offset)
    return jnp.asarray(rows), jnp.asarray(cols)


def flatten_diag_outer_product(x: jax.Array, y: jax.Array) -> jax.Array:
    """Upper triangle (incl. diagonal) of the outer product x ⊗ y, flattened."""
    z = jnp.einsum("...i,...j->...ij", x, y)
    r, c = _triu_indices(z.shape[-1], 0)
    return z[..., r, c]


def flatten_diag_outer_product_off1(x: jax.Array, y: jax.Array):
    """(strict upper triangle, diagonal) of the outer product, flattened."""
    z = jnp.einsum("...i,...j->...ij", x, y)
    n = z.shape[-1]
    r, c = _triu_indices(n, 1)
    diag = jnp.asarray(np.arange(n))
    return z[..., r, c], z[..., diag, diag]


class HedgehogFeatureMap(nn.Module):
    """Hedgehog map (arXiv:2402.04347): softmax over [2Wx, -2Wx].

    W initialized to identity (reference ``feature_map.py:54-59``); output
    dim is ``2 * head_dim``.
    """

    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        w = self.param(
            "kernel",
            lambda _rng, s: jnp.eye(s, dtype=jnp.float32),
            self.head_dim,
        )
        b = self.param("bias", nn.initializers.zeros, (self.head_dim,))
        h = (x.astype(jnp.float32) @ w + b)
        return jax.nn.softmax(
            jnp.concatenate([2 * h, -2 * h], axis=-1), axis=-1
        ).astype(self.dtype)


class T2RFeatureMap(nn.Module):
    """Finetuning-Transformers-to-RNNs map (arXiv:2103.13076): relu(Wx)."""

    head_dim: int
    dot_dim: Optional[int] = None
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Dense(
            self.dot_dim or self.head_dim,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="proj",
        )(x)
        return jax.nn.relu(h)


class HadamardFeatureMap(nn.Module):
    """Elementwise product of two learned projections: (W1 x) * (W2 x)."""

    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h1 = nn.Dense(self.head_dim, dtype=self.dtype, name="proj1")(x)
        h2 = nn.Dense(self.head_dim, dtype=self.dtype, name="proj2")(x)
        return h1 * h2


class LearnableOuterProductFeatureMap(nn.Module):
    """Flattened outer product of two learned projections.

    Output dim is ``feature_dim * (feature_dim + 1) / 2`` (upper triangle
    incl. diagonal — reference ``feature_map.py:134-146``).
    """

    head_dim: int
    feature_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h1 = nn.Dense(
            self.feature_dim, use_bias=False, dtype=self.dtype, name="proj1"
        )(x)
        h2 = nn.Dense(
            self.feature_dim, use_bias=False, dtype=self.dtype, name="proj2"
        )(x)
        return flatten_diag_outer_product(h1, h2)


class LearnablePolySketchNonNegativeFeatureMap(nn.Module):
    """PolySketch map (reference ``feature_map.py:150-188``): layernorm, then
    log2(degree)-1 rounds of sketch1*sketch2 products, then a final p=2
    self outer product guaranteeing non-negativity."""

    head_dim: int
    sketch_size: Optional[int] = None
    degree: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert self.degree >= 2 and (self.degree & (self.degree - 1)) == 0, (
            f"degree {self.degree} must be a power of 2"
        )
        sketch = self.sketch_size or self.head_dim
        gamma = self.param("gamma", nn.initializers.ones, (self.head_dim,))
        beta = self.param("beta", nn.initializers.zeros, (self.head_dim,))
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        h = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * gamma + beta).astype(
            self.dtype
        )
        scale = self.head_dim**-0.5
        n_rounds = max(int(math.log2(self.degree)) - 1, 1)
        for i in range(n_rounds):
            s1 = nn.Dense(
                sketch, use_bias=False, dtype=self.dtype, name=f"sketch1_{i}"
            )(h)
            s2 = nn.Dense(
                sketch, use_bias=False, dtype=self.dtype, name=f"sketch2_{i}"
            )(h)
            h = s1 * s2 * scale
        return flatten_diag_outer_product(h, h)


class TaylorFeatureMap(nn.Module):
    """2nd-order Taylor expansion of exp(q.k): [1, x/√√d, x⊗x terms]."""

    head_dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        rd = math.sqrt(self.head_dim)
        rrd = math.sqrt(rd)
        x2_off, x2_diag = flatten_diag_outer_product_off1(x, x)
        return jnp.concatenate(
            [
                jnp.ones_like(x[..., :1]),
                x / rrd,
                x2_diag / (rd * math.sqrt(2)),
                x2_off / rd,
            ],
            axis=-1,
        )


class RebasedFeatureMap(nn.Module):
    """Rebased map: learnable affine (+optional layernorm), then flattened
    quadratic features (reference ``feature_map.py:207-247``)."""

    head_dim: int
    use_gamma: bool = True
    use_beta: bool = True
    normalize: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, flatten: bool = True) -> jax.Array:
        gamma = (
            self.param("gamma", nn.initializers.ones, (self.head_dim,))
            if self.use_gamma
            else None
        )
        beta = (
            self.param("beta", nn.initializers.zeros, (self.head_dim,))
            if self.use_beta
            else None
        )
        xf = x.astype(jnp.float32)
        if self.normalize:
            mu = xf.mean(-1, keepdims=True)
            var = ((xf - mu) ** 2).mean(-1, keepdims=True)
            xf = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
            if gamma is not None:
                xf = xf * gamma
            if beta is not None:
                xf = xf + beta
        elif gamma is not None:
            xf = xf * gamma + (beta if beta is not None else 0.0)
        else:
            raise ValueError(
                "RebasedFeatureMap needs normalize or use_gamma set"
            )
        if not flatten:
            return xf.astype(x.dtype)
        x2_off, x2_diag = flatten_diag_outer_product_off1(xf, xf)
        out = jnp.concatenate(
            [
                x2_diag * self.head_dim**-0.5,
                x2_off * (2 / self.head_dim) ** 0.5,
            ],
            axis=-1,
        )
        return out.astype(x.dtype)


LEARNABLE_FEATURE_MAPS = {
    "hedgehog": HedgehogFeatureMap,
    "t2r": T2RFeatureMap,
    "hadamard": HadamardFeatureMap,
    "learnable_outer_product": LearnableOuterProductFeatureMap,
    "polysketch": LearnablePolySketchNonNegativeFeatureMap,
    "taylor": TaylorFeatureMap,
    "rebased": RebasedFeatureMap,
}


def feature_map_output_dim(name: str, head_dim: int, **kwargs) -> int:
    """Static output dimension of a learnable feature map (KV-state sizing)."""
    if name == "hedgehog":
        return 2 * head_dim
    if name == "t2r":
        return kwargs.get("dot_dim") or head_dim
    if name == "hadamard":
        return head_dim
    if name == "learnable_outer_product":
        fd = kwargs["feature_dim"]
        return fd * (fd + 1) // 2
    if name == "polysketch":
        sk = kwargs.get("sketch_size") or head_dim
        return sk * (sk + 1) // 2
    if name == "taylor":
        return 1 + head_dim + head_dim * (head_dim + 1) // 2
    if name == "rebased":
        # diag (d) + strict upper triangle (d(d-1)/2)
        return head_dim * (head_dim + 1) // 2
    raise NotImplementedError(name)
