"""Query/key feature maps for linear attention.

Functional equivalents of the reference's feature-map zoo
(``mhla_nlp/fla/modules/feature_map.py:38-300`` and the inline choices in
``fla/layers/mhla.py:113-146``). The MHLA headline config uses ``relu``
(``configs/mhla_340M.json:8``). This module holds the stateless maps; the
parameterized/learnable maps (hedgehog, t2r, hadamard, outer-product,
polysketch, taylor, rebased) live in
``mhla_tpu.layers.feature_maps`` since they carry weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

def relu_map(x: jax.Array) -> jax.Array:
    return jax.nn.relu(x)


def elu_map(x: jax.Array) -> jax.Array:
    return jax.nn.elu(x) + 1.0


def identity_map(x: jax.Array) -> jax.Array:
    return x


def softmax_map(x: jax.Array) -> jax.Array:
    return jax.nn.softmax(x, axis=-1)


def exp_map(x: jax.Array) -> jax.Array:
    return jnp.exp(x - jax.lax.stop_gradient(jnp.max(x, axis=-1, keepdims=True)))


def dpfp_map(x: jax.Array, nu: int = 1) -> jax.Array:
    """Deterministic Parameter-Free Projection (DPFP) feature map."""
    x_pos_neg = jnp.concatenate([jax.nn.relu(x), jax.nn.relu(-x)], axis=-1)
    rolled = jnp.concatenate(
        [jnp.roll(x_pos_neg, shift=-(j + 1), axis=-1) for j in range(nu)], axis=-1
    )
    tiled = jnp.concatenate([x_pos_neg] * nu, axis=-1)
    return tiled * rolled


def t2r_map(x: jax.Array) -> jax.Array:
    """Transformers-to-RNNs style map without the learned projection."""
    return jax.nn.relu(x)


FEATURE_MAPS = {
    "relu": relu_map,
    "elu": elu_map,
    "identity": identity_map,
    "softmax": softmax_map,
    "exp": exp_map,
    "dpfp": dpfp_map,
    "t2r": t2r_map,
}


def get_feature_map(name: str | None):
    if name is None:
        return identity_map
    if name not in FEATURE_MAPS:
        raise NotImplementedError(f"Not supported feature map `{name}`.")
    return FEATURE_MAPS[name]
