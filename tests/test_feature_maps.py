"""Learnable feature-map layers (reference fla/modules/feature_map.py:38-300)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mhla_tpu.layers import (
    LEARNABLE_FEATURE_MAPS,
    HedgehogFeatureMap,
    TaylorFeatureMap,
    feature_map_output_dim,
)


DIM = 16


def _run(name, **kwargs):
    cls = LEARNABLE_FEATURE_MAPS[name]
    mod = cls(head_dim=DIM, **kwargs)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, DIM))
    params = mod.init(jax.random.PRNGKey(1), x)
    return mod.apply(params, x)


@pytest.mark.parametrize(
    "name,kwargs",
    [
        ("hedgehog", {}),
        ("t2r", {"dot_dim": 8}),
        ("hadamard", {}),
        ("learnable_outer_product", {"feature_dim": 8}),
        ("polysketch", {"degree": 4}),
        ("taylor", {}),
        ("rebased", {}),
    ],
)
def test_output_dims(name, kwargs):
    out = _run(name, **kwargs)
    expected = feature_map_output_dim(name, DIM, **kwargs)
    assert out.shape == (2, 3, expected)
    assert bool(jnp.isfinite(out).all())


def test_hedgehog_is_softmax_at_identity_init():
    """At init (W=I, b=0) hedgehog(x) == softmax([2x, -2x]) — a probability
    vector (non-negative, sums to 1)."""
    mod = HedgehogFeatureMap(head_dim=DIM)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, DIM))
    params = mod.init(jax.random.PRNGKey(1), x)
    out = mod.apply(params, x)
    ref = jax.nn.softmax(jnp.concatenate([2 * x, -2 * x], -1), -1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, atol=1e-6)
    assert bool((out >= 0).all())


def test_taylor_approximates_exp_kernel():
    """phi(q) . phi(k) is the 2nd-order Taylor expansion of exp(q.k/sqrt(d))."""
    mod = TaylorFeatureMap(head_dim=DIM)
    kq = jax.random.normal(jax.random.PRNGKey(2), (2, DIM)) * 0.1
    params = mod.init(jax.random.PRNGKey(1), kq)
    phi = mod.apply(params, kq)
    got = float(phi[0] @ phi[1])
    s = float(kq[0] @ kq[1]) / np.sqrt(DIM)
    expected = 1.0 + s + s**2 / 2
    assert abs(got - expected) < 1e-3, (got, expected)


def test_grads_flow():
    mod = HedgehogFeatureMap(head_dim=DIM)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, DIM))
    params = mod.init(jax.random.PRNGKey(1), x)

    def loss(p):
        return (mod.apply(p, x) ** 2).sum()

    g = jax.grad(loss)(params)
    assert all(bool(jnp.any(v != 0)) for v in jax.tree.leaves(g))
