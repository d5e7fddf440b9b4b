"""8-bit optimizer state tests: quantization error bounds, training parity
with fp32 AdamW/CAME on a least-squares problem, state memory accounting."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mhla_tpu.train.came import came
from mhla_tpu.train.optim8bit import (
    BLOCK,
    Quant8,
    adamw_8bit,
    auto_scale_lr,
    dequantize_8bit,
    quantize_8bit,
)


class TestQuantization:
    def test_roundtrip_signed(self, key):
        x = jax.random.normal(key, (3, 5000))
        q = quantize_8bit(x, signed=True)
        back = dequantize_8bit(q, x.shape)
        err = float(jnp.abs(back - x).max())
        # linear int8: error bounded by scale/127 per block
        bound = float(jnp.max(jnp.abs(x))) / 127.0 + 1e-7
        assert err <= bound
        assert q.codes.dtype == jnp.int8

    def test_roundtrip_sqrt_domain(self, key):
        # decades-wide non-negative values (second-moment-like)
        x = jnp.exp(jax.random.normal(key, (5000,)) * 4.0)
        q = quantize_8bit(x, signed=False)
        back = dequantize_8bit(q, x.shape)
        assert q.codes.dtype == jnp.uint8
        # sqrt-domain: relative error of sqrt(x) <= scale/255
        rel = jnp.abs(jnp.sqrt(back) - jnp.sqrt(x)) / jnp.max(jnp.sqrt(x))
        assert float(rel.max()) <= 1.0 / 255 + 1e-6

    def test_block_padding(self):
        x = jnp.arange(BLOCK + 17, dtype=jnp.float32)
        q = quantize_8bit(x)
        assert q.codes.shape == (2, BLOCK)
        back = dequantize_8bit(q, x.shape)
        assert back.shape == x.shape


def _train(opt, key, steps=300):
    """Least squares: params [64, 100] (quantized; >= min size)."""
    k1, k2, k3 = jax.random.split(key, 3)
    target = jax.random.normal(k1, (64, 100))
    x = jax.random.normal(k2, (256, 64))
    y = x @ target
    params = {"w": jax.random.normal(k3, (64, 100)) * 0.01}
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        def loss_fn(p):
            return jnp.mean((x @ p["w"] - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, state = opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state, loss

    for _ in range(steps):
        params, state, loss = step(params, state)
    return float(loss), state


class TestAdamW8bit:
    def test_training_parity_with_fp32(self, key):
        loss8, state8 = _train(adamw_8bit(1e-2), key)
        loss32, _ = _train(optax.adamw(1e-2), key)
        assert loss8 < 2.0  # down from ~65 at init
        assert loss8 < 1.5 * loss32 + 1e-3  # quantization costs little

    def test_states_are_int8(self, key):
        _, state = _train(adamw_8bit(1e-2), key, steps=3)
        assert isinstance(state.m[0], Quant8)
        assert state.m[0].codes.dtype == jnp.int8
        assert state.v[0].codes.dtype == jnp.uint8
        # memory: codes bytes ~= param count (vs 4x for fp32)
        n_param = 64 * 100
        assert state.m[0].codes.size <= n_param + BLOCK

    def test_small_tensors_stay_fp32(self, key):
        opt = adamw_8bit(1e-2)
        params = {"b": jnp.zeros((8,))}
        state = opt.init(params)
        assert not isinstance(state.m[0], Quant8)

    def test_via_make_optimizer(self, key):
        from mhla_tpu.train.trainer import OptimizerConfig, make_optimizer

        tx = make_optimizer(
            OptimizerConfig(optimizer="adamw8bit", warmup_steps=1,
                            total_steps=10)
        )
        params = {"w": jnp.zeros((128, 64))}
        state = tx.init(params)
        g = {"w": jnp.ones((128, 64))}
        updates, _ = tx.update(g, state, params)
        assert jnp.isfinite(updates["w"]).all()


class TestCAME8bit:
    def test_training_parity(self, key):
        loss8, state8 = _train(came(1e-2, quantize_m=True), key)
        loss32, _ = _train(came(1e-2), key)
        assert loss8 < 2.0
        assert loss8 < 1.5 * loss32 + 1e-3, (loss8, loss32)
        m_leaf = jax.tree.leaves(
            state8.m, is_leaf=lambda x: isinstance(x, Quant8)
        )[0]
        assert isinstance(m_leaf, Quant8)

    def test_via_make_optimizer(self):
        from mhla_tpu.train.trainer import OptimizerConfig, make_optimizer

        tx = make_optimizer(
            OptimizerConfig(optimizer="came8bit", warmup_steps=1,
                            total_steps=10)
        )
        params = {"w": jnp.zeros((128, 64))}
        state = tx.init(params)
        g = {"w": jnp.ones((128, 64))}
        updates, _ = tx.update(g, state, params)
        assert jnp.isfinite(updates["w"]).all()


def test_auto_scale_lr():
    assert auto_scale_lr(1e-4, 512) == pytest.approx(2e-4)
    assert auto_scale_lr(1e-4, 256) == pytest.approx(1e-4)
    assert auto_scale_lr(2e-5, 64, base_batch_size=32) == pytest.approx(4e-5)
