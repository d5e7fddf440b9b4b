"""Tests for the fla-module tail: token_shift, fused KL-div, GRPO.

Reference semantics: ``mhla_nlp/fla/modules/token_shift.py`` (delta vs the
previous token, cache for decode, cu_seqlens resets), ``fused_kl_div.py``
(chunked KL(teacher || student) without materializing logits), ``grpo.py``
(``grpo_loss_torch`` oracle). The reference modules import triton at module
scope so they cannot be loaded on CPU; these tests pin the math against
jnp/numpy oracles implementing the documented formulas instead.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mhla_tpu.ops import fused_kl_div_loss, grpo_loss, token_shift


class TestTokenShift:
    def test_basic_delta(self, key):
        x = jax.random.normal(key, (2, 5, 8))
        y = token_shift(x)
        np.testing.assert_allclose(
            np.asarray(y[:, 0]), np.asarray(-x[:, 0]), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(y[:, 1:]), np.asarray(x[:, :-1] - x[:, 1:]), rtol=1e-6
        )

    def test_cache_decode_chaining(self, key):
        """Two chunked calls threaded through the cache == one full call."""
        x = jax.random.normal(key, (2, 8, 4))
        y_full, cache_full = token_shift(x, output_cache=True)
        y0, c0 = token_shift(x[:, :5], output_cache=True)
        y1, c1 = token_shift(x[:, 5:], cache=c0, output_cache=True)
        np.testing.assert_allclose(
            np.asarray(jnp.concatenate([y0, y1], axis=1)),
            np.asarray(y_full), rtol=1e-6,
        )
        np.testing.assert_allclose(np.asarray(c1), np.asarray(cache_full))
        np.testing.assert_allclose(np.asarray(cache_full), np.asarray(x[:, -1]))

    def test_segment_reset(self, key):
        """Packed varlen row == documents shifted separately."""
        x = jax.random.normal(key, (1, 10, 4))
        ids = jnp.asarray([[0, 0, 0, 0, 1, 1, 1, 2, 2, 2]])
        y = token_shift(x, segment_ids=ids)
        for s, e in ((0, 4), (4, 7), (7, 10)):
            np.testing.assert_allclose(
                np.asarray(y[:, s:e]), np.asarray(token_shift(x[:, s:e])),
                rtol=1e-6,
            )

    def test_cache_and_segments_exclusive(self, key):
        x = jax.random.normal(key, (1, 4, 2))
        with pytest.raises(ValueError):
            token_shift(
                x, segment_ids=jnp.zeros((1, 4), jnp.int32),
                cache=jnp.zeros((1, 2)),
            )


class TestFusedKLDiv:
    def _naive(self, x, tx, w, tw):
        sl = x @ w.T
        tl = tx @ tw.T
        sp_log = jax.nn.log_softmax(sl, -1)
        tp_log = jax.nn.log_softmax(tl, -1)
        return jnp.sum(jnp.exp(tp_log) * (tp_log - sp_log)) / x.shape[0]

    def test_matches_naive(self, key):
        ks = jax.random.split(key, 4)
        n, h, v = 10, 8, 32
        x = jax.random.normal(ks[0], (n, h))
        tx = jax.random.normal(ks[1], (n, h))
        w = jax.random.normal(ks[2], (v, h))
        tw = jax.random.normal(ks[3], (v, h))
        fused = fused_kl_div_loss(x, tx, w, tw, chunk_size=4)  # pads 10 -> 12
        naive = self._naive(x, tx, w, tw)
        assert float(jnp.abs(fused - naive)) < 1e-5

    def test_zero_when_identical(self, key):
        x = jax.random.normal(key, (6, 8))
        w = jax.random.normal(jax.random.PRNGKey(1), (16, 8))
        assert float(fused_kl_div_loss(x, x, w, w, chunk_size=4)) < 1e-6

    def test_grads_match_naive(self, key):
        ks = jax.random.split(key, 4)
        n, h, v = 6, 4, 12
        x = jax.random.normal(ks[0], (n, h))
        tx = jax.random.normal(ks[1], (n, h))
        w = jax.random.normal(ks[2], (v, h))
        tw = jax.random.normal(ks[3], (v, h))
        g_fused = jax.grad(
            lambda x_, w_: fused_kl_div_loss(x_, tx, w_, tw, chunk_size=4),
            argnums=(0, 1),
        )(x, w)
        g_naive = jax.grad(
            lambda x_, w_: self._naive(x_, tx, w_, tw), argnums=(0, 1)
        )(x, w)
        for a, b, name in zip(g_naive, g_fused, ("dx", "dw")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5, err_msg=name
            )


class TestGRPO:
    def _setup(self, key, b=4, t=6, v=16):
        ks = jax.random.split(key, 4)
        logits = jax.random.normal(ks[0], (b, t, v))
        ids = jax.random.randint(ks[1], (b, t), 0, v)
        ref_logp = -jnp.abs(jax.random.normal(ks[2], (b, t - 1)))
        adv = jax.random.normal(ks[3], (b,))
        return logits, ids, ref_logp, adv

    def test_value_matches_oracle(self, key):
        logits, ids, ref_logp, adv = self._setup(key)
        beta = 0.1
        loss = grpo_loss(logits, ref_logp, ids, adv, beta=beta)
        # numpy oracle (grpo_loss_torch, grpo.py:328-349)
        lg = np.asarray(logits, np.float64)[:, :-1]
        lp_all = lg - jax.nn.logsumexp(jnp.asarray(lg), axis=-1, keepdims=True)
        lp = np.take_along_axis(
            np.asarray(lp_all), np.asarray(ids)[:, 1:, None], axis=-1
        )[..., 0]
        ref = np.asarray(ref_logp, np.float64)
        kl = np.exp(ref - lp) - (ref - lp) - 1
        want = -(np.asarray(adv)[:, None] - beta * kl)  # ratio value == 1
        np.testing.assert_allclose(np.asarray(loss), want, atol=1e-5)

    def test_save_kl_and_mask(self, key):
        logits, ids, ref_logp, adv = self._setup(key)
        mask = (jnp.arange(5)[None, :] < jnp.asarray([3, 5, 2, 4])[:, None])
        loss, kl = grpo_loss(
            logits, ref_logp, ids, adv, completion_mask=mask, save_kl=True
        )
        assert loss.shape == kl.shape == (4, 5)
        assert np.all(np.asarray(loss)[~np.asarray(mask)] == 0.0)
        assert np.all(np.asarray(kl)[~np.asarray(mask)] == 0.0)
        assert np.all(np.asarray(kl)[np.asarray(mask)] >= 0.0)  # k3 >= 0

    def test_policy_gradient_direction(self, key):
        """d loss / d logits carries advantage * d(-logp): for a positive
        advantage the gradient at the taken token is negative (push up)."""
        logits, ids, ref_logp, _ = self._setup(key, b=1)
        adv = jnp.asarray([2.0])

        def scalar_loss(z):
            return grpo_loss(z, ref_logp, ids, adv, beta=0.0).sum()

        g = jax.grad(scalar_loss)(logits)
        taken = np.take_along_axis(
            np.asarray(g[:, :-1]), np.asarray(ids)[:, 1:, None], axis=-1
        )[..., 0]
        assert np.all(taken < 0.0)
        # beta=0: gradient == -adv * d logp; rows sum to zero over vocab
        np.testing.assert_allclose(
            np.asarray(g[:, :-1]).sum(-1), 0.0, atol=1e-5
        )
