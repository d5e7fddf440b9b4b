"""LM model tests: forward, loss, decode consistency, hybrid layers, init."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mhla_tpu.models import (
    MHLAForCausalLM,
    MHLALMConfig,
    cross_entropy_loss,
    generate,
    init_lm_params,
)
from mhla_tpu.utils.testing import assert_close

TINY = MHLALMConfig(
    hidden_size=64,
    num_hidden_layers=2,
    num_heads=2,
    vocab_size=128,
    max_position_embeddings=64,
    chunk_size=16,
)


@pytest.fixture(scope="module")
def tiny_model():
    model = MHLAForCausalLM(TINY)
    ids = jnp.zeros((1, 32), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    return model, params


class TestForward:
    def test_logits_shape(self, tiny_model):
        model, params = tiny_model
        ids = jnp.arange(32, dtype=jnp.int32)[None, :] % 128
        logits, states = model.apply(params, ids)
        assert logits.shape == (1, 32, 128)
        assert states is None

    def test_causality(self, tiny_model):
        model, params = tiny_model
        key = jax.random.PRNGKey(1)
        ids = jax.random.randint(key, (1, 32), 0, 128)
        logits1, _ = model.apply(params, ids)
        ids2 = ids.at[:, 20:].set(0)
        logits2, _ = model.apply(params, ids2)
        assert_close("lm causal", logits1[:, :20], logits2[:, :20], 1e-4)

    def test_loss_finite_and_masked(self, tiny_model):
        model, params = tiny_model
        ids = jnp.arange(32, dtype=jnp.int32)[None, :] % 128
        logits, _ = model.apply(params, ids)
        labels = ids.at[:, -5:].set(-100)
        loss = cross_entropy_loss(logits, labels)
        assert np.isfinite(float(loss))
        # fully masked -> zero loss, no nan
        loss0 = cross_entropy_loss(logits, jnp.full_like(ids, -100))
        assert float(loss0) == 0.0

    def test_tied_embeddings(self, tiny_model):
        _, params = tiny_model
        assert "lm_head" not in params["params"]


class TestDecode:
    def test_prefill_decode_matches_parallel(self, tiny_model):
        model, params = tiny_model
        ids = jax.random.randint(jax.random.PRNGKey(2), (2, 24), 0, 128)
        logits_full, _ = model.apply(params, ids)

        logits_pre, states = model.apply(params, ids[:, :16], use_cache=True)
        chunks = [logits_pre]
        for i in range(16, 24):
            step_logits, states = model.apply(
                params, ids[:, i : i + 1], states, use_cache=True
            )
            chunks.append(step_logits)
        logits_stream = jnp.concatenate(chunks, axis=1)
        assert_close("lm decode", logits_full, logits_stream, 1e-4)

    def test_generate_greedy_deterministic(self, tiny_model):
        model, params = tiny_model
        ids = jnp.arange(8, dtype=jnp.int32)[None, :]
        out1 = generate(model, params, ids, max_new_tokens=8)
        out2 = generate(model, params, ids, max_new_tokens=8)
        assert out1.shape == (1, 16)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    def test_scan_decode_matches_python_loop(self, tiny_model):
        """The default fused-scan decode must equal the host-loop path
        (stop_fn=... forces the Python loop)."""
        model, params = tiny_model
        ids = jnp.arange(8, dtype=jnp.int32)[None, :]
        out_scan = generate(model, params, ids, max_new_tokens=8)
        out_loop = generate(
            model, params, ids, max_new_tokens=8, stop_fn=lambda toks: False
        )
        np.testing.assert_array_equal(np.asarray(out_scan), np.asarray(out_loop))

    def test_scan_decode_eos_padding(self, tiny_model):
        model, params = tiny_model
        ids = jnp.arange(8, dtype=jnp.int32)[None, :]
        out = generate(model, params, ids, max_new_tokens=8, eos_token_id=3)
        arr = np.asarray(out[0, 8:])
        hits = np.where(arr == 3)[0]
        if hits.size:  # everything after the first EOS stays EOS
            assert (arr[hits[0]:] == 3).all()


class TestHybrid:
    def test_softmax_layer_mix(self):
        cfg = MHLALMConfig(
            hidden_size=64,
            num_hidden_layers=3,
            num_heads=2,
            vocab_size=64,
            max_position_embeddings=64,
            chunk_size=16,
            attn={"layers": [1], "num_heads": 2},
        )
        model = MHLAForCausalLM(cfg)
        ids = jnp.zeros((1, 32), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids)
        p = params["params"]["model"]
        # layer 1 is softmax (no mixing matrix), layers 0/2 are MHLA
        assert "mixing_matrix" in p["layers_0"]["attn"]
        assert "mixing_matrix" not in p["layers_1"]["attn"]
        logits, _ = model.apply(params, ids)
        assert logits.shape == (1, 32, 64)


class TestConfigAndInit:
    def test_from_reference_json(self, tmp_path):
        import json

        ref = {
            "attn_mode": "chunk", "expand_k": 0.5, "expand_v": 1,
            "feature_map": "relu", "hidden_ratio": 4, "hidden_size": 1024,
            "model_type": "gla", "num_heads": 4, "num_hidden_layers": 24,
            "norm_eps": 1e-06, "tie_word_embeddings": True, "vocab_size": 32000,
            "use_gk": True, "bos_token_id": 1,
        }
        p = tmp_path / "cfg.json"
        p.write_text(json.dumps(ref))
        cfg = MHLALMConfig.from_json(str(p))
        assert cfg.hidden_size == 1024
        assert cfg.feature_map == "relu"
        assert cfg.num_slots == 32

    def test_reference_init_scheme(self, tiny_model):
        model, params = tiny_model
        new = init_lm_params(params, TINY, jax.random.PRNGKey(3))
        p = new["params"]["model"]["layers_0"]
        q_std = float(jnp.std(p["attn"]["q_proj"]["kernel"]))
        o_std = float(jnp.std(p["attn"]["o_proj"]["kernel"]))
        assert q_std == pytest.approx(0.02, rel=0.2)
        assert o_std == pytest.approx(0.02 / np.sqrt(2 * 2), rel=0.2)


class TestFusedLinearCE:
    def test_matches_naive(self, tiny_model):
        from mhla_tpu.models.gla_lm import fused_lm_loss

        model, params = tiny_model
        ids = jax.random.randint(jax.random.PRNGKey(9), (2, 32), 0, 128)
        logits, _ = model.apply(params, ids)
        naive = cross_entropy_loss(logits, ids)
        fused = fused_lm_loss(model, params, ids, chunk_size=16)
        assert float(jnp.abs(naive - fused)) < 1e-4

    def test_grads_match(self, tiny_model):
        from mhla_tpu.models.gla_lm import fused_lm_loss

        model, params = tiny_model
        ids = jax.random.randint(jax.random.PRNGKey(10), (1, 32), 0, 128)

        def naive_loss(p):
            logits, _ = model.apply(p, ids)
            return cross_entropy_loss(logits, ids)

        def fused_loss(p):
            return fused_lm_loss(model, p, ids, chunk_size=16)

        g1 = jax.grad(naive_loss)(params)
        g2 = jax.grad(fused_loss)(params)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

    def test_ignore_index_and_smoothing(self, key):
        from mhla_tpu.ops.losses import cross_entropy, fused_linear_cross_entropy

        h = jax.random.normal(key, (1, 8, 16))
        w = jax.random.normal(jax.random.PRNGKey(1), (32, 16))
        labels = jnp.array([[1, 2, -100, 3, -100, 4, 5, 6]])
        fused = fused_linear_cross_entropy(h, w, labels, chunk_size=4)
        logits = h @ w.T
        nll, mask = cross_entropy(logits, labels)
        assert float(jnp.abs(fused - nll.sum() / mask.sum())) < 1e-5

    def test_l2_warp_value_and_grad(self):
        """L2Wrap (fla/modules/l2warp.py): loss value unchanged, gradient
        gains a pull-to-zero term at each position's max logit."""
        from mhla_tpu.ops.losses import l2_warp

        logits = jnp.array([[[1.0, 3.0, 2.0]]])
        out = l2_warp(jnp.float32(5.0), logits, weight=1e-2)
        assert abs(float(out) - 5.0) < 1e-7
        g = jax.grad(lambda z: l2_warp(jnp.float32(5.0), z, weight=1e-2))(
            logits
        )
        # reference backward: (weight / (B*T)) * max at the argmax — no 2
        np.testing.assert_allclose(
            np.asarray(g[0, 0]), [0.0, 1e-2 * 3.0, 0.0], rtol=1e-5
        )


class TestTransformerFamily:
    def test_full_softmax_lm(self):
        cfg = MHLALMConfig(
            hidden_size=64, num_hidden_layers=2, num_heads=2, vocab_size=64,
            max_position_embeddings=64, chunk_size=16,
            attn_extends="transformer",
        )
        model = MHLAForCausalLM(cfg)
        ids = jnp.zeros((1, 32), jnp.int32)
        logits, params = model.init_with_output(jax.random.PRNGKey(0), ids)
        assert logits[0].shape == (1, 32, 64)
        p = params["params"]["model"]
        for i in range(2):
            assert "mixing_matrix" not in p[f"layers_{i}"]["attn"]
            assert "q_proj" in p[f"layers_{i}"]["attn"]


class TestAttentionMask:
    def test_right_padding_invariance(self, tiny_model):
        """Right-padded batches produce the same logits for real positions
        as the unpadded sequence."""
        model, params = tiny_model
        ids = jax.random.randint(jax.random.PRNGKey(11), (1, 20), 0, 128)
        logits_ref, _ = model.apply(params, ids)

        padded = jnp.pad(ids, ((0, 0), (0, 12)))
        mask = jnp.concatenate(
            [jnp.ones((1, 20), jnp.int32), jnp.zeros((1, 12), jnp.int32)], 1
        )
        logits_pad, _ = model.apply(params, padded, attention_mask=mask)
        assert_close("mask invariance", logits_ref, logits_pad[:, :20], 1e-4)

    def test_cached_state_excludes_padding(self, tiny_model):
        """Prefill with right padding, then decode: the cache must reflect
        only real tokens' contributions."""
        model, params = tiny_model
        ids = jax.random.randint(jax.random.PRNGKey(12), (1, 16), 0, 128)
        # reference: prefill exactly 16 real tokens
        _, states_ref = model.apply(params, ids, use_cache=True)
        # padded prefill of the same 16 tokens
        padded = jnp.pad(ids, ((0, 0), (0, 16)))
        mask = jnp.concatenate(
            [jnp.ones((1, 16), jnp.int32), jnp.zeros((1, 16), jnp.int32)], 1
        )
        _, states_pad = model.apply(
            params, padded, use_cache=True, attention_mask=mask
        )
        s_ref = states_ref[0].recurrent.states
        s_pad = states_pad[0].recurrent.states
        assert_close("masked cache", s_ref, s_pad, 1e-4)
