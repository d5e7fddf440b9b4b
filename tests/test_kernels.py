"""Kernel tests (CPU: XLA fallback paths + custom_vjp correctness; the
Pallas paths themselves are exercised on TPU by bench.py and the verify
drives)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mhla_tpu.kernels import flash_attention, mhla_chunk_fused
from mhla_tpu.ops import init_causal_mixing_matrix, mhla_chunk
from mhla_tpu.utils.testing import assert_close


class TestFlashAttention:
    def test_matches_sdpa(self, key):
        q = jax.random.normal(key, (2, 64, 4, 32))
        k = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 4, 32))
        v = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 4, 32))
        o = flash_attention(q, k, v, causal=True)
        ref = jax.nn.dot_product_attention(q, k, v, is_causal=True)
        assert_close("flash", ref, o, 1e-5)


class TestFusedChunk:
    @pytest.mark.parametrize("t", [64, 192, 200])
    def test_matches_reference_op(self, key, t):
        q, k = jax.nn.relu(jax.random.normal(key, (2, t, 3, 16))), None
        k = jax.nn.relu(jax.random.normal(jax.random.PRNGKey(1), (2, t, 3, 16)))
        v = jax.random.normal(jax.random.PRNGKey(2), (2, t, 3, 24))
        m = init_causal_mixing_matrix(8)
        o_ref, s_ref = mhla_chunk(q, k, v, m, output_final_state=True)
        o_fused, s_fused = mhla_chunk_fused(q, k, v, m, output_final_state=True)
        assert_close("fused fwd", o_ref, o_fused, 1e-5)
        assert_close("fused state", s_ref, s_fused, 1e-5)

    def test_gradients_match(self, key):
        q = jax.nn.relu(jax.random.normal(key, (1, 128, 2, 16)))
        k = jax.nn.relu(jax.random.normal(jax.random.PRNGKey(1), (1, 128, 2, 16)))
        v = jax.random.normal(jax.random.PRNGKey(2), (1, 128, 2, 16))
        m = init_causal_mixing_matrix(4)

        def loss_ref(q, k, v, m):
            return jnp.sum(mhla_chunk(q, k, v, m)[0] ** 2)

        def loss_fused(q, k, v, m):
            return jnp.sum(mhla_chunk_fused(q, k, v, m)[0] ** 2)

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, m)
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, m)
        for a, b, name in zip(g_ref, g_fused, "qkvm"):
            assert_close(f"grad {name}", a, b, 1e-4)


class TestPallasInterpret:
    """Run the real kernel bodies (fwd + bwd) in Pallas interpret mode on
    CPU and compare against the jnp op — validates indexing/masking/
    accumulation that the _core_xla fallback path would otherwise hide.
    Pallas-compatible shapes required: chunk %% 8 == 0, head dims %% 128."""

    @pytest.fixture(autouse=True)
    def _force_interpret(self):
        from mhla_tpu.kernels import mhla_chunk_pallas as mod

        mod.FORCE_INTERPRET = True
        yield
        mod.FORCE_INTERPRET = False

    # t = 781 spans 13 chunks -> padded to 16 (4 supertiles of G=4), so the
    # far virtual-key path, the near in-supertile path, and both padding
    # seams (token and chunk axis) are all exercised.
    def test_forward_matches_op(self, key):
        b, t, h, d = 2, 781, 2, 128
        q = jax.nn.relu(jax.random.normal(key, (b, t, h, d)))
        k = jax.nn.relu(jax.random.normal(jax.random.PRNGKey(1), (b, t, h, d)))
        v = jax.random.normal(jax.random.PRNGKey(2), (b, t, h, d))
        m = init_causal_mixing_matrix(13)
        o_ref, _ = mhla_chunk(q, k, v, m)
        o_pal, _ = mhla_chunk_fused(q, k, v, m)
        assert_close("pallas fwd", o_ref, o_pal, 1e-5)

    def test_backward_matches_op(self, key):
        b, t, h, d = 2, 640, 2, 128
        q = jax.nn.relu(jax.random.normal(key, (b, t, h, d)))
        k = jax.nn.relu(jax.random.normal(jax.random.PRNGKey(1), (b, t, h, d)))
        v = jax.random.normal(jax.random.PRNGKey(2), (b, t, h, d))
        m = init_causal_mixing_matrix(10)

        def loss(fn, *args):
            return jnp.sum(jnp.cos(fn(*args)[0]))

        g_ref = jax.grad(lambda *a: loss(mhla_chunk, *a), argnums=(0, 1, 2, 3))(
            q, k, v, m
        )
        g_pal = jax.grad(
            lambda *a: loss(mhla_chunk_fused, *a), argnums=(0, 1, 2, 3)
        )(q, k, v, m)
        for a, b_, name in zip(g_ref, g_pal, "qkvm"):
            assert_close(f"pallas grad {name}", a, b_, 1e-4)
