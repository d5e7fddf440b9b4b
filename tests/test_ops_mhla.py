"""Core operator tests: chunked vs loop oracle, chunked vs recurrent,
blockwise properties, mixing matrices, rotary."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mhla_tpu.ops import (
    apply_rotary,
    apply_rotary_interleaved,
    block_mixing_matrix,
    clamp_causal_mixing_matrix,
    init_causal_mixing_matrix,
    init_mhla_state,
    mhla_blockwise,
    mhla_chunk,
    mhla_chunk_ref,
    mhla_recurrent,
    rope_angles_3d,
    rotary_cos_sin,
    state_from_chunk,
)
from mhla_tpu.utils.testing import assert_close


def qkv(key, b, t, h, dk, dv, positive=False):
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (b, t, h, dk))
    k = jax.random.normal(k2, (b, t, h, dk))
    v = jax.random.normal(k3, (b, t, h, dv))
    if positive:
        q, k = jax.nn.relu(q) + 1e-6, jax.nn.relu(k) + 1e-6
    return q, k, v


class TestChunk:
    @pytest.mark.parametrize("t", [64, 128, 256, 100, 37])
    def test_chunk_matches_loop_oracle(self, key, t):
        q, k, v = qkv(key, 2, t, 3, 16, 24)
        m = init_causal_mixing_matrix(32)
        o_fast, _ = mhla_chunk(q, k, v, m, chunk_size=64)
        o_ref, _ = mhla_chunk_ref(q, k, v, m, chunk_size=64)
        assert_close("chunk", o_ref, o_fast, 1e-5)

    def test_final_state(self, key):
        q, k, v = qkv(key, 1, 200, 2, 8, 8)
        m = init_causal_mixing_matrix(8)
        _, s_fast = mhla_chunk(q, k, v, m, output_final_state=True)
        _, s_ref = mhla_chunk_ref(q, k, v, m, output_final_state=True)
        assert s_fast.shape == (1, 2, 4, 8, 8)  # ceil(200/64) = 4 chunks
        assert_close("state", s_ref, s_fast, 1e-5)

    def test_learned_matrix_clamp(self):
        m = jnp.array([[2.0, 0.5], [-1.0, 0.3]])
        c = clamp_causal_mixing_matrix(m)
        assert c[0, 1] == 0.0  # upper triangle zeroed
        assert c[0, 0] == 1.0  # clamped to 1
        assert c[1, 0] == pytest.approx(1e-5)  # clamped to min

    def test_grad_flows_to_mixing_matrix(self, key):
        q, k, v = qkv(key, 1, 128, 2, 8, 8)
        m = init_causal_mixing_matrix(4)

        def loss(m):
            o, _ = mhla_chunk(q, k, v, m)
            return jnp.sum(o**2)

        g = jax.grad(loss)(m)
        assert np.isfinite(np.asarray(g)).all()
        # no gradient to the strictly upper triangle or unused chunk rows
        assert np.allclose(np.triu(np.asarray(g), k=1), 0.0)


class TestRecurrent:
    @pytest.mark.parametrize("t", [1, 63, 64, 130, 200])
    def test_recurrent_matches_chunk(self, key, t):
        q, k, v = qkv(key, 2, t, 2, 8, 12)
        m = init_causal_mixing_matrix(8)
        o_chunk, _ = mhla_chunk(q, k, v, m)
        o_rec, state = mhla_recurrent(q, k, v, m)
        assert_close(f"recurrent t={t}", o_chunk, o_rec, 1e-5)
        assert int(state.t) == t

    def test_prefill_then_decode(self, key):
        """chunk-prefill + recurrent-decode == full chunk over concat."""
        t_prefill, t_decode = 100, 30
        q, k, v = qkv(key, 1, t_prefill + t_decode, 2, 8, 8)
        m = init_causal_mixing_matrix(8)

        o_full, _ = mhla_chunk(q, k, v, m)

        qp, kp, vp = q[:, :t_prefill], k[:, :t_prefill], v[:, :t_prefill]
        o_pre, s = mhla_chunk(qp, kp, vp, m, output_final_state=True)
        state = state_from_chunk(s, t_prefill, m)

        outs = [o_pre]
        for i in range(t_decode):
            idx = t_prefill + i
            o_i, state = mhla_recurrent(
                q[:, idx : idx + 1], k[:, idx : idx + 1], v[:, idx : idx + 1], m, state
            )
            outs.append(o_i)
        o_stream = jnp.concatenate(outs, axis=1)
        assert_close("prefill+decode", o_full, o_stream, 1e-5)

    def test_init_state_shape(self):
        s = init_mhla_state(2, 4, 32, 16, 32)
        assert s.states.shape == (2, 4, 32, 16, 32)
        assert s.t.dtype == jnp.int32


class TestBlockwise:
    def test_uniform_mixing_numerator_is_global_linear_attention(self, key):
        """With M = 1/N everywhere, the unnormalized output reduces to global
        linear attention (every block sees the full KV state)."""
        b, n, c, d = 2, 4, 8, 16
        q, k, v = qkv(key, b, n * c, 1, d, d, positive=True)
        q, k, v = (x[:, :, 0].reshape(b, n, c, d) for x in (q, k, v))
        m = jnp.full((n, n), 1.0 / n)

        o = mhla_blockwise(q, k, v, m, normalize=False)

        qf, kf, vf = (x.reshape(b, n * c, d) for x in (q, k, v))
        kv = jnp.einsum("btk,btv->bkv", kf, vf) / n
        o_ref = jnp.einsum("btk,bkv->btv", qf, kv).reshape(b, n, c, d)
        assert_close("uniform blockwise", o_ref, o, 1e-5)

    def test_normalizer_mixes_queries_across_blocks(self, key):
        """The mixed normalizer follows the reference 1x1-conv semantics:
        z_i[c] = sum_j M[i,j] * (q_j[c] . k_sum_j) + eps — i.e. block i's
        denominator uses other blocks' queries at the same position
        (``mhla_dit/mhla/mhla.py:265-268``)."""
        b, n, c, d = 1, 3, 4, 8
        q, k, v = qkv(key, b, n * c, 1, d, d, positive=True)
        q, k, v = (x[:, :, 0].reshape(b, n, c, d) for x in (q, k, v))
        m = jax.random.uniform(jax.random.PRNGKey(7), (n, n)) + 0.1

        o = mhla_blockwise(q, k, v, m, eps=1e-6)

        kv = jnp.einsum("bnck,bncv->bnkv", k, v)
        kv = jnp.einsum("ij,bjkv->bikv", m, kv)
        num = jnp.einsum("bnck,bnkv->bncv", q, kv)
        z_per_block = jnp.einsum("bnck,bnk->bnc", q, jnp.sum(k, axis=2))
        z = jnp.einsum("ij,bjc->bic", m, z_per_block) + 1e-6
        assert_close("mixed normalizer", num / z[..., None], o, 1e-5)

    def test_identity_mixing_is_per_block(self, key):
        b, n, c, d = 1, 3, 4, 8
        q, k, v = qkv(key, b, n * c, 1, d, d, positive=True)
        q, k, v = (x[:, :, 0].reshape(b, n, c, d) for x in (q, k, v))
        o = mhla_blockwise(q, k, v, jnp.eye(n), eps=0.0)
        # block 0 output must not depend on block 1/2 inputs
        v2 = v.at[:, 1:].set(0.0)
        o2 = mhla_blockwise(q, k, v2, jnp.eye(n), eps=0.0)
        assert_close("block isolation", o[:, 0], o2[:, 0], 1e-6)

    def test_separate_normalizer_inputs(self, key):
        b, n, c, d = 1, 2, 4, 8
        q, k, v = qkv(key, b, n * c, 1, d, d, positive=True)
        q, k, v = (x[:, :, 0].reshape(b, n, c, d) for x in (q, k, v))
        m = jnp.full((n, n), 0.5)
        o1 = mhla_blockwise(q, k, v, m)
        o2 = mhla_blockwise(q, k, v, m, q_nope=q, k_nope=k)
        assert_close("nope defaults", o1, o2, 1e-7)

    def test_no_normalize(self, key):
        b, n, c, d = 1, 2, 4, 8
        q, k, v = qkv(key, b, n * c, 1, d, d, positive=True)
        q, k, v = (x[:, :, 0].reshape(b, n, c, d) for x in (q, k, v))
        m = jnp.eye(n)
        o = mhla_blockwise(q, k, v, m, normalize=False)
        kv = jnp.einsum("bnck,bncv->bnkv", k, v)
        assert_close("unnormalized", jnp.einsum("bnck,bnkv->bncv", q, kv), o, 1e-6)


class TestBlockMix:
    @pytest.mark.parametrize("transform", ["linear", "cos", "exp", "local"])
    def test_column_normalized(self, transform):
        m = block_mixing_matrix((4, 4), transform=transform)
        np.testing.assert_allclose(m.sum(axis=0), 1.0, rtol=1e-5)

    def test_gaussian_unnormalized_unit_diag(self):
        m = block_mixing_matrix((4, 4), transform="gaussian")
        np.testing.assert_allclose(np.diag(m), 1.0, rtol=1e-6)

    def test_3d_layout(self):
        m = block_mixing_matrix((3, 5, 10), transform="linear")
        assert m.shape == (150, 150)
        assert m.dtype == np.float32
        np.testing.assert_allclose(m.sum(axis=0), 1.0, rtol=1e-4)

    def test_symmetric_distances(self):
        from mhla_tpu.ops import block_distance_matrix

        d = block_distance_matrix((3, 4))
        np.testing.assert_allclose(d, d.T)
        assert (np.diag(d) == 0).all()

    def test_causal_init_rows(self):
        m = init_causal_mixing_matrix(4)
        np.testing.assert_allclose(np.asarray(m).sum(axis=1), 1.0, rtol=1e-6)


class TestRotary:
    def test_rotation_preserves_norm(self, key):
        x = jax.random.normal(key, (2, 16, 4, 32))
        cos, sin = rotary_cos_sin(64, 32)
        y = apply_rotary(x, cos, sin)
        assert_close(
            "norm", jnp.linalg.norm(x, axis=-1), jnp.linalg.norm(y, axis=-1), 1e-5
        )

    def test_offset_consistency(self, key):
        """Applying rotary to a suffix with offset == slicing the full result."""
        x = jax.random.normal(key, (1, 32, 2, 16))
        cos, sin = rotary_cos_sin(64, 16)
        full = apply_rotary(x, cos, sin)
        suffix = apply_rotary(x[:, 20:], cos, sin, offset=20)
        assert_close("offset", full[:, 20:], suffix, 1e-6)

    def test_relative_property(self, key):
        """q_m . k_n after rotary depends only on (m - n)."""
        d = 16
        q = jax.random.normal(key, (1, 1, 1, d))
        k = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 1, d))
        cos, sin = rotary_cos_sin(128, d)

        def dot_at(m, n):
            qm = apply_rotary(q, cos, sin, offset=m)
            kn = apply_rotary(k, cos, sin, offset=n)
            return float(jnp.sum(qm * kn))

        assert dot_at(10, 7) == pytest.approx(dot_at(50, 47), rel=1e-4)

    def test_3d_angles_shape(self):
        ang = rope_angles_3d((4, 6, 8), head_dim=64)
        assert ang.shape == (4 * 6 * 8, 32)

    def test_3d_interleaved_preserves_norm(self, key):
        x = jax.random.normal(key, (1, 24, 2, 32))
        ang = jnp.asarray(rope_angles_3d((2, 3, 4), head_dim=32), jnp.float32)
        y = apply_rotary_interleaved(x, ang)
        assert_close(
            "norm3d", jnp.linalg.norm(x, axis=-1), jnp.linalg.norm(y, axis=-1), 1e-5
        )

    def test_xpos_tables_match_reference_formula(self):
        """Tables == the fla RotaryEmbedding XPos cache
        (``mhla_nlp/fla/modules/rotary.py:395-441``) computed directly in
        numpy: scale_vec^{(t - T//2)/scale_base} times/divided into cos/sin."""
        from mhla_tpu.ops.rotary import rotary_xpos_tables

        t_len, d, base, sb = 48, 16, 10000.0, 512.0
        cq, sq, ck, sk = rotary_xpos_tables(t_len, d, base, sb)
        inv = 1.0 / (base ** (np.arange(0, d, 2, dtype=np.float64) / d))
        freqs = np.outer(np.arange(t_len, dtype=np.float64), inv)
        scale_vec = (np.arange(0, d, 2, dtype=np.float64) + 0.4 * d) / (1.4 * d)
        power = (np.arange(t_len, dtype=np.float64) - t_len // 2) / sb
        scale = scale_vec[None, :] ** power[:, None]
        np.testing.assert_allclose(np.asarray(cq), np.cos(freqs) * scale, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(sq), np.sin(freqs) * scale, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(ck), np.cos(freqs) / scale, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(sk), np.sin(freqs) / scale, rtol=1e-6)

    def test_xpos_relative_decay(self, key):
        """At d=2 (one feature pair) the XPos score factorizes exactly:
        q_m . k_n = scale^{(m-n)/scale_base} * (plain-rotary score)."""
        from mhla_tpu.ops.rotary import rotary_xpos_tables

        d, sb = 2, 64.0
        q = jax.random.normal(key, (1, 1, 1, d))
        k = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 1, d))
        cq, sq, ck, sk = rotary_xpos_tables(128, d, 10000.0, sb)
        cos, sin = rotary_cos_sin(128, d)
        s_pair = (0.0 + 0.4 * d) / (1.4 * d)

        def scores(m, n):
            qx = apply_rotary(q, cq, sq, offset=m)
            kx = apply_rotary(k, ck, sk, offset=n)
            qp = apply_rotary(q, cos, sin, offset=m)
            kp = apply_rotary(k, cos, sin, offset=n)
            return float(jnp.sum(qx * kx)), float(jnp.sum(qp * kp))

        for m, n in [(10, 3), (100, 40), (7, 7)]:
            got, plain = scores(m, n)
            assert got == pytest.approx(
                plain * s_pair ** ((m - n) / sb), rel=1e-4
            )


class TestRotaryHalvesEquivalence:
    def test_inner_products_match_interleaved(self, key):
        """The rotate-half 3D rotary equals the interleaved form composed
        with a fixed feature permutation, so all q.k bilinears match."""
        from mhla_tpu.ops.rotary import apply_rotary_3d_halves

        d = 32
        ang = jnp.asarray(rope_angles_3d((2, 3, 4), head_dim=d), jnp.float32)
        q = jax.random.normal(key, (1, 24, 2, d))
        k = jax.random.normal(jax.random.PRNGKey(1), (1, 24, 2, d))

        # interleaved form
        qi = apply_rotary_interleaved(q, ang)
        ki = apply_rotary_interleaved(k, ang)
        # halves form on permuted features (evens then odds)
        perm = jnp.concatenate([jnp.arange(0, d, 2), jnp.arange(1, d, 2)])
        qh = apply_rotary_3d_halves(q[..., perm], ang)
        kh = apply_rotary_3d_halves(k[..., perm], ang)

        # all pairwise token inner products agree
        si = jnp.einsum("bthd,bshd->bhts", qi, ki)
        sh = jnp.einsum("bthd,bshd->bhts", qh, kh)
        assert_close("rotary equivalence", si, sh, 1e-5)

    def test_halves_preserves_norm(self, key):
        from mhla_tpu.ops.rotary import apply_rotary_3d_halves

        x = jax.random.normal(key, (1, 24, 2, 32))
        ang = jnp.asarray(rope_angles_3d((2, 3, 4), head_dim=32), jnp.float32)
        y = apply_rotary_3d_halves(x, ang)
        assert_close(
            "norm", jnp.linalg.norm(x, axis=-1), jnp.linalg.norm(y, axis=-1), 1e-5
        )
