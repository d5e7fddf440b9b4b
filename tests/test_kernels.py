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

    def test_mix_bwd_fused_bands_cover_odd_n(self, key):
        """n=192 (> 128, not a multiple): the fixed-stride band construction
        used to leave dstates rows [128, 192) unwritten and dm rows [0, 64)
        unaccumulated — every band must clamp so the union tiles [0, n)."""
        from mhla_tpu.kernels.mhla_chunk_pallas import _mix_bwd_fused_pallas

        b, n, hdk, dv = 1, 192, 16, 128
        ks = jax.random.split(key, 3)
        m_far = jnp.tril(jax.random.normal(ks[0], (n, n)), -1)
        dout = jax.random.normal(ks[1], (b, n, hdk, dv))
        states4 = jax.random.normal(ks[2], (b, n, hdk, dv))
        out = _mix_bwd_fused_pallas(m_far.T, dout, states4)
        assert out is not None, "expected the fused path at this geometry"
        dstates, dm = out
        ds_ref = jnp.einsum("ji,bjrd->bird", m_far, dout)
        dm_ref = jnp.einsum("bird,bjrd->ij", dout, states4)
        assert_close("fused bwd dstates odd n", ds_ref, dstates, 1e-4)
        # the kernel only populates the banded lower region the caller masks
        tril = jnp.tril(jnp.ones((n, n)))
        assert_close("fused bwd dm odd n", dm_ref * tril, dm * tril, 1e-4)


class TestBlockwiseFusedInterpret:
    """Fused blockwise (vision) kernels vs the einsum op, interpret mode."""

    @pytest.fixture(autouse=True)
    def _force_interpret(self):
        from mhla_tpu.kernels import mhla_chunk_pallas as mod

        mod.FORCE_INTERPRET = True
        yield
        mod.FORCE_INTERPRET = False

    @pytest.mark.parametrize("normalize", [False, True])
    def test_matches_einsum_op(self, key, normalize):
        from mhla_tpu.kernels.mhla_block_pallas import mhla_blockwise_fused
        from mhla_tpu.ops.mhla_blockwise import mhla_blockwise_mh

        b, n, c, h, d = 2, 6, 24, 2, 128  # c deliberately not 8-multiple
        kq, kk, kv, km = jax.random.split(key, 4)
        q = jax.nn.relu(jax.random.normal(kq, (b, n, c, h * d))) + 1e-6
        k = jax.nn.relu(jax.random.normal(kk, (b, n, c, h * d))) + 1e-6
        v = jax.random.normal(kv, (b, n, c, h * d))
        m = jax.nn.softmax(jax.random.normal(km, (n, n)), axis=-1)
        ref = mhla_blockwise_mh(
            q.reshape(b, n, c, h, d),
            k.reshape(b, n, c, h, d),
            v.reshape(b, n, c, h, d),
            m, normalize=normalize,
        ).reshape(b, n, c, h * d)
        out = mhla_blockwise_fused(q, k, v, m, num_heads=h, normalize=normalize)
        assert_close("blockwise fused fwd", ref, out, 1e-5)

    def test_gradients_match_einsum_op(self, key):
        from mhla_tpu.kernels.mhla_block_pallas import mhla_blockwise_fused
        from mhla_tpu.ops.mhla_blockwise import mhla_blockwise_mh

        b, n, c, h, d = 1, 4, 16, 2, 128
        kq, kk, kv, km = jax.random.split(key, 4)
        q = jax.nn.relu(jax.random.normal(kq, (b, n, c, h * d))) + 1e-6
        k = jax.nn.relu(jax.random.normal(kk, (b, n, c, h * d))) + 1e-6
        v = jax.random.normal(kv, (b, n, c, h * d))
        m = jax.nn.softmax(jax.random.normal(km, (n, n)), axis=-1)

        def loss_fused(q, k, v, m):
            o = mhla_blockwise_fused(q, k, v, m, num_heads=h, normalize=False)
            return jnp.sum(jnp.cos(o))

        def loss_ref(q, k, v, m):
            o = mhla_blockwise_mh(
                q.reshape(b, n, c, h, d),
                k.reshape(b, n, c, h, d),
                v.reshape(b, n, c, h, d),
                m, normalize=False,
            )
            return jnp.sum(jnp.cos(o))

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, m)
        g_out = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, m)
        for a, b_, name in zip(g_ref, g_out, "qkvm"):
            assert_close(f"blockwise fused grad {name}", a, b_, 1e-4)


class TestIslandKernelsInterpret:
    """Fused island prologue/epilogue vs the composed oracle (cast ->
    RMSNorm -> relu -> RoPE -> blockify, and unblockify -> cast -> per-head
    RMSNorm), forward and gradients, interpret mode."""

    @pytest.fixture(autouse=True)
    def _force_interpret(self):
        from mhla_tpu.kernels import mhla_chunk_pallas as mod

        mod.FORCE_INTERPRET = True
        yield
        mod.FORCE_INTERPRET = False

    def _setup(self, key, dim=256, h=2, grid=(2, 4, 4), layout=(2, 2, 2)):
        from mhla_tpu.kernels.mhla_block_pallas import rope_tables_flat

        t = grid[0] * grid[1] * grid[2]
        x = jax.random.normal(key, (1, t, dim), jnp.float32)
        gamma = jax.random.normal(jax.random.PRNGKey(7), (dim,)) * 0.1 + 1.0
        tables = rope_tables_flat(grid, dim // h, h)
        return x, gamma, tables, t

    @staticmethod
    def _oracle_prologue(x, gamma, tables, grid, layout, h, eps, rope):
        from mhla_tpu.kernels.mhla_block_pallas import blockify
        from mhla_tpu.layers.norms import rms_norm

        q = rms_norm(x, gamma, eps)
        q = jax.nn.relu(q) + eps
        nope = blockify(q, None, grid, layout, h)
        roped = blockify(q, tables if rope else None, grid, layout, h)
        return roped, nope

    @pytest.mark.parametrize("rope", [True, False])
    def test_prologue_matches_composed(self, key, rope):
        from mhla_tpu.kernels.mhla_block_pallas import blockify_island

        grid, layout, h, eps = (2, 4, 4), (2, 2, 2), 2, 1e-6
        x, gamma, tables, t = self._setup(key)
        ref_rope, ref_nope = self._oracle_prologue(
            x, gamma, tables, grid, layout, h, eps, rope
        )
        out, nope = blockify_island(
            x, tables if rope else None, gamma, grid, layout, h,
            eps, eps, None, jnp.float32, rope,
        )
        assert_close("island prologue", ref_rope, out, 1e-5)
        if rope:
            assert_close("island prologue nope", ref_nope, nope, 1e-5)

    def test_prologue_no_norm_no_relu(self, key):
        from mhla_tpu.kernels.mhla_block_pallas import blockify, blockify_island

        grid, layout, h = (2, 4, 4), (2, 2, 2), 2
        x, _, _, t = self._setup(key)
        xb = x.astype(jnp.bfloat16)  # native-dtype input, fp32 out
        ref = blockify(xb.astype(jnp.float32), None, grid, layout, h)
        out, _ = blockify_island(
            xb, None, None, grid, layout, h, 1e-6, None, None,
            jnp.float32, False,
        )
        assert out.dtype == jnp.float32
        assert_close("island cast blockify", ref, out, 1e-6)

    def test_prologue_gradients(self, key):
        from mhla_tpu.kernels.mhla_block_pallas import blockify_island

        grid, layout, h, eps = (2, 4, 4), (2, 2, 2), 2, 1e-6
        x, gamma, tables, t = self._setup(key)

        def loss_fused(x, gamma):
            out, nope = blockify_island(
                x, tables, gamma, grid, layout, h, eps, eps, None,
                jnp.float32, True,
            )
            return jnp.sum(jnp.cos(out)) + jnp.sum(jnp.sin(nope))

        def loss_ref(x, gamma):
            roped, nope = self._oracle_prologue(
                x, gamma, tables, grid, layout, h, eps, True
            )
            return jnp.sum(jnp.cos(roped)) + jnp.sum(jnp.sin(nope))

        g_ref = jax.grad(loss_ref, argnums=(0, 1))(x, gamma)
        g_out = jax.grad(loss_fused, argnums=(0, 1))(x, gamma)
        for a, b_, name in zip(g_ref, g_out, ["x", "gamma"]):
            assert_close(f"island prologue grad {name}", a, b_, 1e-4)

    def test_prologue_odd_geometry(self, key):
        """Wan-like geometry: non-power-of-2 block partitions (pf=1, ph=2,
        pw=2, nw=10) exercise the w-slice indexing at realistic layouts."""
        from mhla_tpu.kernels.mhla_block_pallas import (
            blockify_island,
            rope_tables_flat,
        )

        grid, layout, h, eps = (3, 10, 20), (3, 5, 10), 2, 1e-6
        dim = 256
        t = grid[0] * grid[1] * grid[2]
        x = jax.random.normal(key, (1, t, dim), jnp.float32)
        gamma = jax.random.normal(jax.random.PRNGKey(7), (dim,)) * 0.1 + 1.0
        tables = rope_tables_flat(grid, dim // h, h)
        ref_rope, ref_nope = self._oracle_prologue(
            x, gamma, tables, grid, layout, h, eps, True
        )
        out, nope = blockify_island(
            x, tables, gamma, grid, layout, h, eps, eps, None,
            jnp.float32, True,
        )
        assert_close("island odd geometry", ref_rope, out, 1e-5)
        assert_close("island odd geometry nope", ref_nope, nope, 1e-5)

    def test_epilogue_matches_composed(self, key):
        from mhla_tpu.kernels.mhla_block_pallas import (
            rms_norm_heads_flat,
            unblockify,
            unblockify_island,
        )

        grid, layout, h, eps = (2, 4, 4), (2, 2, 2), 2, 1e-6
        dim = 256
        dh = dim // h
        n = layout[0] * layout[1] * layout[2]
        t = grid[0] * grid[1] * grid[2]
        c = t // n
        xb = jax.random.normal(key, (1, n, c, dim), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(3), (dh,)) * 0.1 + 1.0

        flat = unblockify(xb, None, grid, layout, h).astype(jnp.bfloat16)
        ref = rms_norm_heads_flat(flat, w, h, eps)
        out = unblockify_island(
            xb, w, grid, layout, h, eps, jnp.bfloat16, jnp.bfloat16
        )
        assert out.dtype == jnp.bfloat16
        assert_close("island epilogue", ref, out, 2e-3)

    def test_epilogue_gradients(self, key):
        from mhla_tpu.kernels.mhla_block_pallas import (
            rms_norm_heads_flat,
            unblockify,
            unblockify_island,
        )

        grid, layout, h, eps = (2, 4, 4), (2, 2, 2), 2, 1e-6
        dim, n = 256, 8
        dh = dim // h
        t = grid[0] * grid[1] * grid[2]
        c = t // n
        xb = jax.random.normal(key, (1, n, c, dim), jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(3), (dh,)) * 0.1 + 1.0

        def loss_fused(xb, w):
            return jnp.sum(jnp.cos(unblockify_island(
                xb, w, grid, layout, h, eps, None, jnp.float32
            )))

        def loss_ref(xb, w):
            flat = unblockify(xb, None, grid, layout, h)
            return jnp.sum(jnp.cos(rms_norm_heads_flat(flat, w, h, eps)))

        g_ref = jax.grad(loss_ref, argnums=(0, 1))(xb, w)
        g_out = jax.grad(loss_fused, argnums=(0, 1))(xb, w)
        for a, b_, name in zip(g_ref, g_out, ["xb", "w"]):
            assert_close(f"island epilogue grad {name}", a, b_, 1e-4)


class TestMHLA3DFusedPath:
    """Full MHLA3D layer: fused head-flat Pallas path (interpret) vs the
    einsum/rearrange fallback — same params, same outputs."""

    @pytest.mark.parametrize(
        "normalize_out,island_dt",
        [(False, None), (True, None), (False, "bfloat16")],
    )
    def test_paths_agree(self, key, normalize_out, island_dt):
        from mhla_tpu.kernels import mhla_chunk_pallas as mod
        from mhla_tpu.layers import MHLA3D

        dim, h = 256, 2  # head dim 128 -> fused path eligible
        grid = (2, 4, 4)
        t = grid[0] * grid[1] * grid[2]
        layer = MHLA3D(
            dim=dim, num_heads=h, blocks_layout=(2, 2, 2),
            normalize_out=normalize_out, is_gated=True,
            attn_compute_dtype=jnp.dtype(island_dt) if island_dt else None,
        )
        x = jax.random.normal(key, (1, t, dim))
        params = layer.init(jax.random.PRNGKey(1), x, grid)  # fallback path
        ref = layer.apply(params, x, grid)
        mod.FORCE_INTERPRET = True
        try:
            out = layer.apply(params, x, grid)  # fused path (interpret)
        finally:
            mod.FORCE_INTERPRET = False
        tol = 1e-5 if island_dt is None else 2e-2  # bf16 island rounding
        assert_close(f"mhla3d fused(norm={normalize_out})", ref, out, tol)

    @pytest.mark.slow
    def test_fused_path_gradients(self, key):
        from mhla_tpu.kernels import mhla_chunk_pallas as mod
        from mhla_tpu.layers import MHLA3D

        dim, h = 256, 2
        grid = (2, 4, 4)
        t = grid[0] * grid[1] * grid[2]
        layer = MHLA3D(
            dim=dim, num_heads=h, blocks_layout=(2, 2, 2), normalize_out=False
        )
        x = jax.random.normal(key, (1, t, dim))
        params = layer.init(jax.random.PRNGKey(1), x, grid)

        def loss(p, xx):
            return jnp.sum(jnp.cos(layer.apply(p, xx, grid)))

        g_ref = jax.grad(loss, argnums=(0, 1))(params, x)
        mod.FORCE_INTERPRET = True
        try:
            g_out = jax.grad(loss, argnums=(0, 1))(params, x)
        finally:
            mod.FORCE_INTERPRET = False
        ref_leaves = jax.tree.leaves(g_ref)
        out_leaves = jax.tree.leaves(g_out)
        for i, (a, b_) in enumerate(zip(ref_leaves, out_leaves)):
            assert_close(f"mhla3d fused grad leaf {i}", a, b_, 1e-4)


class TestDeltaFused:
    """Fused sequential-grid delta-rule forward vs the jnp WY op."""

    @pytest.fixture(autouse=True)
    def _force_interpret(self):
        from mhla_tpu.kernels import mhla_chunk_pallas as mod

        mod.FORCE_INTERPRET = True
        yield
        mod.FORCE_INTERPRET = False

    def _inputs(self, key, b=2, t=300, h=2, d=128, dv=None):
        ks = jax.random.split(key, 5)
        q = jax.random.normal(ks[0], (b, t, h, d))
        k = jax.random.normal(ks[1], (b, t, h, d))
        v = jax.random.normal(ks[2], (b, t, h, dv or d))
        g = -0.1 * jax.random.uniform(ks[3], (b, t, h))
        beta = jax.nn.sigmoid(jax.random.normal(ks[4], (b, t, h)))
        return q, k, v, g, beta

    @pytest.mark.slow
    def test_forward_and_state_match_op(self, key):
        from mhla_tpu.kernels.delta_chunk_pallas import gated_delta_chunk_fused
        from mhla_tpu.ops.delta_rule import gated_delta_chunk

        q, k, v, g, beta = self._inputs(key, t=300)  # odd length: padding
        o_ref, s_ref = gated_delta_chunk(
            q, k, v, g, beta, chunk_size=64, output_final_state=True
        )
        o_out, s_out = gated_delta_chunk_fused(
            q, k, v, g, beta, chunk_size=64, output_final_state=True
        )
        assert_close("delta fused fwd", o_ref, o_out, 1e-4)
        assert_close("delta fused state", s_ref, s_out, 1e-4)

    @pytest.mark.slow
    def test_initial_state_and_grads(self, key):
        from mhla_tpu.kernels.delta_chunk_pallas import gated_delta_chunk_fused
        from mhla_tpu.ops.delta_rule import gated_delta_chunk

        q, k, v, g, beta = self._inputs(key, b=1, t=128)
        s0 = jax.random.normal(jax.random.PRNGKey(9), (1, 2, 128, 128)) * 0.1
        o_ref, _ = gated_delta_chunk(q, k, v, g, beta, initial_state=s0)
        o_out, _ = gated_delta_chunk_fused(q, k, v, g, beta, initial_state=s0)
        assert_close("delta fused init-state fwd", o_ref, o_out, 1e-4)

        def loss(op, *args):
            # weigh the final state too, so the ds0/dS chain is exercised
            o, s = op(*args[:5], initial_state=args[5], output_final_state=True)
            return jnp.sum(jnp.cos(o)) + jnp.sum(jnp.sin(s))

        g_ref = jax.grad(
            lambda *a: loss(gated_delta_chunk, *a), argnums=tuple(range(6))
        )(q, k, v, g, beta, s0)
        g_out = jax.grad(
            lambda *a: loss(gated_delta_chunk_fused, *a),
            argnums=tuple(range(6)),
        )(q, k, v, g, beta, s0)
        for a, b_, name in zip(g_ref, g_out, ["q", "k", "v", "g", "beta", "s0"]):
            assert_close(f"delta fused grad {name}", a, b_, 1e-4)

    @pytest.mark.slow
    def test_asymmetric_dims_and_chunk(self, key):
        """GDN-style dv = 2*dk geometry at a non-default chunk size."""
        from mhla_tpu.kernels.delta_chunk_pallas import gated_delta_chunk_fused
        from mhla_tpu.ops.delta_rule import gated_delta_chunk

        q, k, v, g, beta = self._inputs(key, b=1, t=160, d=128, dv=256)
        o_ref, s_ref = gated_delta_chunk(
            q, k, v, g, beta, chunk_size=32, output_final_state=True
        )
        o_out, s_out = gated_delta_chunk_fused(
            q, k, v, g, beta, chunk_size=32, output_final_state=True
        )
        assert_close("delta fused dv!=dk fwd", o_ref, o_out, 1e-4)
        assert_close("delta fused dv!=dk state", s_ref, s_out, 1e-4)

        def loss(op, *args):
            o, _ = op(*args, chunk_size=32)
            return jnp.sum(jnp.cos(o))

        g_ref = jax.grad(
            lambda *a: loss(gated_delta_chunk, *a), argnums=(1, 2, 3)
        )(q, k, v, g, beta)
        g_out = jax.grad(
            lambda *a: loss(gated_delta_chunk_fused, *a), argnums=(1, 2, 3)
        )(q, k, v, g, beta)
        for a, b_, name in zip(g_ref, g_out, ["k", "v", "g"]):
            assert_close(f"delta fused dv!=dk grad {name}", a, b_, 1e-4)

    def test_grads_with_padding(self, key):
        """Odd length: the backward must keep padded-tail cotangents out."""
        from mhla_tpu.kernels.delta_chunk_pallas import gated_delta_chunk_fused
        from mhla_tpu.ops.delta_rule import gated_delta_chunk

        q, k, v, g, beta = self._inputs(key, b=1, t=200)

        def loss(op, *args):
            o, _ = op(*args)
            return jnp.sum(jnp.cos(o))

        g_ref = jax.grad(
            lambda *a: loss(gated_delta_chunk, *a), argnums=(0, 1, 2, 3, 4)
        )(q, k, v, g, beta)
        g_out = jax.grad(
            lambda *a: loss(gated_delta_chunk_fused, *a), argnums=(0, 1, 2, 3, 4)
        )(q, k, v, g, beta)
        for a, b_, name in zip(g_ref, g_out, ["q", "k", "v", "g", "beta"]):
            assert_close(f"delta fused pad grad {name}", a, b_, 1e-4)

    def test_bf16_forward_and_grads(self, key):
        """bf16 inputs exercise the cdt=bf16 kernel path (bf16 residual
        states, bf16 decay streams) that real TPU runs take; compared
        against the f32 jnp oracle on f32 copies of the same values with a
        bf16-appropriate tolerance."""
        from mhla_tpu.kernels.delta_chunk_pallas import gated_delta_chunk_fused
        from mhla_tpu.ops.delta_rule import gated_delta_chunk

        q, k, v, g, beta = self._inputs(key, b=1, t=200)
        qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
        qf, kf, vf = (x.astype(jnp.float32) for x in (qb, kb, vb))

        o_ref, s_ref = gated_delta_chunk(
            qf, kf, vf, g, beta, output_final_state=True
        )
        o_out, s_out = gated_delta_chunk_fused(
            qb, kb, vb, g, beta, output_final_state=True
        )
        assert_close("delta bf16 fwd", o_ref, o_out.astype(jnp.float32), 2e-2)
        assert_close("delta bf16 state", s_ref, s_out, 2e-2)

        def loss(op, *args):
            o, _ = op(*args)
            return jnp.sum(jnp.cos(o.astype(jnp.float32)))

        g_ref = jax.grad(
            lambda *a: loss(gated_delta_chunk, *a), argnums=(0, 1, 2, 3, 4)
        )(qf, kf, vf, g, beta)
        g_out = jax.grad(
            lambda *a: loss(gated_delta_chunk_fused, *a),
            argnums=(0, 1, 2, 3, 4),
        )(qb, kb, vb, g, beta)
        for a, b_, name in zip(g_ref, g_out, ["q", "k", "v", "g", "beta"]):
            assert_close(
                f"delta bf16 grad {name}", a, b_.astype(jnp.float32), 5e-2
            )


class TestGLAFused:
    """Fused GLA (MHLA kernels + decay recurrence) vs the jnp op."""

    @pytest.fixture(autouse=True)
    def _force_interpret(self):
        from mhla_tpu.kernels import mhla_chunk_pallas as mod

        mod.FORCE_INTERPRET = True
        yield
        mod.FORCE_INTERPRET = False

    def test_forward_matches_op(self, key):
        from mhla_tpu.kernels.gla_chunk_pallas import gla_chunk_fused
        from mhla_tpu.ops.gla_chunk import gla_chunk

        b, t, h, d = 2, 700, 2, 128  # odd length: chunk+supertile padding
        kq, kk, kv, kg = jax.random.split(key, 4)
        q = jax.nn.relu(jax.random.normal(kq, (b, t, h, d)))
        k = jax.nn.relu(jax.random.normal(kk, (b, t, h, d)))
        v = jax.random.normal(kv, (b, t, h, d))
        gk = -jax.nn.softplus(jax.random.normal(kg, (b, t, h, d))) * 0.1
        o_ref, s_ref = gla_chunk(q, k, v, gk, output_final_state=True)
        o_out, s_out = gla_chunk_fused(q, k, v, gk, output_final_state=True)
        assert_close("gla fused fwd", o_ref, o_out, 1e-4)
        assert_close("gla fused state", s_ref, s_out, 1e-4)

    def test_initial_state_and_grads(self, key):
        from mhla_tpu.kernels.gla_chunk_pallas import gla_chunk_fused
        from mhla_tpu.ops.gla_chunk import gla_chunk

        b, t, h, d = 1, 256, 2, 128
        kq, kk, kv, kg, ks = jax.random.split(key, 5)
        q = jax.nn.relu(jax.random.normal(kq, (b, t, h, d)))
        k = jax.nn.relu(jax.random.normal(kk, (b, t, h, d)))
        v = jax.random.normal(kv, (b, t, h, d))
        gk = -jax.nn.softplus(jax.random.normal(kg, (b, t, h, d))) * 0.1
        s0 = jax.random.normal(ks, (b, h, d, d)) * 0.1

        def loss(fn, *args):
            return jnp.sum(jnp.cos(fn(*args, initial_state=s0)[0]))

        o_ref, _ = gla_chunk(q, k, v, gk, initial_state=s0)
        o_out, _ = gla_chunk_fused(q, k, v, gk, initial_state=s0)
        assert_close("gla fused init-state fwd", o_ref, o_out, 1e-4)

        g_ref = jax.grad(lambda *a: loss(gla_chunk, *a), argnums=(0, 1, 2, 3))(
            q, k, v, gk
        )
        g_out = jax.grad(
            lambda *a: loss(gla_chunk_fused, *a), argnums=(0, 1, 2, 3)
        )(q, k, v, gk)
        for a, b_, name in zip(g_ref, g_out, ["q", "k", "v", "gk"]):
            assert_close(f"gla fused grad {name}", a, b_, 1e-3)

    def test_grads_with_padding(self, key):
        """Odd length (7 chunks -> supertile pad): backward keeps padded
        cotangents out of the real tokens."""
        from mhla_tpu.kernels.gla_chunk_pallas import gla_chunk_fused
        from mhla_tpu.ops.gla_chunk import gla_chunk

        b, t, h, d = 1, 448, 2, 128
        kq, kk, kv, kg = jax.random.split(key, 4)
        q = jax.nn.relu(jax.random.normal(kq, (b, t, h, d)))
        k = jax.nn.relu(jax.random.normal(kk, (b, t, h, d)))
        v = jax.random.normal(kv, (b, t, h, d))
        gk = -jax.nn.softplus(jax.random.normal(kg, (b, t, h, d))) * 0.1

        def loss(fn, *args):
            return jnp.sum(jnp.cos(fn(*args)[0]))

        g_ref = jax.grad(lambda *a: loss(gla_chunk, *a), argnums=(0, 1, 2, 3))(
            q, k, v, gk
        )
        g_out = jax.grad(
            lambda *a: loss(gla_chunk_fused, *a), argnums=(0, 1, 2, 3)
        )(q, k, v, gk)
        for a, b_, name in zip(g_ref, g_out, ["q", "k", "v", "gk"]):
            assert_close(f"gla fused pad grad {name}", a, b_, 1e-3)
