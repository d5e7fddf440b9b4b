"""Radial block-sparse attention: mask structure, splash-kernel parity
(interpret mode on CPU), and Wan model wiring incl. the t>=850 dense
fallback."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mhla_tpu.kernels.sparse_attention import (
    radial_mask_dense,
    radial_window,
    sparse_flash_attention,
)
from mhla_tpu.utils.testing import assert_close


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


class TestRadialMask:
    def test_structure(self):
        frames, hw = 8, 32
        t = frames * hw
        m = radial_mask_dense(t, frames)
        assert m.shape == (t, t) and m.dtype == np.bool_
        # symmetric; full attention on/next to the frame diagonal
        assert (m == m.T).all()
        assert m[: 2 * hw, : 2 * hw].all()
        # bandwidth halves per octave of frame distance
        q = 0  # spatial index 0 of frame 0
        for f_dist, win in [(2, hw // 2), (4, hw // 4)]:
            row = m[q, f_dist * hw : (f_dist + 1) * hw]
            assert row[: win].all() and not row[win:].any()
            assert radial_window(np.array(f_dist), hw) == win

    def test_nlogn_density(self):
        # each octave of frame distance contributes ~2 frame-equivalents of
        # edges, so density ~ 2*log2(F)/F — check the log scaling law
        hw = 16
        dens = {}
        for frames in (16, 64):
            t = frames * hw
            m = radial_mask_dense(t, frames)
            dens[frames] = m.sum() / m.size
        assert dens[16] < 0.60
        assert dens[64] < 0.25  # ~2*6/64, far below dense 1.0

    def test_padding_rows_self_only(self):
        frames, hw = 4, 16
        t = frames * hw
        m = radial_mask_dense(t, frames, pad_to=t + 13)
        assert m.shape == (t + 13, t + 13)
        pad = m[t:, :]
        assert pad.sum() == 13 and np.diagonal(m)[t:].all()


class TestSparseFlashParity:
    def _oracle(self, q, k, v, frames):
        t = q.shape[1]
        mask = jnp.asarray(radial_mask_dense(t, frames))
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q * (q.shape[-1] ** -0.5), k,
            preferred_element_type=jnp.float32,
        )
        logits = jnp.where(mask[None, None], logits, -1e30)
        p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v)

    def test_splash_interpret_matches_oracle(self, key):
        from mhla_tpu.kernels import sparse_attention as mod

        b, frames, hw, h, d = 1, 4, 64, 2, 128
        t = frames * hw
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (b, t, h, d))
        k = jax.random.normal(kk, (b, t, h, d))
        v = jax.random.normal(kv, (b, t, h, d))
        ref = self._oracle(q, k, v, frames)
        mod.FORCE_INTERPRET = True
        try:
            out = sparse_flash_attention(
                q, k, v, num_frames=frames, compute_dtype=jnp.float32
            )
            out_bf16 = sparse_flash_attention(q, k, v, num_frames=frames)
        finally:
            mod.FORCE_INTERPRET = False
        assert_close("splash vs masked sdpa", ref, out, 2e-5)
        # production default casts fp32 inputs to bf16 kernel streams
        assert out_bf16.dtype == q.dtype
        assert_close("splash bf16 vs masked sdpa", ref, out_bf16, 2e-2)

    @pytest.mark.parametrize(
        "frames,hw",
        [(4, 640), pytest.param(8, 568, marks=pytest.mark.slow)],
    )
    def test_radial_kernel_interpret_matches_oracle(self, key, frames, hw):
        """The custom analytic-mask forward kernel (the TPU production
        forward), including the q/kv padding rows (hw=568 pads 4544->4608
        on both axes)."""
        from mhla_tpu.kernels.sparse_attention import radial_flash_attention

        t = frames * hw
        b, h, d = 1, 2, 128
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (b, t, h, d))
        k = jax.random.normal(kk, (b, t, h, d))
        v = jax.random.normal(kv, (b, t, h, d))
        ref = self._oracle(q, k, v, frames)
        out = radial_flash_attention(
            q, k, v, frames, compute_dtype=jnp.float32, interpret=True
        )
        assert_close("radial kernel vs masked sdpa", ref, out, 2e-5)

    def test_splash_backward_matches_oracle(self, key):
        """The differentiable path (the radial custom_vjp's backward rides
        splash's vjp — regression for the missing backward-block sizes)."""
        from mhla_tpu.kernels import sparse_attention as mod

        frames, hw = 4, 256
        t = frames * hw
        b, h, d = 1, 2, 128
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (b, t, h, d))
        k = jax.random.normal(kk, (b, t, h, d))
        v = jax.random.normal(kv, (b, t, h, d))

        def loss_splash(q, k, v):
            o = mod._splash_attention(
                q, k, v, frames, d**-0.5, jnp.float32, interpret=True
            )
            return jnp.sum(o**2)

        def loss_ref(q, k, v):
            return jnp.sum(self._oracle(q, k, v, frames) ** 2)

        g1 = jax.grad(loss_splash, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_, n in zip(g1, g2, "qkv"):
            assert_close(f"splash d{n} vs oracle", b_, a, 2e-5)

    @pytest.mark.slow
    def test_radial_schedule_is_conservative(self):
        """Every allowed token pair must fall inside a scheduled tile."""
        from mhla_tpu.kernels.sparse_attention import _radial_schedule

        t, frames, bq, bk = 4544, 8, 256, 256
        sched, nsteps, full = _radial_schedule(t, frames, bq, bk)
        mask = radial_mask_dense(t, frames)
        nk = (t + bk - 1) // bk
        covered = np.zeros((sched.shape[0], nk), bool)
        for i in range(sched.shape[0]):
            covered[i, sched[i, : nsteps[i]]] = True
        for i in range(sched.shape[0]):
            for j in range(nk):
                blk = mask[i * bq : (i + 1) * bq, j * bk : (j + 1) * bk]
                if blk.any():
                    assert covered[i, j], (i, j)
        # and the `full` flag must never cover a disallowed real pair
        for i in range(sched.shape[0]):
            for sidx in range(nsteps[i]):
                if full[i, sidx]:
                    j = sched[i, sidx]
                    blk = mask[i * bq : (i + 1) * bq, j * bk : (j + 1) * bk]
                    assert blk.all(), (i, int(j))


class TestWanSparseWiring:
    def test_layer_attn_type_schedule(self):
        from mhla_tpu.models.wan import WanConfig

        cfg = WanConfig(
            num_layers=4, linear_attn_idx=(0,), sparse_attn_idx=(1, 2)
        )
        assert [cfg.layer_attn_type(i) for i in range(4)] == [
            "mhla_uni", "sparse", "sparse", "flash",
        ]

    @pytest.mark.slow
    def test_sparse_model_forward_and_dense_guard(self, key):
        import dataclasses

        from mhla_tpu.models.wan import WanConfig, WanModel

        cfg = WanConfig(
            dim=48,
            ffn_dim=96,
            num_heads=4,
            num_layers=2,
            text_len=8,
            text_dim=32,
            in_dim=4,
            out_dim=4,
            linear_attn_idx=None,
            sparse_attn_idx=(0, 1),
            remat=False,
        )
        kx, kc = jax.random.split(key)
        x = jax.random.normal(kx, (1, 4, 8, 8, cfg.in_dim))
        ctx = jax.random.normal(kc, (1, cfg.text_len, cfg.text_dim))
        model = WanModel(cfg)
        params = model.init(key, x, jnp.array([100.0]), ctx)
        out_sparse = model.apply(params, x, jnp.array([100.0]), ctx)
        assert np.isfinite(np.asarray(out_sparse)).all()

        # t >= 850 switches the sparse layers to dense attention: the output
        # must match a config with no sparsity at the same timestep
        dense_cfg = dataclasses.replace(cfg, sparse_attn_idx=None)
        out_guard = model.apply(params, x, jnp.array([900.0]), ctx)
        out_dense = WanModel(dense_cfg).apply(params, x, jnp.array([900.0]), ctx)
        assert_close("t>=850 dense fallback", out_dense, out_guard, 1e-5)
        # and below the threshold the sparse mask is actually active
        out_low = model.apply(params, x, jnp.array([100.0]), ctx)
        out_low_dense = WanModel(dense_cfg).apply(
            params, x, jnp.array([100.0]), ctx
        )
        assert float(jnp.abs(out_low - out_low_dense).max()) > 1e-4
