"""ViT + DiT model tests and diffusion math tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mhla_tpu.diffusion import (
    GaussianDiffusion,
    create_diffusion,
    flow_euler_sample_loop,
    flow_q_sample,
    flow_training_loss,
    logit_normal_timesteps,
    make_beta_schedule,
    space_timesteps,
)
from mhla_tpu.models.dit import DiT, DiTConfig, build_dit
from mhla_tpu.models.vit import MHLAViT, ViTConfig, build_vit
from mhla_tpu.utils.testing import assert_close


class TestViT:
    @pytest.mark.parametrize("attn", ["mhla", "linear", "softmax"])
    def test_forward(self, key, attn):
        cfg = ViTConfig(
            img_size=64, patch_size=8, embed_dim=64, depth=2, num_heads=2,
            piece_size=2, num_classes=10, attn_type=attn,
        )
        model = MHLAViT(cfg)
        imgs = jax.random.normal(key, (2, 64, 64, 3))
        logits, _ = model.init_with_output(key, imgs)
        assert logits.shape == (2, 10)
        assert np.isfinite(np.asarray(logits)).all()

    def test_input_padding(self, key):
        cfg = ViTConfig(
            img_size=64, patch_size=8, embed_dim=64, depth=1, num_heads=2,
            piece_size=2, num_classes=10,
        )
        model = MHLAViT(cfg)
        imgs = jax.random.normal(key, (1, 56, 56, 3))  # smaller than img_size
        logits, _ = model.init_with_output(key, imgs)
        assert logits.shape == (1, 10)

    def test_registry(self):
        model, cfg = build_vit("deit_tiny_mhla", img_size=64, patch_size=8,
                               piece_size=2, depth=2)
        assert cfg.embed_dim == 192 and cfg.attn_type == "mhla"


class TestDiT:
    def test_forward_shapes(self, key):
        cfg = DiTConfig(input_size=16, patch_size=2, in_channels=4,
                        hidden_size=64, depth=2, num_heads=2, block_size=4,
                        num_classes=10)
        model = DiT(cfg)
        x = jax.random.normal(key, (2, 16, 16, 4))
        t = jnp.array([3, 7])
        y = jnp.array([1, 2])
        out, params = model.init_with_output(
            {"params": key, "label_dropout": key}, x, t, y
        )
        assert out.shape == (2, 16, 16, 8)  # learn_sigma doubles channels

    def test_zero_init_final(self, key):
        cfg = DiTConfig(input_size=16, patch_size=2, hidden_size=64, depth=1,
                        num_heads=2, block_size=4, num_classes=10)
        model = DiT(cfg)
        x = jnp.zeros((1, 16, 16, 4))
        out, params = model.init_with_output(
            {"params": key, "label_dropout": key}, x, jnp.zeros(1, jnp.int32),
            jnp.zeros(1, jnp.int32),
        )
        # adaLN-zero: with zeroed final linear the output must be exactly 0
        assert float(jnp.abs(out).max()) == 0.0

    def test_cfg_guidance(self, key):
        cfg = DiTConfig(input_size=16, patch_size=4, hidden_size=64, depth=1,
                        num_heads=2, block_size=4, num_classes=10)
        model = DiT(cfg)
        x = jax.random.normal(key, (4, 16, 16, 4))
        t = jnp.zeros(4, jnp.int32)
        y = jnp.array([1, 2, 10, 10])  # second half = null class
        params = model.init({"params": key, "label_dropout": key}, x, t, y)
        out = model.forward_with_cfg(params, x, t, y, cfg_scale=4.0)
        assert out.shape == (4, 16, 16, 8)
        # guided eps identical across the two halves
        assert_close("cfg halves", out[:2, ..., :4], out[2:, ..., :4], 1e-6)

    def test_registry_names(self):
        model, cfg = build_dit("DiT-S/2", input_size=16, block_size=4)
        assert cfg.hidden_size == 384 and cfg.depth == 12

    def test_finetune_convert_from_standard_dit(self, key):
        """Standard-DiT checkpoint finetune conversion (attn.qkv -> to_qkv,
        MHLA params fresh; reference mhla_dit/train.py:206-231)."""
        import numpy as np

        from mhla_tpu.models.convert_dit import convert_dit_checkpoint

        cfg = DiTConfig(input_size=16, patch_size=2, in_channels=4,
                        hidden_size=64, depth=2, num_heads=2, block_size=4,
                        num_classes=10)
        model = DiT(cfg)
        x = jax.random.normal(key, (1, 16, 16, 4))
        t = jnp.zeros(1, jnp.int32)
        y = jnp.zeros(1, jnp.int32)
        init_params = model.init({"params": key, "label_dropout": key}, x, t, y)

        rng = np.random.default_rng(0)
        d = cfg.hidden_size
        s = {}

        def lin(name, nin, nout):
            s[name + ".weight"] = rng.standard_normal((nout, nin), np.float32) * 0.02
            s[name + ".bias"] = np.zeros(nout, np.float32)

        s["x_embedder.proj.weight"] = rng.standard_normal(
            (d, 4, 2, 2), np.float32) * 0.02
        s["x_embedder.proj.bias"] = np.zeros(d, np.float32)
        lin("t_embedder.mlp.0", 256, d)
        lin("t_embedder.mlp.2", d, d)
        s["y_embedder.embedding_table.weight"] = rng.standard_normal(
            (cfg.num_classes + 1, d), np.float32) * 0.02
        for i in range(cfg.depth):
            lin(f"blocks.{i}.attn.qkv", d, 3 * d)
            lin(f"blocks.{i}.attn.proj", d, d)
            lin(f"blocks.{i}.adaLN_modulation.1", d, 6 * d)
            lin(f"blocks.{i}.mlp.fc1", d, 4 * d)
            lin(f"blocks.{i}.mlp.fc2", 4 * d, d)
        lin("final_layer.adaLN_modulation.1", d, 2 * d)
        lin("final_layer.linear", d, 2 * 2 * 8)

        params = convert_dit_checkpoint(s, cfg, init_params)
        params = jax.tree.map(jnp.asarray, params)
        out = model.apply(params, x, t, y)
        assert out.shape == (1, 16, 16, 8)
        assert bool(jnp.isfinite(out).all())
        # checkpoint projections inherited, MHLA mixing stayed fresh
        import numpy.testing as npt
        npt.assert_allclose(
            np.asarray(params["params"]["blocks_0"]["attn"]["to_qkv"]["kernel"]),
            s["blocks.0.attn.qkv.weight"].T,
        )
        ref_paths = {
            jax.tree_util.keystr(p)
            for p, _ in jax.tree_util.tree_flatten_with_path(init_params)[0]
        }
        got_paths = {
            jax.tree_util.keystr(p)
            for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]
        }
        assert ref_paths == got_paths


class TestDiffusion:
    def test_q_sample_interpolates(self, key):
        diff, _ = create_diffusion(None, learn_sigma=False)
        x0 = jnp.ones((2, 4, 4, 3))
        noise = jnp.zeros_like(x0)
        x_t = diff.q_sample(x0, jnp.array([0, 999]), noise)
        # at t=0 nearly x0; at t=999 nearly 0 (alpha_bar -> 0)
        assert float(x_t[0].mean()) == pytest.approx(1.0, abs=1e-2)
        assert abs(float(x_t[1].mean())) < 0.25

    def test_training_losses_epsilon(self, key):
        diff, _ = create_diffusion(None, learn_sigma=True)

        def perfect_model(x_t, t, noise=None):
            return jnp.concatenate([noise, jnp.zeros_like(noise)], axis=-1)

        x0 = jax.random.normal(key, (2, 8, 8, 4))
        rng = jax.random.PRNGKey(1)
        noise = jax.random.normal(rng, x0.shape, x0.dtype)
        losses = diff.training_losses(
            lambda x_t, t, **kw: perfect_model(x_t, t, noise=noise),
            x0, jnp.array([10, 500]), rng,
        )
        assert float(losses["mse"].max()) < 1e-8  # perfect eps prediction

    def test_respacing(self):
        t_map = space_timesteps(1000, 250)
        assert len(t_map) == 250 and t_map[0] == 0

    def test_p_sample_loop_runs(self, key):
        diff, t_map = create_diffusion("4", learn_sigma=True)

        def model(x, t, **kw):
            return jnp.concatenate([jnp.zeros_like(x), jnp.zeros_like(x)], -1)

        out = diff.p_sample_loop(model, (1, 8, 8, 3), key, timestep_map=t_map)
        assert out.shape == (1, 8, 8, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_ddim_deterministic(self, key):
        diff, t_map = create_diffusion("4", learn_sigma=False)

        def model(x, t, **kw):
            return 0.1 * x

        o1 = diff.ddim_sample_loop(model, (1, 8, 8, 3), key, timestep_map=t_map)
        o2 = diff.ddim_sample_loop(model, (1, 8, 8, 3), key, timestep_map=t_map)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


class TestFlow:
    def test_flow_q_sample_endpoints(self, key):
        x0 = jnp.ones((2, 4, 4, 3))
        noise = -jnp.ones_like(x0)
        at0 = flow_q_sample(x0, jnp.array([0.0, 0.0]), noise)
        at1 = flow_q_sample(x0, jnp.array([1.0, 1.0]), noise)
        assert_close("t=0", x0, at0, 1e-6)
        assert_close("t=1", noise, at1, 1e-6)

    def test_flow_loss_perfect_velocity(self, key):
        x0 = jax.random.normal(key, (2, 4, 4, 3))
        rng = jax.random.PRNGKey(3)
        noise = jax.random.normal(rng, x0.shape, x0.dtype)
        out = flow_training_loss(
            lambda x_t, t, **kw: noise - x0, x0,
            jnp.array([0.3, 0.8]), rng,
        )
        assert float(out["loss"].max()) < 1e-8

    def test_logit_normal_range(self, key):
        t = logit_normal_timesteps(key, 1000)
        assert float(t.min()) > 0 and float(t.max()) < 1
        assert 0.3 < float(t.mean()) < 0.7

    def test_flow_euler_integrates_linear_field(self, key):
        """With v(x,t) = noise - x0 constant, euler integration from noise
        recovers x0 exactly."""
        x0_true = jnp.full((1, 4, 4, 2), 0.7)

        def model(x, t):
            # true velocity field for linear flow: v = (x - x0)/t
            tt = t.reshape(-1, 1, 1, 1)
            return (x - x0_true) / jnp.maximum(tt, 1e-6)

        out = flow_euler_sample_loop(model, (1, 4, 4, 2), key, num_steps=64)
        assert_close("euler", x0_true, out, 0.15)
