"""Wan video transformer tests (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mhla_tpu.models.wan import (
    WanConfig,
    WanModel,
    build_wan_config,
    sinusoidal_embedding_1d,
)
from mhla_tpu.utils.testing import assert_close

TINY = WanConfig(
    dim=48,
    ffn_dim=96,
    num_heads=4,
    num_layers=2,
    text_len=8,
    text_dim=32,
    in_dim=4,
    out_dim=4,
    block_layout=(2, 2, 2),
    linear_attn_idx=(0,),
    attn_type="mhla_uni",
    remat=False,
)


def tiny_inputs(key, cfg=TINY, f=4, h=8, w=8):
    kx, kc = jax.random.split(key)
    x = jax.random.normal(kx, (1, f, h, w, cfg.in_dim))
    ctx = jax.random.normal(kc, (1, cfg.text_len, cfg.text_dim))
    t = jnp.array([500.0])
    return x, t, ctx


class TestWan:
    @pytest.mark.slow
    def test_forward_shape_roundtrip(self, key):
        model = WanModel(TINY)
        x, t, ctx = tiny_inputs(key)
        out, params = model.init_with_output(key, x, t, ctx)
        # patch (1,2,2): grid = (4,4,4), divisible by layout (2,2,2) -> no crop
        assert out.shape == (1, 4, 8, 8, 4)
        assert np.isfinite(np.asarray(out)).all()

    def test_hybrid_layer_types(self, key):
        model = WanModel(TINY)
        x, t, ctx = tiny_inputs(key)
        params = model.init(key, x, t, ctx)
        p = params["params"]
        # layer 0 is MHLA (has block mixing / gating), layer 1 is softmax
        assert "g" in p["blocks_0"]["self_attn"]
        assert "norm_q" in p["blocks_1"]["self_attn"]
        assert "k_img" not in p["blocks_0"]["cross_attn"]

    def test_grid_adjust_crop(self, key):
        cfg = WanConfig(
            dim=48, ffn_dim=96, num_heads=4, num_layers=1, text_len=8,
            text_dim=32, in_dim=4, out_dim=4, block_layout=(2, 3, 5),
            linear_attn_idx=(0,), remat=False,
        )
        model = WanModel(cfg)
        # grid after patch: (4, 7, 11) -> cropped to (4, 6, 10)
        x = jax.random.normal(key, (1, 4, 14, 22, 4))
        ctx = jnp.zeros((1, 8, 32))
        out, _ = model.init_with_output(key, x, jnp.array([1.0]), ctx)
        assert out.shape == (1, 4, 12, 20, 4)

    def test_i2v_variant(self, key):
        cfg = WanConfig(
            model_type="i2v", dim=48, ffn_dim=96, num_heads=4, num_layers=1,
            text_len=8, text_dim=32, image_dim=24, in_dim=4, out_dim=4,
            block_layout=(2, 2, 2), linear_attn_idx=(), remat=False,
        )
        model = WanModel(cfg)
        x, t, ctx = tiny_inputs(key, cfg)
        clip = jnp.ones((1, 257, 24))
        out, params = model.init_with_output(key, x, t, ctx, clip)
        assert out.shape == (1, 4, 8, 8, 4)
        assert "k_img" in params["params"]["blocks_0"]["cross_attn"]

    @pytest.mark.parametrize("solver", ["flow_euler", "unipc", "sa-solver"])
    @pytest.mark.slow
    def test_i2v_sampling_with_clip_features(self, key, solver):
        """CLIP tower -> sample_video_latents wiring (CFG doubles the batch;
        clip features must tile along)."""
        from mhla_tpu.eval.video_inference import sample_video_latents
        from mhla_tpu.models.clip import (
            CLIPVisionConfig,
            CLIPVisionTransformer,
            encode_i2v_features,
        )

        vis_cfg = CLIPVisionConfig(
            image_size=14, patch_size=7, dim=24, mlp_ratio=2.0,
            num_heads=4, num_layers=2,
        )
        vit = CLIPVisionTransformer(vis_cfg)
        frame = jax.random.uniform(key, (1, 20, 20, 3), minval=-1, maxval=1)
        vit_params = vit.init(key, jnp.zeros((1, 14, 14, 3)))
        fea = encode_i2v_features(vit, vit_params, frame)  # [1, 5, 24]

        cfg = WanConfig(
            model_type="i2v", dim=48, ffn_dim=96, num_heads=4, num_layers=1,
            text_len=8, text_dim=32, image_dim=24, img_tokens=5,
            in_dim=4, out_dim=4,
            block_layout=(2, 2, 2), linear_attn_idx=(), remat=False,
        )
        model = WanModel(cfg)
        x, t, ctx = tiny_inputs(key, cfg)
        params = model.init(key, x, t, ctx, jnp.zeros((1, 5, 24)))
        lat = sample_video_latents(
            model, params, ctx, latent_shape=(4, 8, 8, 4), num_steps=2,
            solver=solver, clip_fea=fea,
        )
        assert lat.shape == (1, 4, 8, 8, 4)
        assert np.isfinite(np.asarray(lat)).all()

    def test_build_config(self):
        cfg = build_wan_config("Wan_T2V_1300M", linear_attn_idx=tuple(range(20)))
        assert cfg.dim == 1536 and cfg.num_layers == 30 and cfg.num_heads == 12
        assert cfg.layer_attn_type(0) == "mhla_uni"
        assert cfg.layer_attn_type(25) == "flash"
        with pytest.raises(ValueError):
            build_wan_config("Wan_7B")

    def test_time_embedding_convention(self):
        e = sinusoidal_embedding_1d(8, jnp.array([0.0]))
        # cos-first convention: position 0 -> cos(0)=1 for first half
        np.testing.assert_allclose(np.asarray(e)[0, :4], 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(e)[0, 4:], 0.0, atol=1e-6)

    @pytest.mark.slow
    def test_flow_training_step(self, key):
        """One flow-matching loss/grad evaluation through the Wan model."""
        from mhla_tpu.diffusion import flow_training_loss, logit_normal_timesteps

        model = WanModel(TINY)
        x, t, ctx = tiny_inputs(key)
        params = model.init(key, x, t, ctx)

        t01 = logit_normal_timesteps(key, 1)

        def loss_fn(p):
            out = flow_training_loss(
                lambda x_t, tt: model.apply(p, x_t, tt * 1000.0, ctx),
                x, t01, jax.random.PRNGKey(1),
            )
            return out["loss"].mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(loss))
        gnorm = jnp.sqrt(
            sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.tree.leaves(grads))
        )
        assert np.isfinite(float(gnorm)) and float(gnorm) > 0
