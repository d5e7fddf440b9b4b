"""Wan checkpoint conversion test: synthesize a torch-shaped state dict,
convert, and verify the model runs with the loaded params (and that MHLA
layers inherited the attention projections)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mhla_tpu.models.convert_wan import convert_wan_checkpoint
from mhla_tpu.models.wan import WanConfig, WanModel

CFG = WanConfig(
    dim=48, ffn_dim=96, num_heads=4, num_layers=2, text_len=8, text_dim=32,
    in_dim=4, out_dim=4, block_layout=(2, 2, 2), linear_attn_idx=(0,),
    attn_type="mhla_uni", remat=False,
)


def synth_state(rng):
    d, f = CFG.dim, CFG.ffn_dim
    s = {}

    def lin(key, nin, nout, bias=True):
        s[key + ".weight"] = rng.standard_normal((nout, nin), np.float32) * 0.02
        if bias:
            s[key + ".bias"] = np.zeros(nout, np.float32)

    s["patch_embedding.weight"] = rng.standard_normal(
        (d, CFG.in_dim, 1, 2, 2), np.float32
    ) * 0.02
    s["patch_embedding.bias"] = np.zeros(d, np.float32)
    lin("text_embedding.0", CFG.text_dim, d)
    lin("text_embedding.2", d, d)
    lin("time_embedding.0", CFG.freq_dim, d)
    lin("time_embedding.2", d, d)
    lin("time_projection.1", d, 6 * d)
    lin("head.head", d, 1 * 2 * 2 * CFG.out_dim)
    s["head.modulation"] = rng.standard_normal((1, 2, d), np.float32) * 0.02
    for i in range(CFG.num_layers):
        p = f"blocks.{i}."
        for mod in ("self_attn", "cross_attn"):
            for proj in ("q", "k", "v", "o"):
                lin(p + f"{mod}.{proj}", d, d)
            s[p + f"{mod}.norm_q.weight"] = np.ones(d, np.float32)
            s[p + f"{mod}.norm_k.weight"] = np.ones(d, np.float32)
        s[p + "norm3.weight"] = np.ones(d, np.float32)
        s[p + "norm3.bias"] = np.zeros(d, np.float32)
        lin(p + "ffn.0", d, f)
        lin(p + "ffn.2", f, d)
        s[p + "modulation"] = rng.standard_normal((1, 6, d), np.float32) * 0.02
    return s


class TestConvertWan:
    @pytest.mark.slow
    def test_convert_and_run(self, key):
        model = WanModel(CFG)
        x = jnp.zeros((1, 4, 8, 8, 4))
        ctx = jnp.zeros((1, 8, 32))
        init_params = model.init(key, x, jnp.zeros(1), ctx)

        state = synth_state(np.random.default_rng(0))
        params = convert_wan_checkpoint(state, CFG, init_params)

        # structure compatible: apply must run
        out = model.apply(params, x, jnp.array([500.0]), ctx)
        assert out.shape == (1, 4, 8, 8, 4)
        assert np.isfinite(np.asarray(out)).all()

        # MHLA layer 0 inherited q from the checkpoint, with the rotate-half
        # RoPE feature permutation applied to the output features
        from mhla_tpu.models.convert_wan import rope_feature_permutation

        perm = rope_feature_permutation(CFG.dim, CFG.num_heads)
        np.testing.assert_allclose(
            np.asarray(params["params"]["blocks_0"]["self_attn"]["q"]["kernel"]),
            state["blocks.0.self_attn.q.weight"].T[:, perm],
        )
        # and kept a fresh gate from init_params
        assert "g" in params["params"]["blocks_0"]["self_attn"]
        # softmax layer 1 got everything from the checkpoint
        np.testing.assert_allclose(
            np.asarray(params["params"]["blocks_1"]["self_attn"]["o"]["kernel"]),
            state["blocks.1.self_attn.o.weight"].T,
        )

    def test_convert_mlla(self, key):
        """MLLA layers: st_conv/lepe_conv depthwise weights map through
        (torch Conv2d [C,1,3,3] -> flax [3,3,1,C]; Conv1d [C,1,3] -> [3,1,C])."""
        import dataclasses

        cfg = dataclasses.replace(CFG, attn_type="mllalepe")
        model = WanModel(cfg)
        x = jnp.zeros((1, 4, 8, 8, 4))
        ctx = jnp.zeros((1, 8, 32))
        init_params = model.init(key, x, jnp.zeros(1), ctx)

        rng = np.random.default_rng(2)
        state = synth_state(rng)
        for conv in ("st_conv", "lepe_conv"):
            p = f"blocks.0.self_attn.{conv}."
            state[p + "spatial_conv.weight"] = (
                rng.standard_normal((CFG.dim, 1, 3, 3), np.float32) * 0.1
            )
            state[p + "spatial_conv.bias"] = np.zeros(CFG.dim, np.float32)
            state[p + "temporal_conv.weight"] = (
                rng.standard_normal((CFG.dim, 1, 3), np.float32) * 0.1
            )
            state[p + "temporal_conv.bias"] = np.zeros(CFG.dim, np.float32)

        params = convert_wan_checkpoint(state, cfg, init_params)
        out = model.apply(params, x, jnp.array([500.0]), ctx)
        assert out.shape == (1, 4, 8, 8, 4)
        assert np.isfinite(np.asarray(out)).all()
        got = params["params"]["blocks_0"]["self_attn"]["st_conv"]
        np.testing.assert_allclose(
            np.asarray(got["spatial_conv"]["kernel"]),
            state["blocks.0.self_attn.st_conv.spatial_conv.weight"].transpose(
                2, 3, 1, 0
            ),
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

    def test_param_tree_structure_matches_init(self, key):
        model = WanModel(CFG)
        x = jnp.zeros((1, 4, 8, 8, 4))
        ctx = jnp.zeros((1, 8, 32))
        init_params = model.init(key, x, jnp.zeros(1), ctx)
        params = convert_wan_checkpoint(
            synth_state(np.random.default_rng(1)), CFG, init_params
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
