"""T5 text encoder and WanVAE tests (shapes, causality, golden vs HF)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mhla_tpu.models.t5 import (
    T5Config,
    T5Encoder,
    convert_hf_umt5,
    convert_t5_checkpoint,
    relative_position_bucket,
)
from mhla_tpu.models.vae import VAEConfig, WanVAE, convert_vae_checkpoint
from mhla_tpu.utils.testing import assert_close

TINY_T5 = T5Config(
    vocab_size=64, dim=32, dim_attn=32, dim_ffn=48, num_heads=4,
    num_layers=2, num_buckets=8, shared_pos=False,
)

TINY_VAE = VAEConfig(dim=8, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
                     temporal_downsample=(True,))


class TestT5:
    def test_forward_shapes_and_mask(self, key):
        enc = T5Encoder(TINY_T5)
        ids = jax.random.randint(key, (2, 10), 0, 64)
        mask = jnp.asarray([[1] * 10, [1] * 6 + [0] * 4], bool)
        out, params = enc.init_with_output(key, ids, mask)
        assert out.shape == (2, 10, 32)
        # masked positions must not influence unmasked outputs
        ids2 = ids.at[1, 6:].set(0)
        out2 = enc.apply(params, ids2, mask)
        assert_close("t5 mask", out[1, :6], out2[1, :6], 1e-5)

    def test_bucket_function_properties(self):
        rel = np.arange(-200, 201)[None, :]
        b = relative_position_bucket(rel, num_buckets=32, max_dist=128)
        assert b.min() >= 0 and b.max() < 32
        assert b[0, 200] == 0  # rel_pos 0 -> bucket 0
        # monotone in |distance| within each direction
        left = b[0, :200][::-1]
        assert (np.diff(left.astype(int)) >= 0).all()

    def test_golden_vs_hf_umt5(self, key):
        """Converted HF UMT5 weights produce matching encodings."""
        torch = pytest.importorskip("torch")
        from transformers import UMT5Config, UMT5EncoderModel

        hf_cfg = UMT5Config(
            vocab_size=64, d_model=32, d_kv=8, d_ff=48, num_layers=2,
            num_heads=4, relative_attention_num_buckets=8,
            feed_forward_proj="gated-gelu", is_encoder_decoder=False,
            use_cache=False, tie_word_embeddings=False,
        )
        torch.manual_seed(0)
        hf = UMT5EncoderModel(hf_cfg).eval()
        ids_np = np.random.default_rng(0).integers(0, 64, (2, 12))
        with torch.no_grad():
            ref = hf(torch.tensor(ids_np)).last_hidden_state.numpy()

        state = {k: v.numpy() for k, v in hf.state_dict().items()}
        params = convert_hf_umt5(state, TINY_T5)
        enc = T5Encoder(TINY_T5)
        out = enc.apply(params, jnp.asarray(ids_np, jnp.int32))
        assert_close("umt5 golden", ref, np.asarray(out), 5e-4)

    def test_reference_naming_converter(self, key):
        """Reference-style state dict loads and produces finite outputs."""
        rng = np.random.default_rng(0)
        cfg = TINY_T5
        state = {
            "token_embedding.weight": rng.standard_normal((64, 32), np.float32),
            "norm.weight": np.ones(32, np.float32),
        }
        for i in range(cfg.num_layers):
            p = f"blocks.{i}."
            state.update({
                p + "norm1.weight": np.ones(32, np.float32),
                p + "norm2.weight": np.ones(32, np.float32),
                p + "attn.q.weight": rng.standard_normal((32, 32), np.float32) * 0.05,
                p + "attn.k.weight": rng.standard_normal((32, 32), np.float32) * 0.05,
                p + "attn.v.weight": rng.standard_normal((32, 32), np.float32) * 0.05,
                p + "attn.o.weight": rng.standard_normal((32, 32), np.float32) * 0.05,
                p + "ffn.gate.0.weight": rng.standard_normal((48, 32), np.float32) * 0.05,
                p + "ffn.fc1.weight": rng.standard_normal((48, 32), np.float32) * 0.05,
                p + "ffn.fc2.weight": rng.standard_normal((32, 48), np.float32) * 0.05,
                p + "pos_embedding.embedding.weight": rng.standard_normal(
                    (8, 4), np.float32
                ) * 0.05,
            })
        params = convert_t5_checkpoint(state, cfg)
        out = T5Encoder(cfg).apply(params, jnp.zeros((1, 8), jnp.int32))
        assert np.isfinite(np.asarray(out)).all()


class TestWanVAE:
    @pytest.mark.slow
    def test_encode_decode_shapes(self, key):
        vae = WanVAE(TINY_VAE)
        video = jax.random.normal(key, (1, 5, 16, 16, 3))  # 1+4k frames
        params = vae.init(key, video)
        z = vae.apply(params, video, method=WanVAE.encode)
        # temporal: 5 -> 1 + 4//2 = 3 (one 3d downsample); spatial /2 (one stage)
        assert z.shape == (1, 3, 8, 8, 4)
        x = vae.apply(params, z, method=WanVAE.decode)
        assert x.shape == (1, 5, 16, 16, 3)
        assert float(jnp.abs(x).max()) <= 1.0

    def test_full_scale_ratios(self, key):
        """Wan config: 81 frames, /8 spatial, 21 latent frames."""
        cfg = VAEConfig()  # dim 96, mult (1,2,4,4), temporal (F,T,T)
        vae = WanVAE(cfg)
        video_shape = jax.eval_shape(
            lambda v: WanVAE(cfg).init_with_output(
                jax.random.PRNGKey(0), v, method=WanVAE.encode
            )[0],
            jax.ShapeDtypeStruct((1, 81, 64, 64, 3), jnp.float32),
        )
        assert video_shape.shape == (1, 21, 8, 8, 16)

    @pytest.mark.slow
    def test_temporal_causality(self, key):
        """Future frames must not change earlier latents (causal convs)."""
        vae = WanVAE(TINY_VAE)
        video = jax.random.normal(key, (1, 9, 8, 8, 3))
        params = vae.init(key, video)
        z1 = vae.apply(params, video, method=WanVAE.encode)
        video2 = video.at[:, -4:].set(0.0)
        z2 = vae.apply(params, video2, method=WanVAE.encode)
        assert_close("vae causality", z1[:, :2], z2[:, :2], 1e-5)

    def test_converter_on_synthetic_torch_state(self):
        """A torch-shaped state dict converts into loadable params."""
        torch = pytest.importorskip("torch")
        cfg = TINY_VAE
        vae = WanVAE(cfg)
        video = jnp.zeros((1, 5, 8, 8, 3))
        ref_params = vae.init(jax.random.PRNGKey(0), video)

        # synthesize a torch-style state dict with matching shapes
        state = {}

        def add_conv(prefix, kern):
            kt, kh, kw, cin, cout = kern.shape if kern.ndim == 5 else (None,)*5
            if kern.ndim == 5:
                state[prefix + ".weight"] = np.moveaxis(
                    np.asarray(kern), [0, 1, 2, 3, 4], [2, 3, 4, 1, 0]
                )
            else:
                kh, kw, cin, cout = kern.shape
                state[prefix + ".weight"] = np.asarray(kern).transpose(3, 2, 0, 1)
            state[prefix + ".bias"] = np.zeros(kern.shape[-1], np.float32)

        flat = jax.tree_util.tree_flatten_with_path(ref_params["params"])[0]
        # walk our param tree and emit the reference names per converter rules
        import re

        name_map = {
            "conv1": "residual.2", "conv2": "residual.6",
            "norm1": "residual.0", "norm2": "residual.3",
        }
        for path, leaf in flat:
            keys = [getattr(k, "key", "") for k in path]
            side = keys[0]
            if side in ("encoder", "decoder"):
                mod = keys[1]
                m = re.match(r"(downsamples|upsamples|middle)_(\d+)", mod)
                if m:
                    base = f"{side}.{m.group(1)}.{m.group(2)}"
                    inner = keys[2]
                    if inner in name_map and keys[-1] == "gamma":
                        state[f"{base}.{name_map[inner]}.gamma"] = np.asarray(
                            leaf
                        ).reshape(-1, 1, 1, 1)
                    elif inner in name_map:
                        add_conv(f"{base}.{name_map[inner]}", leaf) if keys[-1] == "kernel" else None
                    elif inner == "shortcut" and keys[-1] == "kernel":
                        add_conv(f"{base}.shortcut", leaf)
                    elif inner == "norm":
                        state[f"{base}.norm.gamma"] = np.asarray(leaf).reshape(-1, 1, 1)
                    elif inner in ("to_qkv", "proj"):
                        if keys[-1] == "kernel":
                            state[f"{base}.{inner}.weight"] = np.asarray(leaf).T[
                                ..., None, None
                            ]
                        else:
                            state[f"{base}.{inner}.bias"] = np.asarray(leaf)
                    elif inner in ("conv", "time_conv") and keys[-1] == "kernel":
                        name = "resample.1" if inner == "conv" else "time_conv"
                        add_conv(f"{base}.{name}", leaf)
                elif mod == "conv1" and keys[-1] == "kernel":
                    add_conv(f"{side}.conv1", leaf)
                elif mod == "head_norm":
                    state[f"{side}.head.0.gamma"] = np.asarray(leaf).reshape(-1, 1, 1, 1)
                elif mod == "head_conv" and keys[-1] == "kernel":
                    add_conv(f"{side}.head.2", leaf)
            elif side in ("conv1", "conv2") and keys[-1] == "kernel":
                add_conv(side, leaf)

        converted = convert_vae_checkpoint(state, cfg)
        # structure must match and every kernel round-trips
        ref_flat = jax.tree_util.tree_flatten_with_path(ref_params["params"])[0]
        conv_tree = converted["params"]
        matched = 0
        for path, leaf in ref_flat:
            keys = [getattr(k, "key", "") for k in path]
            node = conv_tree
            ok = True
            for k in keys:
                if k not in node:
                    ok = False
                    break
                node = node[k]
            if ok and keys[-1] == "kernel":
                np.testing.assert_allclose(np.asarray(leaf), node, rtol=1e-6)
                matched += 1
        assert matched > 10  # all conv kernels round-tripped
