"""CLIP/XLM-RoBERTa i2v encoder tests: shapes, golden vs HF CLIPVisionModel,
golden vs the reference torch XLM-RoBERTa, converter round trips."""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mhla_tpu.data.tokenizers import basic_clean, canonicalize, whitespace_clean
from mhla_tpu.models.clip import (
    CLIPVisionConfig,
    CLIPVisionTransformer,
    XLMRConfig,
    XLMRobertaCLIP,
    XLMRobertaEncoder,
    XLMRobertaWithHead,
    convert_clip_checkpoint,
    convert_hf_clip_vision,
    convert_xlm_roberta,
    encode_i2v_features,
    pos_interpolate,
    preprocess_frames,
)
from mhla_tpu.utils.testing import assert_close

TINY_VISION = CLIPVisionConfig(
    image_size=28, patch_size=7, dim=32, mlp_ratio=2.0, out_dim=16,
    num_heads=4, num_layers=3,
)
TINY_TEXT = XLMRConfig(
    vocab_size=64, max_seq_len=32, pad_id=1, dim=24, num_heads=4,
    num_layers=2, out_dim=16,
)

REF_XLMR = "/root/reference/mhla_videogen/diffusion/model/wan/xlm_roberta.py"


class TestVisionTower:
    def test_use_31_block_stops_early(self, key):
        vit = CLIPVisionTransformer(TINY_VISION)
        x = jax.random.normal(key, (2, 28, 28, 3))
        full, params = vit.init_with_output(key, x)
        assert full.shape == (2, 17, 32)  # 16 patches + cls
        partial = vit.apply(params, x, use_31_block=True)
        assert partial.shape == full.shape
        assert not np.allclose(np.asarray(partial), np.asarray(full))

    def test_pos_interpolate_identity_and_resize(self):
        pos = jnp.arange(1 * 17 * 8, dtype=jnp.float32).reshape(1, 17, 8)
        assert pos_interpolate(pos, 17) is pos
        out = pos_interpolate(pos, 1 + 9)  # 4x4 grid -> 3x3 grid
        assert out.shape == (1, 10, 8)
        # cls entry passes through untouched
        assert_close("cls", out[:, 0], pos[:, 0], 1e-6)

    def test_preprocess_frames(self, key):
        frames = jax.random.uniform(key, (2, 17, 23, 3), minval=-1, maxval=1)
        out = preprocess_frames(frames, image_size=28)
        assert out.shape == (2, 28, 28, 3)
        # [-1,1] maps into the CLIP-normalized range (roughly +-2)
        assert float(jnp.abs(out).max()) < 4.0

    def test_golden_vs_hf_clip_vision(self, key):
        torch = pytest.importorskip("torch")
        from transformers import CLIPVisionConfig as HFCfg
        from transformers import CLIPVisionModel

        hf_cfg = HFCfg(
            hidden_size=32, intermediate_size=64, num_hidden_layers=3,
            num_attention_heads=4, image_size=28, patch_size=7,
            hidden_act="gelu", layer_norm_eps=1e-5,
        )
        torch.manual_seed(0)
        hf = CLIPVisionModel(hf_cfg).eval()
        img = np.random.default_rng(0).standard_normal((2, 3, 28, 28)).astype(
            np.float32
        )
        with torch.no_grad():
            ref = hf(torch.tensor(img)).last_hidden_state.numpy()

        state = {k: v.numpy() for k, v in hf.state_dict().items()}
        params = convert_hf_clip_vision(state, TINY_VISION)
        out = CLIPVisionTransformer(TINY_VISION).apply(
            params, jnp.asarray(img.transpose(0, 2, 3, 1))
        )
        assert_close("clip vision golden", ref, np.asarray(out), 5e-4)

    def test_encode_i2v_features_shape(self, key):
        vit = CLIPVisionTransformer(TINY_VISION)
        frames = jax.random.uniform(key, (1, 40, 40, 3), minval=-1, maxval=1)
        params = vit.init(key, jnp.zeros((1, 28, 28, 3)))
        feats = encode_i2v_features(vit, params, frames)
        assert feats.shape == (1, 17, 32)


class TestXLMRoberta:
    def test_pad_mask_isolation(self, key):
        enc = XLMRobertaEncoder(TINY_TEXT)
        ids = jax.random.randint(key, (2, 10), 2, 64)
        ids = ids.at[1, 6:].set(1)  # pad tail
        out, params = enc.init_with_output(key, ids)
        assert out.shape == (2, 10, 24)
        # changing padded ids to other pads leaves unpadded outputs alone
        out2 = enc.apply(params, ids)
        assert_close("xlmr deterministic", out, out2, 1e-6)

    def test_head_pools_masked(self, key):
        model = XLMRobertaWithHead(TINY_TEXT)
        ids = jnp.asarray([[5, 6, 7, 1, 1]], jnp.int32)
        out, params = model.init_with_output(key, ids)
        assert out.shape == (1, 16)

    @pytest.mark.skipif(not os.path.exists(REF_XLMR), reason="no reference")
    def test_golden_vs_reference_torch(self, key):
        torch = pytest.importorskip("torch")
        spec = importlib.util.spec_from_file_location("ref_xlmr", REF_XLMR)
        ref_mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_mod)

        torch.manual_seed(0)
        ref = ref_mod.XLMRoberta(
            vocab_size=64, max_seq_len=32, type_size=1, pad_id=1, dim=24,
            num_heads=4, num_layers=2, post_norm=True, dropout=0.0,
        ).eval()
        ids = np.asarray([[5, 9, 12, 30, 1, 1], [8, 2, 4, 6, 7, 11]], np.int64)
        with torch.no_grad():
            out_ref = ref(torch.tensor(ids)).numpy()

        state = {k: v.numpy() for k, v in ref.state_dict().items()}
        params = convert_xlm_roberta(state, TINY_TEXT)
        out = XLMRobertaEncoder(TINY_TEXT).apply(
            params, jnp.asarray(ids, jnp.int32)
        )
        assert_close("xlmr golden", out_ref, np.asarray(out), 5e-4)


class TestFullCLIP:
    def test_reference_naming_roundtrip(self, key):
        """A synthetic reference-layout state dict loads and runs."""
        rng = np.random.default_rng(0)
        vis, txt = TINY_VISION, TINY_TEXT
        s = {}
        sd = lambda *shape: rng.standard_normal(shape, np.float32) * 0.05
        s["visual.patch_embedding.weight"] = sd(vis.dim, 3, 7, 7)
        s["visual.cls_embedding"] = sd(1, 1, vis.dim)
        s["visual.pos_embedding"] = sd(1, 17, vis.dim)
        s["visual.pre_norm.weight"] = np.ones(vis.dim, np.float32)
        s["visual.pre_norm.bias"] = np.zeros(vis.dim, np.float32)
        for i in range(vis.num_layers):
            p = f"visual.transformer.{i}."
            mid = int(vis.dim * vis.mlp_ratio)
            for n, shp in [
                ("norm1", None), ("norm2", None),
            ]:
                s[p + n + ".weight"] = np.ones(vis.dim, np.float32)
                s[p + n + ".bias"] = np.zeros(vis.dim, np.float32)
            s[p + "attn.to_qkv.weight"] = sd(3 * vis.dim, vis.dim)
            s[p + "attn.to_qkv.bias"] = sd(3 * vis.dim)
            s[p + "attn.proj.weight"] = sd(vis.dim, vis.dim)
            s[p + "attn.proj.bias"] = sd(vis.dim)
            s[p + "mlp.0.weight"] = sd(mid, vis.dim)
            s[p + "mlp.0.bias"] = sd(mid)
            s[p + "mlp.2.weight"] = sd(vis.dim, mid)
            s[p + "mlp.2.bias"] = sd(vis.dim)
        s["textual.token_embedding.weight"] = sd(txt.vocab_size, txt.dim)
        s["textual.type_embedding.weight"] = sd(txt.type_size, txt.dim)
        s["textual.pos_embedding.weight"] = sd(txt.max_seq_len, txt.dim)
        s["textual.norm.weight"] = np.ones(txt.dim, np.float32)
        s["textual.norm.bias"] = np.zeros(txt.dim, np.float32)
        for i in range(txt.num_layers):
            p = f"textual.blocks.{i}."
            for n in ("q", "k", "v", "o"):
                s[p + f"attn.{n}.weight"] = sd(txt.dim, txt.dim)
                s[p + f"attn.{n}.bias"] = sd(txt.dim)
            for n in ("norm1", "norm2"):
                s[p + n + ".weight"] = np.ones(txt.dim, np.float32)
                s[p + n + ".bias"] = np.zeros(txt.dim, np.float32)
            s[p + "ffn.0.weight"] = sd(4 * txt.dim, txt.dim)
            s[p + "ffn.0.bias"] = sd(4 * txt.dim)
            s[p + "ffn.2.weight"] = sd(txt.dim, 4 * txt.dim)
            s[p + "ffn.2.bias"] = sd(txt.dim)
        mid = (txt.dim + txt.out_dim) // 2
        s["textual.head.0.weight"] = sd(mid, txt.dim)
        s["textual.head.2.weight"] = sd(txt.out_dim, mid)
        s["log_scale"] = np.asarray(2.65926, np.float32)

        params = convert_clip_checkpoint(s, TINY_VISION, TINY_TEXT)
        model = XLMRobertaCLIP(TINY_VISION, TINY_TEXT)
        imgs = jnp.zeros((1, 28, 28, 3))
        ids = jnp.asarray([[5, 6, 1, 1]], jnp.int32)
        xi, xt = model.apply(params, imgs, ids)
        assert xi.shape == (1, 17, TINY_VISION.dim)
        assert xt.shape == (1, TINY_TEXT.out_dim)
        assert np.isfinite(np.asarray(xi)).all()
        assert np.isfinite(np.asarray(xt)).all()


class TestTokenizerCleaning:
    def test_whitespace_clean(self):
        assert whitespace_clean("a   b\t c\n") == "a b c"

    def test_basic_clean_unescapes(self):
        assert basic_clean("a &amp;amp; b") == "a & b"

    def test_canonicalize(self):
        assert canonicalize("Hello, World_X!") == "hello world x"
