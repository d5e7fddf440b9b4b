"""End-to-end toy-scale runs of the inference/eval CLIs (VERDICT r1 #9)."""

import json
import os

import numpy as np
import pytest


@pytest.mark.slow
class TestVideoInferCLI:
    def test_prompts_to_latents(self, tmp_path):
        from mhla_tpu.eval.video_infer_cli import main

        txt = tmp_path / "prompts.txt"
        txt.write_text("a cat\na dog\n")
        out = main([
            f"--txt_file={txt}",
            f"--out_dir={tmp_path}/out",
            "--num_layers=1", "--dim=48", "--num_heads=4", "--ffn_dim=96",
            "--text_dim=32", "--text_len=8",
            "--sampling.latent_shape=(4, 8, 8, 16)",
            "--sampling.num_steps=2",
            "--sampling.solver=unipc",
            "--bf16=false",
        ])
        assert len(out["outputs"]) == 2
        for item in out["outputs"]:
            lat = np.load(item["path"])
            assert lat.shape == (4, 8, 8, 16)
            assert np.isfinite(lat).all()
        assert os.path.exists(out["manifest"])

    def test_live_t5_encoding(self, tmp_path):
        """--t5_dir end-to-end: prompts tokenize + encode in-process, no
        emb_file needed (reference ``inference.py:206``; VERDICT r2 #4)."""
        from mhla_tpu.eval.video_infer_cli import main

        t5_dir = _make_tiny_t5_dir(tmp_path / "t5", dim=32, text_len=8)
        txt = tmp_path / "prompts.txt"
        txt.write_text("a cat playing piano\n")
        out = main([
            f"--txt_file={txt}",
            f"--out_dir={tmp_path}/out",
            f"--t5_dir={t5_dir}",
            "--num_layers=1", "--dim=48", "--num_heads=4", "--ffn_dim=96",
            "--text_dim=32", "--text_len=8",
            "--sampling.latent_shape=(4, 8, 8, 16)",
            "--sampling.num_steps=2",
            "--bf16=false",
        ])
        lat = np.load(out["outputs"][0]["path"])
        assert lat.shape == (4, 8, 8, 16) and np.isfinite(lat).all()


def _make_tiny_t5_dir(path, dim, text_len):
    """Tiny offline t5_dir: msgpack params + byte-level tokenizer + config."""
    import jax
    import jax.numpy as jnp
    import transformers
    from flax import serialization
    from tokenizers import Tokenizer, models, pre_tokenizers

    from mhla_tpu.models.t5 import T5Config, T5Encoder

    path.mkdir(parents=True)
    cfg = T5Config(vocab_size=300, dim=dim, dim_attn=dim, dim_ffn=2 * dim,
                   num_heads=4, num_layers=1)
    variables = T5Encoder(cfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, text_len), jnp.int32)
    )
    (path / "params.msgpack").write_bytes(serialization.msgpack_serialize(
        serialization.to_state_dict(variables)
    ))
    vocab = {chr(i) if i >= 32 else f"<{i}>": i for i in range(300)}
    t = Tokenizer(models.WordLevel(vocab, unk_token="<1>"))
    t.pre_tokenizer = pre_tokenizers.Split("", "isolated")
    tok = transformers.PreTrainedTokenizerFast(tokenizer_object=t)
    tok.pad_token = tok.convert_ids_to_tokens(0)
    tok.save_pretrained(path / "tokenizer")
    import dataclasses as dc
    import json

    (path / "config.json").write_text(json.dumps(
        {k: v for k, v in dc.asdict(cfg).items() if k != "dtype"}
    ))
    return path


@pytest.mark.slow
class TestFIDCLI:
    def test_latent_npz(self, tmp_path):
        from mhla_tpu.eval.fid_cli import main

        out = main([
            "--model_name=DiT-S/2",
            "--input_size=8", "--block_size=4", "--num_classes=10",
            "--depth=1", "--hidden_size=32", "--num_heads=2",
            "--num_samples=4", "--batch_size=2",
            "--num_sampling_steps=3",
            f"--out={tmp_path}/samples.npz",
        ])
        arr = np.load(out["npz"])["arr_0"]
        assert arr.shape == (4, 8, 8, 4)  # latent-space npz (no VAE)
        assert arr.dtype == np.uint8


@pytest.mark.slow
class TestPPLCLI:
    def test_tokens_report(self, tmp_path):
        from mhla_tpu.eval.ppl_cli import main

        rng = np.random.default_rng(0)
        shard = tmp_path / "tokens.npy"
        np.save(shard, rng.integers(0, 64, 2048, dtype=np.int32))
        report = main([
            f"--tokens={shard}",
            "--block_size=512", "--bucket_size=128",
            "--vocab_size=64", "--hidden_size=32",
            "--num_hidden_layers=1", "--num_heads=2",
            "--bf16=false",
            f"--out={tmp_path}/report.json",
        ])
        assert "ppl" in report or "perplexity" in report
        saved = json.loads((tmp_path / "report.json").read_text())
        assert saved == report
