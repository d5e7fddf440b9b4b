"""PromptEmbedder template mechanics with a tiny in-memory HF model (no
downloads): left padding, prefix skipping, per-prompt masked extraction."""

import numpy as np
import pytest

from mhla_tpu.models.qwen_embed import DEFAULT_TEMPLATE, PromptEmbedder


def _tiny_hf():
    torch = pytest.importorskip("torch")  # noqa: F841
    transformers = pytest.importorskip("transformers")
    cfg = transformers.GPT2Config(
        vocab_size=300, n_positions=512, n_embd=16, n_layer=1, n_head=2
    )
    model = transformers.GPT2LMHeadModel(cfg).eval()
    tok = transformers.PreTrainedTokenizerFast(
        tokenizer_object=_byte_tokenizer(300)
    )
    tok.pad_token = tok.convert_ids_to_tokens(0)
    return model, tok


def _byte_tokenizer(vocab_size):
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {chr(i) if i >= 32 else f"<{i}>": i for i in range(vocab_size)}
    t = Tokenizer(models.WordLevel(vocab, unk_token="<1>"))
    t.pre_tokenizer = pre_tokenizers.Split("", "isolated")
    return t


class TestPromptEmbedder:
    def test_masked_extraction_and_prefix_skip(self):
        model, tok = _tiny_hf()
        emb = PromptEmbedder(model, tok, template="SYS:{}", start_idx=None)
        # start_idx computed from the template prefix ("SYS:" -> 4 chars)
        assert emb.start_idx == 4
        outs = emb(["ab", "defg"])
        assert len(outs) == 2
        # each output holds exactly the user-text tokens (prefix dropped,
        # padding removed), independent of batch padding
        assert outs[0].shape == (2, 16)
        assert outs[1].shape == (4, 16)
        # determinism: identical call reproduces identical embeddings
        outs2 = emb(["ab", "defg"])
        np.testing.assert_allclose(outs2[0], outs[0], rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(outs2[1], outs[1], rtol=1e-6, atol=1e-6)

    def test_default_template_has_user_slot(self):
        assert DEFAULT_TEMPLATE.count("{}") == 1
