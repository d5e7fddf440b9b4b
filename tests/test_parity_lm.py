"""Block- and model-level goldens against the reference NLP stack.

Runs the reference's REAL ``fla/layers/mhla.py`` + ``modeling_gla.py``
(GLABlock / GLAForCausalLM) on CPU via :mod:`ref_fla_loader` (Triton
kernel dispatchers swapped for the in-file torch reference functions), and
compares against ``mhla_tpu.models.gla_lm`` with copied weights.

This covers the composition seams the op-level goldens can't: fused-norm
residual placement inside GLABlock (``modeling_gla.py:131-160``), the
rotary/feature-map ordering inside the MHLA layer, final norm + tied
unembedding, and the label-shift loss (``modeling_gla.py:396-403``).
"""

import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from mhla_tpu.utils.testing import assert_close  # noqa: E402

torch = pytest.importorskip("torch")

REF_NLP = "/root/reference/mhla_nlp/fla/models/gla/modeling_gla.py"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.exists(REF_NLP), reason="reference checkout not available"
    ),
]


@pytest.fixture(scope="module")
def ref_fla():
    from ref_fla_loader import load_ref_fla

    load_ref_fla()
    import sys

    return {
        "modeling": sys.modules["fla.models.gla.modeling_gla"],
        "config": sys.modules["fla.models.gla.configuration_gla"],
    }


def _tiny_cfg(ref_fla, **over):
    kwargs = dict(
        hidden_size=64,
        expand_k=0.5,
        expand_v=1.0,
        num_heads=2,
        num_hidden_layers=2,
        feature_map="relu",
        attn_mode="chunk",
        attn_extends="mhla",
        use_short_conv=False,
        use_output_gate=True,
        fuse_norm=True,
        fuse_cross_entropy=False,
        fuse_linear_cross_entropy=False,
        hidden_ratio=4,
        intermediate_size=128,
        norm_eps=1e-6,
        vocab_size=100,
        tie_word_embeddings=True,
        max_position_embeddings=2048,
    )
    kwargs.update(over)
    return ref_fla["config"].GLAConfig(**kwargs)


def _our_cfg(**over):
    from mhla_tpu.models.gla_lm import MHLALMConfig

    kwargs = dict(
        hidden_size=64,
        expand_k=0.5,
        expand_v=1.0,
        num_heads=2,
        num_hidden_layers=2,
        feature_map="relu",
        attn_mode="chunk",
        attn_extends="mhla",
        use_short_conv=False,
        use_output_gate=True,
        hidden_ratio=4,
        intermediate_size=128,
        norm_eps=1e-6,
        vocab_size=100,
        tie_word_embeddings=True,
        max_position_embeddings=2048,
        chunk_size=64,
    )
    kwargs.update(over)
    return MHLALMConfig(**kwargs)


def _block_params_from_torch(sd, prefix=""):
    """torch GLABlock state dict -> our MHLABlock param subtree."""
    t = lambda k: np.asarray(sd[prefix + k])  # noqa: E731
    attn = {
        "q_proj": {"kernel": t("attn.q_proj.weight").T},
        "k_proj": {"kernel": t("attn.k_proj.weight").T},
        "v_proj": {"kernel": t("attn.v_proj.weight").T},
        "g_proj": {"kernel": t("attn.g_proj.weight").T},
        "o_proj": {"kernel": t("attn.o_proj.weight").T},
        "mixing_matrix": t("attn.mixing_matrix").reshape(32, 32),
        "g_norm_swish_gate": {"weight": t("attn.g_norm_swish_gate.weight")},
    }
    return {
        "attn_norm": {"weight": t("attn_norm.weight")},
        "attn": attn,
        "mlp_norm": {"weight": t("mlp_norm.weight")},
        "mlp": {
            "gate_proj": {"kernel": t("mlp.gate_proj.weight").T},
            "up_proj": {"kernel": t("mlp.up_proj.weight").T},
            "down_proj": {"kernel": t("mlp.down_proj.weight").T},
        },
    }


class TestGLABlockGolden:
    def test_block_forward_golden(self, ref_fla):
        """One GLABlock (attn_norm -> MHLA -> fused mlp_norm prenorm ->
        GatedMLP -> residual), T=130 crosses chunk boundaries + padding."""
        torch.manual_seed(0)
        cfg = _tiny_cfg(ref_fla)
        block = ref_fla["modeling"].GLABlock(cfg, 0).eval()
        x = torch.randn(2, 130, 64) * 0.5
        with torch.no_grad():
            o_ref = block(x)[0].numpy()

        from mhla_tpu.models.gla_lm import MHLABlock

        ocfg = _our_cfg()
        ours = MHLABlock(ocfg, 0)
        params = {
            "params": _block_params_from_torch(
                {k: v for k, v in block.state_dict().items()}
            )
        }
        o_jax, _ = ours.apply(params, jnp.asarray(x.numpy()))
        assert_close("GLABlock golden", o_ref, np.asarray(o_jax), 2e-4)

    def test_full_lm_logits_and_loss_golden(self, ref_fla):
        """GLAForCausalLM end to end: embedding -> 2 blocks -> final norm ->
        tied unembedding; plus the shifted-label CE loss
        (``modeling_gla.py:396-403``)."""
        torch.manual_seed(1)
        cfg = _tiny_cfg(ref_fla)
        model = ref_fla["modeling"].GLAForCausalLM(cfg).eval()
        ids = torch.randint(0, 100, (2, 130), generator=torch.Generator().manual_seed(2))
        with torch.no_grad():
            out = model(ids, labels=ids)
        logits_ref = out.logits.numpy()
        loss_ref = float(out.loss)

        from mhla_tpu.models.gla_lm import (
            MHLAForCausalLM,
            cross_entropy_loss,
        )

        ocfg = _our_cfg()
        ours = MHLAForCausalLM(ocfg)
        sd = {k: v for k, v in model.state_dict().items()}
        layers = {
            f"layers_{i}": _block_params_from_torch(sd, f"model.layers.{i}.")
            for i in range(cfg.num_hidden_layers)
        }
        params = {
            "params": {
                "model": {
                    "embeddings": {
                        "embedding": np.asarray(sd["model.embeddings.weight"])
                    },
                    "norm": {"weight": np.asarray(sd["model.norm.weight"])},
                    **layers,
                }
            }
        }
        logits_jax, _ = ours.apply(params, jnp.asarray(ids.numpy()))
        assert_close("LM logits golden", logits_ref, np.asarray(logits_jax), 2e-4)

        loss_jax = float(
            cross_entropy_loss(logits_jax, jnp.asarray(ids.numpy()))
        )
        assert loss_jax == pytest.approx(loss_ref, rel=1e-4)

    def test_fused_lm_loss_matches_reference_loss(self, ref_fla):
        """The fused-linear-CE training path computes the same scalar as the
        reference's shifted-label CE."""
        torch.manual_seed(3)
        cfg = _tiny_cfg(ref_fla)
        model = ref_fla["modeling"].GLAForCausalLM(cfg).eval()
        ids = torch.randint(0, 100, (1, 96), generator=torch.Generator().manual_seed(4))
        with torch.no_grad():
            loss_ref = float(model(ids, labels=ids).loss)

        from mhla_tpu.models.gla_lm import MHLAForCausalLM, fused_lm_loss

        ocfg = _our_cfg()
        ours = MHLAForCausalLM(ocfg)
        sd = {k: v for k, v in model.state_dict().items()}
        layers = {
            f"layers_{i}": _block_params_from_torch(sd, f"model.layers.{i}.")
            for i in range(cfg.num_hidden_layers)
        }
        params = {
            "params": {
                "model": {
                    "embeddings": {
                        "embedding": np.asarray(sd["model.embeddings.weight"])
                    },
                    "norm": {"weight": np.asarray(sd["model.norm.weight"])},
                    **layers,
                }
            }
        }
        params = jax.tree.map(jnp.asarray, params)
        loss_jax = float(fused_lm_loss(ours, params, jnp.asarray(ids.numpy())))
        assert loss_jax == pytest.approx(loss_ref, rel=1e-4)
