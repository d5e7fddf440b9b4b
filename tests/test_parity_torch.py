"""Golden parity tests against the PyTorch reference (when available).

Loads the reference's naive ops directly from /root/reference via importlib
(no code is copied) and compares our jnp operators on identical inputs.
Skipped when the reference checkout or torch is unavailable.
"""

import importlib.util
import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from mhla_tpu.ops import (  # noqa: E402
    block_mixing_matrix,
    init_causal_mixing_matrix,
    mhla_blockwise,
    mhla_chunk,
)
from mhla_tpu.utils.testing import assert_close  # noqa: E402

REF_NAIVE = "/root/reference/mhla_nlp/fla/ops/mhla/naive.py"
REF_DIT_MHLA = "/root/reference/mhla_dit/mhla/mhla.py"

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_NAIVE), reason="reference checkout not available"
)


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_naive():
    return _load(REF_NAIVE, "ref_naive")


class TestCausalParity:
    @pytest.mark.parametrize("t", [64, 128, 200])
    def test_chunk_golden(self, ref_naive, t):
        rng = np.random.default_rng(0)
        b, h, dk, dv = 2, 3, 16, 24
        q = rng.standard_normal((b, t, h, dk), dtype=np.float32)
        k = rng.standard_normal((b, t, h, dk), dtype=np.float32)
        v = rng.standard_normal((b, t, h, dv), dtype=np.float32)
        m = np.asarray(init_causal_mixing_matrix(32))

        # reference expects [B, T, H, D] and M of shape [L, L, 1, 1, 1, 1]
        fn = ref_naive.naive_chunk_simple_mhla_fixed
        # bypass torch.compile wrapping if present
        fn = getattr(fn, "_torchdynamo_orig_callable", fn)
        o_ref = fn(
            torch.from_numpy(q),
            torch.from_numpy(k),
            torch.from_numpy(v),
            torch.from_numpy(m.reshape(32, 32, 1, 1, 1, 1)),
            chunk_size=64,
        )
        o_ref = o_ref.detach().numpy()

        o_jax, _ = mhla_chunk(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(m))
        assert_close(f"torch-golden chunk t={t}", o_ref, np.asarray(o_jax), 2e-4)


class TestBlockwiseParity:
    def test_dit_attention_core_golden(self):
        """Compare the blockwise core against the reference MHLA4DiT math
        (kv mixing + mixed normalizer), reconstructed with torch ops on the
        same mixing matrix our block_mix produces."""
        if not os.path.exists(REF_DIT_MHLA):
            pytest.skip("dit reference missing")
        ref = _load(REF_DIT_MHLA, "ref_dit_mhla")

        rng = np.random.default_rng(1)
        bh, n, c, d = 4, 16, 16, 8
        q = np.abs(rng.standard_normal((bh, n, c, d), dtype=np.float32)) + 1e-6
        k = np.abs(rng.standard_normal((bh, n, c, d), dtype=np.float32)) + 1e-6
        v = rng.standard_normal((bh, n, c, d), dtype=np.float32)

        conv = ref.BlockDistanceConv(
            num_patches_per_side=16, patch_group_size=16, transform="linear"
        )
        m_ref = conv.get_weight_matrix().numpy()
        m_ours = block_mixing_matrix((4, 4), transform="linear")
        assert_close("mixing matrix", m_ref, m_ours, 1e-5)

        qt, kt, vt = map(torch.from_numpy, (q, k, v))
        kt_t = kt.transpose(-2, -1)
        kv = conv(torch.matmul(kt_t, vt))
        k_sum = kt_t.sum(dim=-1, keepdim=True)
        normalizer = conv(torch.matmul(qt, k_sum)) + 1e-6
        o_ref = (torch.matmul(qt, kv) / normalizer).detach().numpy()

        o_jax = mhla_blockwise(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(m_ours), eps=1e-6
        )
        assert_close("torch-golden blockwise", o_ref, np.asarray(o_jax), 2e-4)


@pytest.mark.slow
class TestDiTModuleParity:
    def test_mhla4dit_full_module_golden(self):
        """Full-module parity: reference MHLA4DiT vs MHLA2D with the same
        weights on the same input (DiT-S block shape, block_size 16)."""
        if not os.path.exists(REF_DIT_MHLA):
            pytest.skip("dit reference missing")
        ref_mod = _load(REF_DIT_MHLA, "ref_dit_mhla2")

        torch.manual_seed(0)
        dim, heads = 64, 4
        ref = ref_mod.MHLA4DiT(
            dim=dim, heads=heads, dropout=0.0, qkv_bias=True,
            transform="linear", block_size=16, embed_len=256,
        ).eval()

        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 16, 16, dim), dtype=np.float32) * 0.5
        with torch.no_grad():
            o_ref = ref(torch.from_numpy(x.copy())).numpy()

        # build the flax twin and load the torch weights
        from mhla_tpu.layers import MHLA2D

        layer = MHLA2D(
            dim=dim, num_heads=heads, blocks_per_side=4, block_len=4,
            transform="linear", trainable_mixing=True, qkv_bias=True,
            lepe_kernel=3, use_input_norm=True,
        )
        params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
        sd = {k: v.numpy() for k, v in ref.state_dict().items()}

        p = params["params"]
        p["norm"]["weight"] = jnp.asarray(sd["norm.weight"])
        p["norm"]["bias"] = jnp.asarray(sd["norm.bias"])
        p["to_qkv"]["kernel"] = jnp.asarray(sd["to_qkv.weight"].T)
        p["to_qkv"]["bias"] = jnp.asarray(sd["to_qkv.bias"])
        # depthwise conv: torch [dim, 1, kh, kw] -> flax [kh, kw, 1, dim]
        p["lepe"]["kernel"] = jnp.asarray(
            sd["lepe.weight"].transpose(2, 3, 1, 0)
        )
        p["lepe"]["bias"] = jnp.asarray(sd["lepe.bias"])
        p["piece_attn"]["weight"] = jnp.asarray(
            sd["piece_attn.conv.weight"][..., 0, 0]
        )
        p["to_out"]["kernel"] = jnp.asarray(sd["to_out.0.weight"].T)
        p["to_out"]["bias"] = jnp.asarray(sd["to_out.0.bias"])

        o_jax = layer.apply({"params": p}, jnp.asarray(x))
        assert_close("MHLA4DiT module golden", o_ref, np.asarray(o_jax), 5e-4)


REF_VIDEO_MHLA = "/root/reference/mhla_videogen/diffusion/model/wan/mhla_utils.py"


def _load_video_ref():
    """Load the reference video MHLA with a WanRMSNorm stub injected for its
    deferred `from diffusion.model.wan.model import WanRMSNorm`."""
    import sys
    import types

    class _WanRMSNorm(torch.nn.Module):
        def __init__(self, dim, eps=1e-5):
            super().__init__()
            self.dim, self.eps = dim, eps
            self.weight = torch.nn.Parameter(torch.ones(dim))

        def forward(self, x):
            y = x.float() * torch.rsqrt(
                x.float().pow(2).mean(dim=-1, keepdim=True) + self.eps
            )
            return (y * self.weight).type_as(x)

    for name in ("diffusion", "diffusion.model", "diffusion.model.wan"):
        sys.modules.setdefault(name, types.ModuleType(name))
    stub = types.ModuleType("diffusion.model.wan.model")
    stub.WanRMSNorm = _WanRMSNorm
    sys.modules["diffusion.model.wan.model"] = stub
    return _load(REF_VIDEO_MHLA, "ref_video_mhla")


class TestVideoModuleParity:
    def test_mhla_video_uni_full_module_golden(self):
        """Full-module parity for the video variant, including the 3D-RoPE
        equivalence: our rotate-half rotary provably matches the reference's
        interleaved complex rotary at the module output."""
        if not os.path.exists(REF_VIDEO_MHLA):
            pytest.skip("video reference missing")
        ref_mod = _load_video_ref()

        torch.manual_seed(0)
        dim, heads, layout = 48, 4, (2, 2, 2)
        grid = (4, 4, 4)
        t = grid[0] * grid[1] * grid[2]
        ref = ref_mod.MHLA_Video_Uni(
            dim=dim, num_heads=heads, qk_norm=True, block_layout=layout,
            transform="linear", is_gated=True, is_lepe=False,
            rope_after=True, normalize_out=False, eps=1e-6,
        ).eval()

        # reference rope freqs: complex table [max_pos, d/2] split (f,h,w)
        d_head = dim // heads
        c = d_head // 2
        splits = [c - 2 * (c // 3), c // 3, c // 3]
        freq_parts = []
        for dsub in splits:
            inv = 1.0 / torch.pow(
                10000.0,
                torch.arange(0, 2 * dsub, 2, dtype=torch.float64) / (2 * dsub),
            )
            ang = torch.outer(torch.arange(64, dtype=torch.float64), inv)
            freq_parts.append(torch.polar(torch.ones_like(ang), ang))
        freqs = torch.cat(freq_parts, dim=1)

        rng = np.random.default_rng(0)
        x = rng.standard_normal((1, t, dim), dtype=np.float32) * 0.5
        grid_sizes = torch.tensor([list(grid)], dtype=torch.long)
        with torch.no_grad():
            o_ref = ref(
                torch.from_numpy(x.copy()), None, grid_sizes, freqs
            ).numpy()

        from mhla_tpu.layers import MHLA3D

        layer = MHLA3D(
            dim=dim, num_heads=heads, blocks_layout=layout, transform="linear",
            qk_norm=True, is_gated=True, is_lepe=False,
            normalize_out=False, eps=1e-6,
        )
        params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x), grid)
        sd = {k: v.numpy() for k, v in ref.state_dict().items()}
        from mhla_tpu.models.convert_wan import rope_feature_permutation

        perm = rope_feature_permutation(dim, heads)
        p = params["params"]
        for name in ("q", "k", "v", "g", "o"):
            p[name]["kernel"] = jnp.asarray(sd[f"{name}.weight"].T)
            p[name]["bias"] = jnp.asarray(sd[f"{name}.bias"])
        # rotate-half rope: permute q/k output features + their norms
        for name in ("q", "k"):
            p[name]["kernel"] = p[name]["kernel"][:, perm]
            p[name]["bias"] = p[name]["bias"][perm]
        p["norm_q"]["weight"] = jnp.asarray(sd["norm_q.weight"])[perm]
        p["norm_k"]["weight"] = jnp.asarray(sd["norm_k.weight"])[perm]
        p["g_norm"]["weight"] = jnp.asarray(sd["g_norm.weight"])
        # block mixing is a fixed buffer on our side; check it matches
        np.testing.assert_allclose(
            sd["block_attn.conv.weight"][..., 0, 0],
            np.asarray(
                __import__("mhla_tpu.ops", fromlist=["block_mixing_matrix"])
                .block_mixing_matrix(layout, "linear")
            ),
            rtol=1e-5,
        )

        o_jax = layer.apply({"params": p}, jnp.asarray(x), grid)
        assert_close("MHLA_Video_Uni module golden", o_ref, np.asarray(o_jax), 1e-3)
