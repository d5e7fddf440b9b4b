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
