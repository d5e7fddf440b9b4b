"""Packed varlen (document-boundary) training tests.

The reference trains on packed variable-length rows with cu_seqlens (flame
collator ``legacy/training/flame/data.py:157-246``; layer unpad/repad
``fla/layers/mhla.py:253-256``). The TPU rebuild keeps static shapes and
carries per-token ``segment_ids``; these tests pin the core property: a
packed row holding several documents equals the documents run separately —
through the jnp op, the fused Pallas kernels (interpret mode), the short
conv, softmax attention, and the full LM.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mhla_tpu.ops import init_causal_mixing_matrix, mhla_chunk
from mhla_tpu.ops.mhla_chunk import (
    build_segment_mixing,
    chunk_segments,
    prepare_mixing_matrix,
    segment_positions,
)
from mhla_tpu.utils.testing import assert_close


def seg_ids(doc_lens, t):
    """[1, T] segment ids for docs packed back-to-back (chunk-aligned)."""
    ids = np.zeros(t, np.int32)
    pos, sid = 0, 0
    for n in doc_lens:
        ids[pos : pos + n] = sid
        pos += n
        sid += 1
    ids[pos:] = sid  # trailing pad = its own segment
    return jnp.asarray(ids)[None]


class TestSegmentHelpers:
    def test_segment_positions(self):
        ids = jnp.asarray([[0, 0, 0, 1, 1, 2, 2, 2, 2]])
        pos = segment_positions(ids)
        assert pos.tolist() == [[0, 1, 2, 0, 1, 0, 1, 2, 3]]

    def test_chunk_segments(self):
        # chunk=2, t=8, docs of 4 and 2 tokens + pad
        ids = jnp.asarray([[0, 0, 0, 0, 1, 1, 2, 2]])
        cs, rel = chunk_segments(ids, 4, 2)
        assert cs.tolist() == [[0, 0, 1, 2]]
        assert rel.tolist() == [[0, 1, 0, 0]]

    def test_chunk_segments_pads_tail(self):
        # t=6 tokens but 4 chunks of 2: the padded chunk is a fresh segment
        ids = jnp.asarray([[0, 0, 0, 0, 0, 0]])
        cs, rel = chunk_segments(ids, 4, 2)
        assert cs.tolist() == [[0, 0, 0, 1]]
        assert rel.tolist() == [[0, 1, 2, 0]]

    def test_single_segment_matches_prepare(self, key):
        m = jax.random.uniform(key, (8, 8))
        ids = jnp.zeros((2, 6 * 16), jnp.int32)
        mvar = build_segment_mixing(m, ids, 6, 16)
        want = jnp.tril(prepare_mixing_matrix(m, 6))
        assert_close("mvar row0", want, mvar[0], 1e-6)
        assert_close("mvar row1", want, mvar[1], 1e-6)

    def test_cross_document_weights_zero(self, key):
        m = jax.random.uniform(key, (8, 8)) + 0.5
        ids = seg_ids([4 * 16, 2 * 16], 8 * 16)
        mvar = build_segment_mixing(m, ids, 8, 16)[0]
        # doc0 = chunks 0-3, doc1 = chunks 4-5, pad = 6-7
        assert np.all(np.asarray(mvar[4:, :4]) == 0.0)
        assert np.all(np.asarray(mvar[6:, 4:6]) == 0.0)
        # doc1's block reads the matrix at document-relative indices
        assert_close("doc1 block", jnp.tril(m[:2, :2]), mvar[4:6, 4:6], 1e-6)


def qkv(key, b, t, h, dk, dv, positive=True):
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (b, t, h, dk))
    k = jax.random.normal(k2, (b, t, h, dk))
    v = jax.random.normal(k3, (b, t, h, dv))
    if positive:
        q, k = jax.nn.relu(q) + 1e-6, jax.nn.relu(k) + 1e-6
    return q, k, v


class TestPackedEqualsSeparateOp:
    """One packed row of N documents == the documents run separately."""

    def test_jnp_op(self, key):
        c = 32
        lens = [3 * c, 2 * c]
        t = 6 * c  # one chunk of trailing pad
        q, k, v = qkv(key, 1, t, 2, 16, 24)
        m = init_causal_mixing_matrix(8)
        ids = seg_ids(lens, t)
        o_packed, _ = mhla_chunk(q, k, v, m, chunk_size=c, segment_ids=ids)
        pos = 0
        for n in lens:
            sl = slice(pos, pos + n)
            o_doc, _ = mhla_chunk(q[:, sl], k[:, sl], v[:, sl], m, chunk_size=c)
            assert_close(f"doc at {pos}", o_doc, o_packed[:, sl], 1e-5)
            pos += n

    def test_jnp_op_grads_isolated(self, key):
        """Gradients do not leak across document boundaries: d(doc0 out)/d(doc1
        in) == 0."""
        c = 16
        lens = [2 * c, 2 * c]
        t = 4 * c
        q, k, v = qkv(key, 1, t, 1, 8, 8)
        m = init_causal_mixing_matrix(4)
        ids = seg_ids(lens, t)

        def loss(v_in):
            o, _ = mhla_chunk(q, k, v_in, m, chunk_size=c, segment_ids=ids)
            return jnp.sum(o[:, : lens[0]] ** 2)  # only doc0's outputs

        g = jax.grad(loss)(v)
        assert np.abs(np.asarray(g[:, lens[0] :])).max() == 0.0
        assert np.abs(np.asarray(g[:, : lens[0]])).max() > 0.0


class TestPackedFusedInterpret:
    """The fused Pallas path with a per-batch-row mixing matrix (interpret
    mode): packed == separate, and gradients match the jnp op."""

    @pytest.fixture(autouse=True)
    def _force_interpret(self):
        from mhla_tpu.kernels import mhla_chunk_pallas as mod

        mod.FORCE_INTERPRET = True
        yield
        mod.FORCE_INTERPRET = False

    def test_forward_packed_equals_separate(self, key):
        from mhla_tpu.kernels import mhla_chunk_fused

        c, t, h, d = 64, 1024, 2, 128
        rows = [[384, 640], [256, 256, 448]]  # row2 has a trailing pad chunk
        q, k, v = qkv(key, 2, t, h, d, d)
        m = init_causal_mixing_matrix(16)
        ids = jnp.concatenate([seg_ids(r, t) for r in rows], axis=0)
        o_packed, _ = mhla_chunk_fused(q, k, v, m, chunk_size=c, segment_ids=ids)
        for bi, lens in enumerate(rows):
            pos = 0
            for n in lens:
                sl = slice(pos, pos + n)
                o_doc, _ = mhla_chunk(
                    q[bi : bi + 1, sl], k[bi : bi + 1, sl],
                    v[bi : bi + 1, sl], m, chunk_size=c,
                )
                assert_close(
                    f"row{bi} doc at {pos}", o_doc, o_packed[bi : bi + 1, sl],
                    1e-5,
                )
                pos += n

    def test_backward_matches_jnp_op(self, key):
        from mhla_tpu.kernels import mhla_chunk_fused

        c, t, h, d = 64, 640, 2, 128
        rows = [[256, 384], [640]]
        q, k, v = qkv(key, 2, t, h, d, d)
        m = init_causal_mixing_matrix(10)
        ids = jnp.concatenate([seg_ids(r, t) for r in rows], axis=0)

        def loss(fn, *args):
            o, _ = fn(*args, chunk_size=c, segment_ids=ids)
            return jnp.sum(jnp.cos(o))

        g_ref = jax.grad(lambda *a: loss(mhla_chunk, *a), argnums=(0, 1, 2, 3))(
            q, k, v, m
        )
        g_pal = jax.grad(
            lambda *a: loss(mhla_chunk_fused, *a), argnums=(0, 1, 2, 3)
        )(q, k, v, m)
        for a, b_, name in zip(g_ref, g_pal, "qkvm"):
            assert_close(f"varlen fused grad {name}", a, b_, 1e-4)


class TestLayersVarlen:
    def test_short_conv_resets_at_boundary(self, key):
        from mhla_tpu.layers.short_conv import ShortConvolution

        conv = ShortConvolution(features=8, kernel_size=4)
        x = jax.random.normal(key, (1, 12, 8))
        ids = seg_ids([8, 4], 12)
        params = conv.init(key, x)
        y_packed, _ = conv.apply(params, x, None, False, ids)
        y0, _ = conv.apply(params, x[:, :8])
        y1, _ = conv.apply(params, x[:, 8:])
        assert_close("conv doc0", y0, y_packed[:, :8], 1e-6)
        assert_close("conv doc1", y1, y_packed[:, 8:], 1e-6)

    def test_flash_fallback_segment_mask(self, key):
        from mhla_tpu.layers.attention import sdpa

        b, t, h, d = 1, 24, 2, 16
        ks = jax.random.split(key, 3)
        q = jax.random.normal(ks[0], (b, t, h, d))
        k = jax.random.normal(ks[1], (b, t, h, d))
        v = jax.random.normal(ks[2], (b, t, h, d))
        ids = seg_ids([16, 8], t)
        o_packed = sdpa(q, k, v, causal=True, segment_ids=ids)
        o0 = sdpa(q[:, :16], k[:, :16], v[:, :16], causal=True)
        o1 = sdpa(q[:, 16:], k[:, 16:], v[:, 16:], causal=True)
        assert_close("sdpa doc0", o0, o_packed[:, :16], 1e-5)
        assert_close("sdpa doc1", o1, o_packed[:, 16:], 1e-5)


class TestModelVarlen:
    """Full LM: packed row logits == per-document logits (attention, rotary
    restart, short-conv reset, and the hybrid softmax seam all in play)."""

    def _config(self, **kw):
        from mhla_tpu.models.gla_lm import MHLALMConfig

        base = dict(
            hidden_size=32,
            num_hidden_layers=2,
            num_heads=2,
            vocab_size=64,
            max_position_embeddings=128,
            chunk_size=16,
            use_short_conv=True,
            feature_map="relu",
        )
        base.update(kw)
        return MHLALMConfig(**base)

    @pytest.mark.parametrize("hybrid", [False, True])
    @pytest.mark.slow
    def test_packed_equals_separate(self, key, hybrid):
        from mhla_tpu.models.gla_lm import MHLAForCausalLM

        cfg = self._config(attn={"layers": [1]} if hybrid else None)
        model = MHLAForCausalLM(cfg)
        lens = [48, 32]
        t = 96  # 16 tokens of trailing pad
        ids = seg_ids(lens, t)
        tokens = jax.random.randint(key, (1, t), 0, cfg.vocab_size)
        params = model.init(jax.random.PRNGKey(0), tokens)
        logits_packed, _ = model.apply(params, tokens, segment_ids=ids)
        pos = 0
        for n in lens:
            sl = slice(pos, pos + n)
            logits_doc, _ = model.apply(params, tokens[:, sl])
            assert_close(
                f"logits doc at {pos}", logits_doc, logits_packed[:, sl], 2e-5
            )
            pos += n


class TestVarlenData:
    def _iter(self, docs, seq_len=32, chunk=8, **kw):
        from mhla_tpu.data.lm_data import PackedVarlenIterator

        return PackedVarlenIterator(
            lambda epoch: list(docs), seq_len, chunk_size=chunk, **kw
        )

    def test_alignment_and_targets(self):
        docs = [list(range(1, 11)), list(range(20, 25))]  # lens 10, 5
        row = next(iter(self._iter(docs)))
        ids, seg, tgt = row["input_ids"], row["segment_ids"], row["targets"]
        assert ids.shape == (32,)
        # doc0 occupies [0, 10), pad [10, 16), doc1 [16, 21), pad [21, 32)
        assert list(ids[:10]) == list(range(1, 11))
        assert list(ids[16:21]) == list(range(20, 25))
        # boundaries chunk-aligned: segment changes only at multiples of 8
        # within real tokens; segment id constant inside each doc
        assert len(set(seg[:10].tolist())) == 1
        assert len(set(seg[16:21].tolist())) == 1
        assert seg[0] != seg[16] and seg[9] != seg[10]
        # targets: -100 at each document start and at every pad
        assert tgt[0] == -100 and tgt[16] == -100
        assert list(tgt[1:10]) == list(range(2, 11))
        assert np.all(tgt[10:16] == -100) and np.all(tgt[21:] == -100)

    def test_long_document_split_resets_segment(self):
        docs = [list(range(100))]  # longer than one row
        it = iter(self._iter(docs, seq_len=32, chunk=8))
        r0, r1 = next(it), next(it)
        assert list(r0["input_ids"]) == list(range(32))
        assert len(set(r0["segment_ids"].tolist())) == 1
        # the continuation starts a fresh segment (fresh context), and its
        # first target is masked — no cross-row supervision
        assert list(r1["input_ids"][:32]) == list(range(32, 64))
        assert r1["targets"][0] == -100

    def test_dataloader_dict_batches(self):
        from mhla_tpu.data.lm_data import make_lm_dataloader

        batches = make_lm_dataloader(
            batch_size=2, seq_len=64, vocab_size=100, varlen=True,
            chunk_size=16,
        )
        b = next(iter(batches))
        assert set(b) == {"input_ids", "segment_ids", "targets"}
        assert b["input_ids"].shape == (2, 64)
        assert b["segment_ids"].shape == (2, 64)
        # boundaries are chunk-aligned
        seg = b["segment_ids"]
        changes = np.nonzero(seg[:, 1:] != seg[:, :-1])[1] + 1
        assert np.all(changes % 16 == 0)


@pytest.mark.slow
class TestVarlenTraining:
    def test_lm_train_varlen_smoke(self, tmp_path):
        from mhla_tpu.train.lm_train import main

        out = main([
            f"--work_dir={tmp_path}/run",
            "--bf16=false",
            "--model.hidden_size=64",
            "--model.num_hidden_layers=2",
            "--model.num_heads=2",
            "--model.vocab_size=128",
            "--model.max_position_embeddings=64",
            "--model.chunk_size=16",
            "--model.use_short_conv=true",
            "--train.max_steps=3",
            "--train.batch_size=4",
            "--train.seq_len=64",
            "--train.varlen=true",
            "--train.log_interval=1",
            "--train.save_interval=100",
            "--optimizer.warmup_steps=1",
            "--optimizer.total_steps=3",
        ])
        assert np.isfinite(out["final_loss"])
