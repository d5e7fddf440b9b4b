"""Native data-plane tests: C++ kernels vs Python fallbacks."""

import zipfile

import numpy as np
import pytest

from mhla_tpu.data import native


@pytest.fixture(scope="module")
def built():
    return native.native_available()


class TestPackDocuments:
    def _docs(self, rng, n=20):
        lens = rng.integers(3, 40, n)
        offsets = np.zeros(n + 1, np.int64)
        offsets[1:] = np.cumsum(lens)
        tokens = rng.integers(0, 1000, offsets[-1]).astype(np.int32)
        return tokens, offsets

    def test_rows_cover_stream_exactly(self, built):
        rng = np.random.default_rng(0)
        tokens, offsets = self._docs(rng)
        rows, cursor, carry = native.pack_documents(tokens, offsets, 16, 1000)
        flat = np.concatenate([rows.ravel(), carry])
        np.testing.assert_array_equal(flat, tokens[: len(flat)])
        assert len(flat) == (len(tokens) // 16) * 16 + len(carry)
        assert cursor == (len(offsets) - 1, 0)

    def test_native_matches_fallback(self, built):
        if not built:
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(1)
        tokens, offsets = self._docs(rng, 30)
        a_rows, a_cur, a_carry = native.pack_documents(tokens, offsets, 8, 1000)
        # force the numpy fallback
        lib, native._LIB = native._LIB, None
        try:
            b_rows, b_cur, b_carry = native.pack_documents(tokens, offsets, 8, 1000)
        finally:
            native._LIB = lib
        np.testing.assert_array_equal(a_rows, b_rows)
        assert a_cur == b_cur
        np.testing.assert_array_equal(a_carry, b_carry)

    def test_carry_resume(self, built):
        rng = np.random.default_rng(2)
        tokens, offsets = self._docs(rng, 10)
        full, _, full_carry = native.pack_documents(tokens, offsets, 8, 1000)
        # two-phase packing with bounded rows must yield the same stream
        r1, cur1, c1 = native.pack_documents(tokens, offsets, 8, 3)
        r2, cur2, c2 = native.pack_documents(tokens, offsets, 8, 1000, cur1, c1)
        np.testing.assert_array_equal(np.vstack([r1, r2]), full)
        np.testing.assert_array_equal(c2, full_carry)
        # also check native vs fallback agree on the split run
        lib, native._LIB = native._LIB, None
        try:
            f1, fcur1, fc1 = native.pack_documents(tokens, offsets, 8, 3)
            f2, _, fc2 = native.pack_documents(tokens, offsets, 8, 1000, fcur1, fc1)
        finally:
            native._LIB = lib
        np.testing.assert_array_equal(np.vstack([f1, f2]), full)


class TestZipShard:
    def _make_zip(self, path, compress):
        data = {
            "a/frame_000.bin": np.arange(100, dtype=np.uint8).tobytes(),
            "a/frame_001.bin": b"hello world" * 50,
            "meta.json": b'{"fps": 16}',
        }
        method = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
        with zipfile.ZipFile(path, "w", method) as z:
            for name, blob in data.items():
                z.writestr(name, blob)
        return data

    @pytest.mark.parametrize("compress", [False, True])
    def test_read_matches_stdlib(self, tmp_path, built, compress):
        p = str(tmp_path / ("c.zip" if compress else "s.zip"))
        data = self._make_zip(p, compress)
        with native.ZipShard(p) as shard:
            assert set(shard.names()) == set(data)
            for name, blob in data.items():
                assert shard.read(name) == blob

    def test_read_by_index(self, tmp_path, built):
        p = str(tmp_path / "i.zip")
        self._make_zip(p, True)
        with native.ZipShard(p) as shard:
            names = shard.names()
            assert shard.read(0) == shard.read(names[0])


class TestPreprocess:
    def test_write_and_stream(self, tmp_path):
        from mhla_tpu.data.preprocess import (
            open_token_shard,
            shard_row_iterator,
            write_token_shard,
        )

        texts = [f"doc {i} " * (i + 1) for i in range(10)]
        tokenize = lambda s: [ord(c) % 256 for c in s]
        prefix = str(tmp_path / "shard0")
        tok_path, off_path = write_token_shard(texts, tokenize, prefix, eos_token_id=0)
        tokens, offsets = open_token_shard(prefix)
        assert len(offsets) == 11
        assert tokens[offsets[1] - 1] == 0  # eos appended

        rows = list(shard_row_iterator(prefix, seq_len=16, batch_rows=3))
        flat = np.concatenate([r for r in rows])
        np.testing.assert_array_equal(flat, tokens[: len(flat)])
        assert len(flat) == (len(tokens) // 16) * 16
