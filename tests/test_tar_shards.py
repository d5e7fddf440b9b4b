"""wids-equivalent tar-shard datasets: native/stdlib reader parity, key
grouping, shard-list indexing, and sampler semantics incl. resume."""

import json

import numpy as np
import pytest

from mhla_tpu.data.native import TarShard, native_available
from mhla_tpu.data.tar_shards import (
    ChunkedSampler,
    DistributedRangedSampler,
    ShardListDataset,
    default_decode,
    distributed_chunked_sampler,
    group_by_key,
    split_key,
    write_tar_shard,
)


def make_shard(path, n, offset=0):
    samples = [
        {
            "__key__": f"sample_{offset + i:05d}",
            "npy": np.full((3, 4), offset + i, np.float32),
            "json": {"idx": offset + i},
            "txt": f"caption {offset + i}",
        }
        for i in range(n)
    ]
    write_tar_shard(str(path), samples)
    return path


class TestTarReader:
    def test_native_and_fallback_agree(self, tmp_path):
        p = make_shard(tmp_path / "s.tar", 4)
        native = TarShard(str(p))
        fallback = TarShard(str(p))
        fallback._lib = None
        import tarfile

        fallback._tf = tarfile.open(str(p))
        fallback._members = [m for m in fallback._tf.getmembers() if m.isreg()]
        fallback._names = None
        assert native.names() == fallback.names()
        for i in range(len(native.names())):
            assert native.read(i) == fallback.read(i)
        if native_available():
            assert native._lib is not None  # the native path actually ran
        native.close()
        fallback.close()

    def test_pax_long_names_native(self, tmp_path):
        """PAX-format archives (Python tarfile's default) with >100-char
        member names must resolve identically through the native parser and
        the stdlib fallback."""
        import io
        import tarfile

        p = tmp_path / "pax.tar"
        longkey = "d/" * 60 + "sample_00001"
        with tarfile.open(p, "w", format=tarfile.PAX_FORMAT) as tf:
            for ext, data in (("npy", b"A" * 17), ("txt", b"hello")):
                ti = tarfile.TarInfo(f"{longkey}.{ext}")
                ti.size = len(data)
                tf.addfile(ti, io.BytesIO(data))
        sh = TarShard(str(p))
        if native_available():
            assert sh._lib is not None
        assert sh.names() == [f"{longkey}.npy", f"{longkey}.txt"]
        assert sh.read(1) == b"hello"
        sh.close()

    def test_key_grouping(self):
        names = ["a.npy", "a.json", "b.npy", "b.json", "dir/c.meta.json"]
        assert split_key("dir/c.meta.json") == ("dir/c", "meta.json")
        groups = group_by_key(names)
        assert [g["__key__"] for g in groups] == ["a", "b", "dir/c"]
        assert groups[0] == {"__key__": "a", "npy": 0, "json": 1}

    def test_decoders(self):
        assert default_decode("json", b'{"a": 1}') == {"a": 1}
        assert default_decode("txt", b"hi") == "hi"
        assert default_decode("cls", b"7\n") == 7
        import io

        buf = io.BytesIO()
        np.save(buf, np.arange(3))
        assert (default_decode("npy", buf.getvalue()) == np.arange(3)).all()
        assert default_decode("mp4", b"\x00raw") == b"\x00raw"


class TestShardListDataset:
    def test_multi_shard_indexing(self, tmp_path):
        p1 = make_shard(tmp_path / "s1.tar", 3, offset=0)
        p2 = make_shard(tmp_path / "s2.tar", 5, offset=3)
        ds = ShardListDataset([str(p1), str(p2)])
        assert len(ds) == 8
        for i in (0, 2, 3, 7):
            s = ds[i]
            assert s["json"]["idx"] == i
            assert (s["npy"] == i).all()
            assert s["txt"] == f"caption {i}"
        ds.close()

    def test_spec_file_with_counts(self, tmp_path):
        p1 = make_shard(tmp_path / "s1.tar", 3)
        spec = tmp_path / "spec.json"
        spec.write_text(
            json.dumps({"shardlist": [{"url": str(p1), "nsamples": 3}]})
        )
        ds = ShardListDataset(str(spec))
        assert len(ds) == 3 and ds[1]["json"]["idx"] == 1
        ds.close()

    def test_lru_eviction(self, tmp_path):
        paths = [make_shard(tmp_path / f"s{i}.tar", 2, offset=2 * i) for i in range(4)]
        ds = ShardListDataset([str(p) for p in paths], lru_size=2)
        for i in range(8):
            assert ds[i]["json"]["idx"] == i
        assert len(ds._open) <= 2
        ds.close()

    def test_lru_recency_refresh(self, tmp_path):
        """A hit must refresh recency (true LRU): with capacity 2, touching
        shard 0 between opens of 1 and 2 must evict 1, not 0."""
        paths = [make_shard(tmp_path / f"s{i}.tar", 2, offset=2 * i) for i in range(3)]
        ds = ShardListDataset([str(p) for p in paths], lru_size=2)
        ds[0]  # open shard 0
        ds[2]  # open shard 1
        ds[0]  # hit shard 0 -> most recent
        ds[4]  # open shard 2 -> must evict shard 1
        assert set(ds._open) == {0, 2}
        ds.close()


class TestSamplers:
    def test_chunked_covers_and_shuffles(self):
        ds = list(range(100))
        s = ChunkedSampler(ds, chunksize=10, seed=0, shuffle=True, shufflefirst=True)
        order = list(iter(s))
        assert sorted(order) == list(range(100))
        assert order != list(range(100))
        # chunk locality: every window of 10 stays within one chunk span
        for w in range(0, 100, 10):
            assert max(order[w : w + 10]) - min(order[w : w + 10]) < 10

    def test_distributed_chunked_partitions(self):
        ds = list(range(100))
        seen = []
        for r in range(4):
            seen += list(iter(distributed_chunked_sampler(ds, rank=r, world_size=4)))
        assert sorted(seen) == list(range(100))

    def test_ranged_resume(self):
        ds = list(range(40))
        s = DistributedRangedSampler(ds, rank=1, world_size=2)
        it = iter(s)
        first = [next(it) for _ in range(5)]
        assert first == [20, 21, 22, 23, 24]
        state = s.state_dict()
        s2 = DistributedRangedSampler(ds, rank=1, world_size=2)
        s2.load_state_dict(state)
        rest = list(iter(s2))
        assert first + rest == list(range(20, 40))


class TestTrainerTarSource:
    def test_wan_train_consumes_tar_latents(self, tmp_path):
        """video_batches yields batches from wids-style tar latent shards."""
        import numpy as np

        from mhla_tpu.train.wan_train import WanTrainConfig, video_batches

        cfg = WanTrainConfig()
        d = cfg.data
        samples = [
            {
                "__key__": f"clip_{i:04d}",
                "latent.npy": np.full(
                    (d.latent_frames, d.latent_height, d.latent_width, d.latent_dim),
                    i, np.float32,
                ),
                "text_emb.npy": np.zeros((d.text_len, d.text_dim), np.float32),
            }
            for i in range(4)
        ]
        write_tar_shard(str(tmp_path / "latents-0000.tar"), samples)
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            data=dataclasses.replace(d, latent_dir=str(tmp_path)),
            train=dataclasses.replace(cfg.train, batch_size=2),
        )
        it = video_batches(cfg, np.random.default_rng(0))
        z, c = next(it)
        assert z.shape[0] == 2 and z.shape[1] == d.latent_frames
        assert (z[0] == 0).all() and (z[1] == 1).all()
        z2, _ = next(it)
        assert (z2[0] == 2).all() and (z2[1] == 3).all()
