"""Video dataset: zip shards + aspect-ratio bucketed batching.

Re-design of the reference video input pipeline
(``diffusion/data/sana_video_data.py`` — ``SanaZipDataset`` over .zip media
shards with sidecar captions; ``diffusion/utils/data_sampler.py`` —
aspect-ratio bucket batch samplers): shards are .zip files whose members are
media blobs plus JSON metadata; samples are grouped into aspect-ratio
buckets so every batch shares one resolution; sharding across hosts is
deterministic per epoch. Zip access uses the native C++ reader
(``mhla_tpu.data.native.ZipShard``) when built.
"""

from __future__ import annotations

import dataclasses
import io
import json
from pathlib import Path
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .native import ZipShard

# 480p video buckets (reference ASPECT_RATIO_VIDEO_480 style: ratio -> H, W)
ASPECT_RATIO_VIDEO_480 = {
    "0.50": (480, 960),
    "0.57": (480, 832),
    "0.60": (480, 800),
    "0.75": (480, 640),
    "1.00": (480, 480),
    "1.33": (640, 480),
    "1.75": (832, 480),
}


def nearest_bucket(height: int, width: int, buckets=ASPECT_RATIO_VIDEO_480) -> str:
    ratio = height / width
    return min(buckets, key=lambda k: abs(float(k) - ratio))


@dataclasses.dataclass
class VideoSample:
    key: str
    shard: str
    meta: Dict[str, Any]


class ZipVideoDataset:
    """Index of media members across .zip shards with JSON sidecar metadata.

    Shard layout (Sana convention): for each sample key there is a media
    member (``<key>.npz`` / ``.npy`` / ``.mp4`` ...) and optionally
    ``<key>.json`` metadata (captions, fps, size).
    """

    MEDIA_EXTS = (".npz", ".npy", ".mp4", ".bin")

    def __init__(
        self,
        shard_paths: Sequence[str],
        decode: Optional[Callable[[bytes, VideoSample], Any]] = None,
    ):
        self.decode = decode or self._default_decode
        self.samples: List[VideoSample] = []
        self._shards: Dict[str, ZipShard] = {}
        for path in shard_paths:
            shard = ZipShard(path)
            self._shards[path] = shard
            names = set(shard.names())
            for name in sorted(names):
                stem, dot, ext = name.rpartition(".")
                if "." + ext in self.MEDIA_EXTS:
                    meta = {}
                    side = stem + ".json"
                    if side in names:
                        meta = json.loads(shard.read(side))
                    self.samples.append(VideoSample(name, path, meta))

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, i: int):
        s = self.samples[i]
        blob = self._shards[s.shard].read(s.key)
        return self.decode(blob, s)

    @staticmethod
    def _default_decode(blob: bytes, sample: VideoSample):
        if sample.key.endswith(".npz"):
            return dict(np.load(io.BytesIO(blob)))
        if sample.key.endswith(".npy"):
            return np.load(io.BytesIO(blob))
        return blob

    def close(self):
        for s in self._shards.values():
            s.close()


class AspectRatioBatchSampler:
    """Yield index batches grouped by aspect-ratio bucket, sharded by rank.

    Mirrors the reference sampler semantics (``data_sampler.py:14-321``):
    per-bucket queues, deterministic shuffling per epoch, drop_last.
    """

    def __init__(
        self,
        buckets_of: Sequence[str],  # bucket key per sample
        batch_size: int,
        rank: int = 0,
        world_size: int = 1,
        seed: int = 0,
        drop_last: bool = True,
    ):
        self.buckets_of = list(buckets_of)
        self.batch_size = batch_size
        self.rank = rank
        self.world_size = world_size
        self.seed = seed
        self.drop_last = drop_last

    def epoch(self, epoch: int) -> Iterator[List[int]]:
        rng = np.random.default_rng(self.seed + epoch)
        order = rng.permutation(len(self.buckets_of))
        queues: Dict[str, List[int]] = {}
        batches: List[List[int]] = []
        for i in order:
            b = self.buckets_of[i]
            q = queues.setdefault(b, [])
            q.append(int(i))
            if len(q) == self.batch_size:
                batches.append(q.copy())
                q.clear()
        if not self.drop_last:
            for q in queues.values():
                if q:
                    batches.append(q.copy())
        # contiguous shard by rank (all ranks agree on the batch list)
        per_rank = len(batches) // self.world_size
        mine = batches[self.rank * per_rank : (self.rank + 1) * per_rank]
        yield from mine


def write_latent_cache(
    out_dir: str,
    key: str,
    latent: np.ndarray,
    text_emb: np.ndarray,
    meta: Optional[Dict[str, Any]] = None,
) -> str:
    """Write a cached-latent .npz consumable by ``wan_train`` (the reference
    cached-VAE path, ``train_wan.py:466-472``)."""
    p = Path(out_dir)
    p.mkdir(parents=True, exist_ok=True)
    path = p / f"{key}.npz"
    np.savez(path, latent=latent, text_emb=text_emb, meta=json.dumps(meta or {}))
    return str(path)
