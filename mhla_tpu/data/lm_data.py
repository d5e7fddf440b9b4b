"""LM data pipeline: shard + shuffle + token packing with resumable state.

Re-implements the flame data semantics (``legacy/training/flame/data.py``):
documents are tokenized into a rolling token buffer and emitted as
fixed-length rows; iteration order is shard-then-shuffle by rank; the
iterator exposes ``state_dict``/``load_state_dict`` for exact resume
(reference :136-154). A synthetic source stands in when no dataset is
available (the zero-egress default here).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Iterable, Iterator, List, Optional

import numpy as np


@dataclasses.dataclass
class PackingState:
    doc_index: int = 0
    buffer: List[int] = dataclasses.field(default_factory=list)
    epoch: int = 0


class PackedTokenIterator:
    """Packs a document stream into fixed-length token rows.

    ``source(epoch) -> iterable of token lists`` lets the caller reshuffle
    per epoch. Rows are contiguous token windows (no padding); the remainder
    stays in the buffer across documents, matching the reference's
    token-buffer behavior.
    """

    def __init__(
        self,
        source: Callable[[int], Iterable[List[int]]],
        seq_len: int,
        state: Optional[PackingState] = None,
    ):
        self.source = source
        self.seq_len = seq_len
        self.state = state or PackingState()

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            it = iter(self.source(self.state.epoch))
            # fast-forward to the resume point
            for _ in range(self.state.doc_index):
                next(it, None)
            for doc in it:
                self.state.doc_index += 1
                self.state.buffer.extend(doc)
                while len(self.state.buffer) >= self.seq_len:
                    row = self.state.buffer[: self.seq_len]
                    del self.state.buffer[: self.seq_len]
                    yield np.asarray(row, dtype=np.int32)
            self.state.epoch += 1
            self.state.doc_index = 0

    def state_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self.state)

    def load_state_dict(self, d: Dict[str, Any]) -> None:
        self.state = PackingState(**d)


def shard_documents(
    docs: List[Any], rank: int, world_size: int, seed: int, epoch: int
) -> List[Any]:
    """Shuffle deterministically per epoch, then contiguous-shard by rank."""
    rng = np.random.default_rng(seed + epoch)
    order = rng.permutation(len(docs))
    per_rank = len(docs) // world_size
    mine = order[rank * per_rank : (rank + 1) * per_rank]
    return [docs[i] for i in mine]


def batched(
    row_iter: Iterator[np.ndarray], batch_size: int
) -> Iterator[np.ndarray]:
    buf = []
    for row in row_iter:
        buf.append(row)
        if len(buf) == batch_size:
            yield np.stack(buf)
            buf = []


def synthetic_documents(
    vocab_size: int, num_docs: int = 1024, mean_len: int = 512, seed: int = 0
) -> List[List[int]]:
    """Zipf-ish synthetic corpus for smoke training without network access."""
    rng = np.random.default_rng(seed)
    docs = []
    for _ in range(num_docs):
        n = int(rng.integers(mean_len // 2, mean_len * 2))
        ranks = rng.zipf(1.3, size=n)
        docs.append((np.minimum(ranks, vocab_size - 1)).astype(np.int32).tolist())
    return docs


def make_lm_dataloader(
    seq_len: int,
    batch_size: int,
    vocab_size: int = 32000,
    rank: int = 0,
    world_size: int = 1,
    seed: int = 42,
    docs: Optional[List[List[int]]] = None,
) -> Iterator[np.ndarray]:
    """Batches of [batch, seq_len] int32 token rows."""
    all_docs = docs if docs is not None else synthetic_documents(vocab_size)

    def source(epoch: int):
        return shard_documents(all_docs, rank, world_size, seed, epoch)

    return batched(iter(PackedTokenIterator(source, seq_len)), batch_size)
