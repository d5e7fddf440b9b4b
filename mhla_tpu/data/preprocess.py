"""Corpus pre-tokenization: tokenize + pack into binary token shards.

Reference analogue: ``mhla_nlp/legacy/training/preprocess.py`` (tokenize
fineweb-edu and pack fixed-length rows with optional offsets). Here the
output is a flat int32 token binary plus an int64 document-offset index —
the exact input format of the native C++ packer
(``mhla_tpu.data.native.pack_documents``) — so training never re-tokenizes.

HF ``transformers``/``datasets`` are used when available; any iterable of
texts + any callable tokenizer work.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Callable, Iterable, Iterator, List, Optional, Tuple

import numpy as np


def write_token_shard(
    texts: Iterable[str],
    tokenize: Callable[[str], List[int]],
    out_prefix: str,
    eos_token_id: Optional[int] = None,
    max_docs: Optional[int] = None,
) -> Tuple[str, str]:
    """Tokenize ``texts`` into ``<prefix>.tokens.bin`` (int32) and
    ``<prefix>.offsets.bin`` (int64 doc boundaries). Returns the two paths."""
    out = Path(out_prefix)
    out.parent.mkdir(parents=True, exist_ok=True)
    tok_path = str(out) + ".tokens.bin"
    off_path = str(out) + ".offsets.bin"
    offsets = [0]
    n_docs = 0
    with open(tok_path, "wb") as f:
        for text in texts:
            ids = tokenize(text)
            if eos_token_id is not None:
                ids = list(ids) + [eos_token_id]
            np.asarray(ids, np.int32).tofile(f)
            offsets.append(offsets[-1] + len(ids))
            n_docs += 1
            if max_docs and n_docs >= max_docs:
                break
    np.asarray(offsets, np.int64).tofile(off_path)
    meta = {"n_docs": n_docs, "n_tokens": offsets[-1]}
    Path(str(out) + ".meta.json").write_text(json.dumps(meta))
    return tok_path, off_path


def open_token_shard(prefix: str) -> Tuple[np.ndarray, np.ndarray]:
    """Memory-map a token shard written by :func:`write_token_shard`."""
    tokens = np.memmap(prefix + ".tokens.bin", dtype=np.int32, mode="r")
    offsets = np.fromfile(prefix + ".offsets.bin", dtype=np.int64)
    return tokens, offsets


def shard_row_iterator(
    prefix: str, seq_len: int, batch_rows: int = 256
) -> Iterator[np.ndarray]:
    """Stream packed rows from a token shard via the native packer."""
    from .native import pack_documents

    tokens, offsets = open_token_shard(prefix)
    cursor, carry = (0, 0), None
    n_docs = len(offsets) - 1
    while cursor[0] < n_docs:
        rows, cursor, carry = pack_documents(
            tokens, offsets, seq_len, batch_rows, cursor, carry
        )
        if rows.shape[0] == 0:
            break
        yield from rows


def tokenize_hf_dataset(
    dataset_name: str,
    tokenizer_name: str,
    out_prefix: str,
    split: str = "train",
    text_column: str = "text",
    max_docs: Optional[int] = None,
) -> Tuple[str, str]:
    """Tokenize a HuggingFace dataset (requires network/cache) into a shard.

    Reference flow: fineweb-edu + a 32k BPE tokenizer
    (``legacy/training/preprocess.py:17-60``).
    """
    from datasets import load_dataset  # type: ignore
    from transformers import AutoTokenizer  # type: ignore

    tok = AutoTokenizer.from_pretrained(tokenizer_name)
    ds = load_dataset(dataset_name, split=split, streaming=True)
    texts = (row[text_column] for row in ds)
    return write_token_shard(
        texts, lambda s: tok.encode(s), out_prefix,
        eos_token_id=tok.eos_token_id, max_docs=max_docs,
    )
