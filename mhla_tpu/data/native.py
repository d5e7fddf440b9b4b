"""ctypes bindings for the native data-plane library (native/mhla_data.cc).

The library is built lazily with the repo Makefile on first use; every API
has a pure-Python fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tarfile
import zipfile
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = _NATIVE_DIR / "libmhla_data.so"
    if not so.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None

    i64, i32p, i64p = ctypes.c_int64, ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64)
    lib.mhla_pack_documents.restype = i64
    lib.mhla_pack_documents.argtypes = [
        i32p, i64p, i64, i64, i32p, i64, i64p, i64p, i32p, i64, i64p,
    ]
    lib.mhla_zip_open.restype = ctypes.c_void_p
    lib.mhla_zip_open.argtypes = [ctypes.c_char_p]
    lib.mhla_zip_num_entries.restype = i64
    lib.mhla_zip_num_entries.argtypes = [ctypes.c_void_p]
    lib.mhla_zip_entry_name.restype = i64
    lib.mhla_zip_entry_name.argtypes = [ctypes.c_void_p, i64, ctypes.c_char_p, i64]
    lib.mhla_zip_entry_size.restype = i64
    lib.mhla_zip_entry_size.argtypes = [ctypes.c_void_p, i64]
    lib.mhla_zip_read.restype = i64
    lib.mhla_zip_read.argtypes = [
        ctypes.c_void_p, i64, ctypes.POINTER(ctypes.c_uint8), i64,
    ]
    lib.mhla_zip_close.argtypes = [ctypes.c_void_p]
    lib.mhla_tar_open.restype = ctypes.c_void_p
    lib.mhla_tar_open.argtypes = [ctypes.c_char_p]
    lib.mhla_tar_num_entries.restype = i64
    lib.mhla_tar_num_entries.argtypes = [ctypes.c_void_p]
    lib.mhla_tar_entry_name.restype = i64
    lib.mhla_tar_entry_name.argtypes = [ctypes.c_void_p, i64, ctypes.c_char_p, i64]
    lib.mhla_tar_entry_size.restype = i64
    lib.mhla_tar_entry_size.argtypes = [ctypes.c_void_p, i64]
    lib.mhla_tar_read.restype = i64
    lib.mhla_tar_read.argtypes = [
        ctypes.c_void_p, i64, ctypes.POINTER(ctypes.c_uint8), i64,
    ]
    lib.mhla_tar_close.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _load() is not None


def pack_documents(
    tokens: np.ndarray,
    doc_offsets: np.ndarray,
    seq_len: int,
    max_rows: int,
    cursor: Tuple[int, int] = (0, 0),
    carry: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, Tuple[int, int], np.ndarray]:
    """Pack a concatenated int32 token stream (documents delimited by
    ``doc_offsets``) into fixed-length rows.

    Returns (rows, cursor, carry) where ``cursor = (doc, pos-within-doc)``
    and ``carry`` is the partial row buffer (< seq_len tokens); pass both
    back to resume exactly. Uses the C++ kernel when available.
    """
    tokens = np.ascontiguousarray(tokens, np.int32)
    doc_offsets = np.ascontiguousarray(doc_offsets, np.int64)
    carry = (
        np.ascontiguousarray(carry, np.int32)
        if carry is not None
        else np.empty(0, np.int32)
    )
    next_doc, next_pos = cursor
    lib = _load()
    if lib is not None:
        out = np.empty((max(max_rows, 1), seq_len), np.int32)
        carry_buf = np.empty(seq_len, np.int32)
        carry_buf[: len(carry)] = carry
        next_doc_c = ctypes.c_int64(next_doc)
        next_pos_c = ctypes.c_int64(next_pos)
        carry_out = ctypes.c_int64(0)
        rows = lib.mhla_pack_documents(
            tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            doc_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(doc_offsets) - 1,
            seq_len,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            max_rows,
            ctypes.byref(next_doc_c),
            ctypes.byref(next_pos_c),
            carry_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(carry),
            ctypes.byref(carry_out),
        )
        return (
            out[:rows],
            (int(next_doc_c.value), int(next_pos_c.value)),
            carry_buf[: carry_out.value].copy(),
        )

    # numpy fallback (same cursor semantics)
    rows_out: List[np.ndarray] = []
    buf = list(carry)
    n_docs = len(doc_offsets) - 1
    d, pos = next_doc, next_pos
    while d < n_docs:
        start, end = int(doc_offsets[d]), int(doc_offsets[d + 1])
        p = start + pos
        while p < end:
            take = min(seq_len - len(buf), end - p)
            buf.extend(tokens[p : p + take].tolist())
            p += take
            if len(buf) == seq_len:
                rows_out.append(np.asarray(buf, np.int32))
                buf = []
                if len(rows_out) == max_rows:
                    return (
                        np.stack(rows_out),
                        (d, p - start),
                        np.empty(0, np.int32),
                    )
        d, pos = d + 1, 0
    return (
        np.stack(rows_out) if rows_out else np.empty((0, seq_len), np.int32),
        (n_docs, 0),
        np.asarray(buf, np.int32),
    )


class ZipShard:
    """Random-access reader over a .zip media shard (Sana zip-shard layout).

    Native central-directory parser + zlib inflate when the library is
    built; stdlib ``zipfile`` otherwise.
    """

    def __init__(self, path: str):
        self.path = path
        self._lib = _load()
        self._handle = None
        self._zf = None
        if self._lib is not None:
            self._handle = self._lib.mhla_zip_open(path.encode())
        if self._handle is None:
            self._lib = None
            self._zf = zipfile.ZipFile(path)

    def names(self) -> List[str]:
        if self._lib:
            n = self._lib.mhla_zip_num_entries(self._handle)
            out = []
            for i in range(n):
                buf = ctypes.create_string_buffer(4096)
                ln = self._lib.mhla_zip_entry_name(self._handle, i, buf, 4096)
                out.append(buf.raw[:ln].decode())
            return out
        return self._zf.namelist()

    def read(self, index_or_name) -> bytes:
        if self._lib:
            if isinstance(index_or_name, str):
                index_or_name = self.names().index(index_or_name)
            size = self._lib.mhla_zip_entry_size(self._handle, index_or_name)
            out = np.empty(size, np.uint8)
            got = self._lib.mhla_zip_read(
                self._handle,
                index_or_name,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                size,
            )
            if got != size:
                raise IOError(f"zip read failed for entry {index_or_name}")
            return out.tobytes()
        name = (
            index_or_name
            if isinstance(index_or_name, str)
            else self._zf.namelist()[index_or_name]
        )
        return self._zf.read(name)

    def close(self):
        if self._lib and self._handle:
            self._lib.mhla_zip_close(self._handle)
            self._handle = None
        if self._zf:
            self._zf.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


class TarShard:
    """Random-access reader over a webdataset-style .tar shard.

    One sequential header scan at open (native ustar/GNU-longname parser
    when the library is built; stdlib ``tarfile`` otherwise), then O(1)
    seek+read per member — the wids design (reference
    ``diffusion/data/wids/wids_tar.py``) without the pickle index sidecar.
    """

    def __init__(self, path: str):
        self.path = path
        self._lib = _load()
        self._handle = None
        self._tf = None
        self._members = None
        if self._lib is not None:
            self._handle = self._lib.mhla_tar_open(path.encode())
        if self._handle is None:
            self._lib = None
            self._tf = tarfile.open(path, "r")
            self._members = [m for m in self._tf.getmembers() if m.isreg()]
        self._names: Optional[List[str]] = None

    def names(self) -> List[str]:
        if self._names is None:
            if self._lib:
                n = self._lib.mhla_tar_num_entries(self._handle)
                out = []
                for i in range(n):
                    buf = ctypes.create_string_buffer(4096)
                    ln = self._lib.mhla_tar_entry_name(self._handle, i, buf, 4096)
                    out.append(buf.raw[:ln].decode())
                self._names = out
            else:
                self._names = [m.name for m in self._members]
        return self._names

    def read(self, index_or_name) -> bytes:
        if isinstance(index_or_name, str):
            index_or_name = self.names().index(index_or_name)
        if self._lib:
            size = self._lib.mhla_tar_entry_size(self._handle, index_or_name)
            out = np.empty(max(size, 1), np.uint8)
            got = self._lib.mhla_tar_read(
                self._handle,
                index_or_name,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                size,
            )
            if got != size:
                raise IOError(f"tar read failed for entry {index_or_name}")
            return out.tobytes()[:size]
        return self._tf.extractfile(self._members[index_or_name]).read()

    def close(self):
        if self._lib and self._handle:
            self._lib.mhla_tar_close(self._handle)
            self._handle = None
        if self._tf:
            self._tf.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()
