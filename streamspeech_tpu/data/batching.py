"""Token-bucket batching with a native C++ kernel (+ numpy fallback).

Equivalent of fairseq's `batch_by_size` (`fairseq/fairseq/data/data_utils_fast.pyx`,
built as a native extension in `fairseq/setup.py:60-130`). The C++ library is
compiled on first use with g++ into native/libbatcher.so and bound via ctypes
(pybind11 is not available in this image).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import List, Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False


def _load_native() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    so = _NATIVE_DIR / "libbatcher.so"
    src = _NATIVE_DIR / "batcher.cpp"
    try:
        if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", str(so), str(src)],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(so))
        lib.batch_by_size.restype = ctypes.c_int64
        lib.batch_by_size.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64)]
        _LIB = lib
    except Exception:
        _LIB_FAILED = True
    return _LIB


def batch_by_size(
    indices: np.ndarray,
    num_tokens: np.ndarray,
    max_tokens: int = 0,
    max_sentences: int = 0,
    bsz_mult: int = 8,
) -> List[np.ndarray]:
    """indices: ordering to pack (e.g. length-sorted); num_tokens: per-INDEX token
    counts (indexed by the values in `indices`). Returns a list of index arrays."""
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    num_tokens = np.ascontiguousarray(num_tokens, dtype=np.int64)
    n = len(indices)
    if n == 0:
        return []
    lib = _load_native()
    if lib is not None:
        offsets = np.zeros(n + 1, dtype=np.int64)
        nb = lib.batch_by_size(
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            num_tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, max_tokens, max_sentences, max(bsz_mult, 1),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return [indices[offsets[i]:offsets[i + 1]] for i in range(nb)]
    return _batch_by_size_py(indices, num_tokens, max_tokens, max_sentences,
                             max(bsz_mult, 1))


def _batch_by_size_py(indices, num_tokens, max_tokens, max_sentences, bsz_mult):
    batches = []
    start = 0
    batch_max = 0
    i = 0
    while i < len(indices):
        tok = int(num_tokens[indices[i]])
        new_max = max(batch_max, tok)
        count = i - start + 1
        full = ((max_sentences > 0 and count == max_sentences) or
                (max_tokens > 0 and count * new_max > max_tokens))
        if full and count > 0:
            size = i - start
            mod = size % bsz_mult
            if size > bsz_mult and mod != 0:
                size -= mod
            if size == 0:
                size = max(i - start, 1)
            batches.append(indices[start:start + size])
            start += size
            batch_max = int(max(num_tokens[indices[start:i + 1]])) if start <= i \
                else 0
        else:
            batch_max = new_max
        i += 1
    if start < len(indices):
        batches.append(indices[start:])
    return batches
