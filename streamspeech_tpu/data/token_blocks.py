"""Token-block indexing with a native C++ kernel (+ numpy fallback).

Equivalent of fairseq's `token_block_utils_fast` Cython extension
(`fairseq/fairseq/data/token_block_utils_fast.pyx`, listed in
`fairseq/setup.py:60-130`), which backs `TokenBlockDataset` for LM-style
training. Break modes match the reference (`_get_slice_indices_fast`,
token_block_utils_fast.pyx:52-105):

  - "none":         fixed-size blocks over the concatenated stream
  - "complete":     whole sentences packed up to block_size
  - "complete_doc": like complete, but never across document separators
                    (a sentence of exactly `document_sep_len` tokens); blocks
                    of <=1 token are dropped
  - "eos":          one block per sentence

`block_to_dataset_index` maps each block back to
(start_sentence, start_offset, end_sentence) like
`_get_block_to_dataset_index_fast` (token_block_utils_fast.pyx:111-138), but
with one monotonic sweep instead of a per-block stateful seek.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False

_MODES = {None: 0, "none": 0, "complete": 1, "complete_doc": 2, "eos": 3}


def _load_native() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    so = _NATIVE_DIR / "libtokenblocks.so"
    src = _NATIVE_DIR / "token_blocks.cpp"
    try:
        if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", str(so), str(src)],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(so))
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.token_block_slice_indices.restype = ctypes.c_int64
        lib.token_block_slice_indices.argtypes = [
            i64p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int64,
            ctypes.c_int64, i64p, ctypes.c_int64]
        lib.token_block_dataset_index.restype = None
        lib.token_block_dataset_index.argtypes = [
            i64p, ctypes.c_int64, i64p, ctypes.c_int64, i64p]
        _LIB = lib
    except Exception:
        _LIB_FAILED = True
    return _LIB


def slice_indices(sizes: np.ndarray, break_mode: Optional[str],
                  block_size: int, document_sep_len: int = 1) -> np.ndarray:
    """[num_blocks, 2] (start, end) token offsets over the concatenated corpus."""
    if break_mode not in _MODES:
        raise ValueError(f"Invalid break_mode: {break_mode}")
    sizes = np.ascontiguousarray(sizes, dtype=np.int64)
    lib = _load_native()
    if lib is not None:
        i64p = ctypes.POINTER(ctypes.c_int64)
        sp = sizes.ctypes.data_as(i64p)
        mode = _MODES[break_mode]
        n = lib.token_block_slice_indices(sp, len(sizes), mode, block_size,
                                          document_sep_len, None, 0)
        out = np.zeros((max(n, 0), 2), dtype=np.int64)
        if n > 0:
            lib.token_block_slice_indices(sp, len(sizes), mode, block_size,
                                          document_sep_len,
                                          out.ctypes.data_as(i64p), n)
        return out
    return _slice_indices_py(sizes, break_mode, block_size, document_sep_len)


def block_to_dataset_index(sizes: np.ndarray,
                           blocks: np.ndarray) -> np.ndarray:
    """[num_blocks, 3] (start_sentence, start_offset, end_sentence) per block."""
    sizes = np.ascontiguousarray(sizes, dtype=np.int64)
    blocks = np.ascontiguousarray(blocks, dtype=np.int64)
    lib = _load_native()
    if lib is not None and len(blocks):
        i64p = ctypes.POINTER(ctypes.c_int64)
        out = np.zeros((len(blocks), 3), dtype=np.int64)
        lib.token_block_dataset_index(
            sizes.ctypes.data_as(i64p), len(sizes),
            blocks.ctypes.data_as(i64p), len(blocks),
            out.ctypes.data_as(i64p))
        return out
    return _block_to_dataset_index_py(sizes, blocks)


def _slice_indices_py(sizes, break_mode, block_size, document_sep_len):
    out = []
    if break_mode in (None, "none"):
        total = int(sizes.sum())
        for start in range(0, total, block_size):
            out.append((start, min(start + block_size, total)))
    elif break_mode == "complete":
        tok = curr = 0
        i = 0
        while i < len(sizes):
            if curr == 0 or curr + sizes[i] <= block_size:
                curr += int(sizes[i])
                i += 1
            else:
                out.append((tok, tok + curr))
                tok += curr
                curr = 0
        if curr > 0:
            out.append((tok, tok + curr))
    elif break_mode == "complete_doc":
        tok = curr = 0
        i = 0
        while i < len(sizes):
            is_sep = int(sizes[i]) == document_sep_len
            if not is_sep and (curr == 0 or curr + sizes[i] <= block_size):
                curr += int(sizes[i])
                i += 1
            else:
                if curr > 1:
                    out.append((tok, tok + curr))
                tok += curr
                curr = 0
                if is_sep:
                    tok += int(sizes[i])
                    i += 1
        if curr > 1:
            out.append((tok, tok + curr))
    elif break_mode == "eos":
        tok = 0
        for s in sizes:
            out.append((tok, tok + int(s)))
            tok += int(s)
    return np.asarray(out, dtype=np.int64).reshape(-1, 2)


def _block_to_dataset_index_py(sizes, blocks):
    out = np.zeros((len(blocks), 3), dtype=np.int64)
    sent = 0
    sent_start = 0
    n = len(sizes)

    def advance_to(tok):
        nonlocal sent, sent_start
        while sent < n - 1 and sent_start + sizes[sent] <= tok:
            sent_start += int(sizes[sent])
            sent += 1

    for b, (s, e) in enumerate(blocks):
        advance_to(int(s))
        out[b, 0] = sent
        out[b, 1] = int(s) - sent_start
        if e > s:
            advance_to(int(e) - 1)
        out[b, 2] = sent
    return out
