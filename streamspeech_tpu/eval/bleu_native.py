"""Native fast corpus BLEU (token-id level), fairseq libbleu equivalent.

Computes BLEU-4 with brevity penalty from token-id sequences via the C++
counter (native/bleu.cpp, ctypes-bound). This is the train-time scorer path —
final reported numbers still come from sacrebleu on detokenized text
(eval/quality.py), matching the reference split between `fairseq.libbleu` and
sacrebleu.
"""

from __future__ import annotations

import ctypes
import math
import subprocess
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB = None
_FAILED = False


def _load():
    global _LIB, _FAILED
    if _LIB is not None or _FAILED:
        return _LIB
    so = _NATIVE_DIR / "libbleu.so"
    src = _NATIVE_DIR / "bleu.cpp"
    try:
        if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-o", str(so),
                            str(src)], check=True, capture_output=True)
        lib = ctypes.CDLL(str(so))
        lib.bleu_add_sentence.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64)]
        _LIB = lib
    except Exception:
        _FAILED = True
    return _LIB


class BleuScorer:
    def __init__(self):
        self.counts = np.zeros(10, dtype=np.int64)
        self._lib = _load()

    def add(self, ref: Sequence[int], hyp: Sequence[int]):
        ref = np.ascontiguousarray(ref, dtype=np.int32)
        hyp = np.ascontiguousarray(hyp, dtype=np.int32)
        if self._lib is not None:
            self._lib.bleu_add_sentence(
                ref.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(ref),
                hyp.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(hyp),
                self.counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        else:
            self._add_py(ref.tolist(), hyp.tolist())

    def _add_py(self, ref: List[int], hyp: List[int]):
        from collections import Counter

        for n in range(1, 5):
            rg = Counter(tuple(ref[i:i + n]) for i in range(len(ref) - n + 1))
            hg = Counter(tuple(hyp[i:i + n]) for i in range(len(hyp) - n + 1))
            match = sum(min(c, rg[g]) for g, c in hg.items())
            self.counts[2 * (n - 1)] += match
            self.counts[2 * (n - 1) + 1] += max(len(hyp) - n + 1, 0)
        self.counts[8] += len(ref)
        self.counts[9] += len(hyp)

    def score(self) -> float:
        log_p = 0.0
        for n in range(4):
            match, total = self.counts[2 * n], self.counts[2 * n + 1]
            if match == 0 or total == 0:
                return 0.0
            log_p += math.log(match / total)
        ref_len, hyp_len = self.counts[8], self.counts[9]
        bp = min(0.0, 1.0 - ref_len / hyp_len) if hyp_len > 0 else -math.inf
        return 100.0 * math.exp(log_p / 4.0 + bp)
