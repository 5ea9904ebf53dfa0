"""SentencePiece-compatible unigram tokenizer, dependency-free.

The reference tokenizes with trained SPM unigram models
(``configs/*/{src,tgt}_unigram6000/spm_unigram_*.model``). The ``sentencepiece``
package is not available in this environment, so this module parses the binary
``.model`` protobuf directly (only the ``pieces`` field is needed) and implements
unigram Viterbi segmentation. Decoding follows SPM conventions: pieces use
``▁`` as the word-boundary marker.

Protobuf wire format for ModelProto (sentencepiece_model.proto):
  field 1 (repeated SentencePiece pieces): { field 1: piece (bytes),
  field 2: score (float), field 3: type (enum; 1=NORMAL, 2=UNKNOWN, 3=CONTROL,
  4=USER_DEFINED, 6=BYTE, 5=UNUSED) }
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

SPM_SPACE = "▁"

_NORMAL, _UNKNOWN, _CONTROL, _USER_DEFINED, _UNUSED, _BYTE = 1, 2, 3, 4, 5, 6


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7


def _skip_field(buf: bytes, pos: int, wire_type: int) -> int:
    if wire_type == 0:
        _, pos = _read_varint(buf, pos)
    elif wire_type == 1:
        pos += 8
    elif wire_type == 2:
        ln, pos = _read_varint(buf, pos)
        pos += ln
    elif wire_type == 5:
        pos += 4
    else:
        raise ValueError(f"unsupported wire type {wire_type}")
    return pos


def _parse_piece(buf: bytes) -> Tuple[str, float, int]:
    pos = 0
    piece, score, ptype = "", 0.0, _NORMAL
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if field == 1 and wire == 2:
            ln, pos = _read_varint(buf, pos)
            piece = buf[pos : pos + ln].decode("utf-8")
            pos += ln
        elif field == 2 and wire == 5:
            (score,) = struct.unpack("<f", buf[pos : pos + 4])
            pos += 4
        elif field == 3 and wire == 0:
            ptype, pos = _read_varint(buf, pos)
        else:
            pos = _skip_field(buf, pos, wire)
    return piece, score, ptype


class SentencePieceUnigram:
    """Unigram LM tokenizer over a parsed SPM .model file."""

    def __init__(self, pieces: List[Tuple[str, float, int]]):
        self.pieces = pieces
        self.piece_to_id: Dict[str, int] = {}
        self.scores: Dict[str, float] = {}
        self.unk_id = 0
        self.unk_score = -1e9
        self.max_piece_len = 1
        for i, (p, s, t) in enumerate(pieces):
            self.piece_to_id.setdefault(p, i)
            if t == _UNKNOWN:
                self.unk_id = i
                self.unk_score = s if s != 0.0 else -10.0
            elif t in (_NORMAL, _USER_DEFINED, _BYTE):
                self.scores[p] = s
                self.max_piece_len = max(self.max_piece_len, len(p))

    @classmethod
    def load(cls, path: str) -> "SentencePieceUnigram":
        with open(path, "rb") as f:
            buf = f.read()
        pieces: List[Tuple[str, float, int]] = []
        pos = 0
        while pos < len(buf):
            tag, pos = _read_varint(buf, pos)
            field, wire = tag >> 3, tag & 7
            if field == 1 and wire == 2:
                ln, pos = _read_varint(buf, pos)
                pieces.append(_parse_piece(buf[pos : pos + ln]))
                pos += ln
            else:
                pos = _skip_field(buf, pos, wire)
        return cls(pieces)

    def _normalize(self, text: str) -> str:
        # NFKC-lite: SPM default normalizer is nmt_nfkc; we apply NFKC + space folding.
        import unicodedata

        text = unicodedata.normalize("NFKC", text)
        text = " ".join(text.split())
        return SPM_SPACE + text.replace(" ", SPM_SPACE)

    def encode_as_pieces(self, text: str) -> List[str]:
        s = self._normalize(text)
        n = len(s)
        # Viterbi over character positions.
        best: List[float] = [float("-inf")] * (n + 1)
        back: List[Optional[Tuple[int, str]]] = [None] * (n + 1)
        best[0] = 0.0
        unk_penalty = self.unk_score - 10.0
        for i in range(n):
            if best[i] == float("-inf"):
                continue
            hi = min(n, i + self.max_piece_len)
            matched = False
            for j in range(i + 1, hi + 1):
                sub = s[i:j]
                sc = self.scores.get(sub)
                if sc is not None:
                    matched = True
                    cand = best[i] + sc
                    if cand > best[j]:
                        best[j] = cand
                        back[j] = (i, sub)
            # unknown fallback: single char
            if not matched or s[i : i + 1] not in self.scores:
                cand = best[i] + unk_penalty
                if cand > best[i + 1]:
                    best[i + 1] = cand
                    back[i + 1] = (i, s[i : i + 1])
        out: List[str] = []
        j = n
        while j > 0:
            i, sub = back[j]
            out.append(sub)
            j = i
        out.reverse()
        return out

    def encode(self, text: str) -> List[int]:
        return [self.piece_to_id.get(p, self.unk_id) for p in self.encode_as_pieces(text)]

    def decode_pieces(self, pieces: List[str]) -> str:
        return "".join(pieces).replace(SPM_SPACE, " ").strip()
