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

    def save(self, path: str) -> None:
        """Serialize to the binary SPM ModelProto wire format (pieces only) —
        the file round-trips through :meth:`load` and is id-compatible with
        the ``sentencepiece`` runtime for unigram inference."""
        out = bytearray()
        for piece, score, ptype in self.pieces:
            msg = bytearray()
            pb = piece.encode("utf-8")
            msg += b"\x0a" + _write_varint(len(pb)) + pb          # field 1: bytes
            msg += b"\x15" + struct.pack("<f", score)             # field 2: float
            if ptype != _NORMAL:
                msg += b"\x18" + _write_varint(ptype)             # field 3: enum
            out += b"\x0a" + _write_varint(len(msg)) + bytes(msg)  # ModelProto.pieces
        with open(path, "wb") as f:
            f.write(bytes(out))

    def save_vocab(self, path: str) -> None:
        """piece<TAB>score text vocab (the sidecar spm_train also emits)."""
        with open(path, "w", encoding="utf-8") as f:
            for piece, score, _ in self.pieces:
                f.write(f"{piece}\t{score:g}\n")


def _write_varint(value: int) -> bytes:
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _normalize_sentence(text: str) -> str:
    import unicodedata

    text = unicodedata.normalize("NFKC", text)
    text = " ".join(text.split())
    return SPM_SPACE + text.replace(" ", SPM_SPACE)


def train_unigram(sentences, vocab_size: int = 6000, max_piece_len: int = 16,
                  seed_factor: int = 4, shrinking_factor: float = 0.75,
                  num_sub_iterations: int = 2,
                  unk_piece: str = "<unk>", bos_piece: str = "<s>",
                  eos_piece: str = "</s>") -> "SentencePieceUnigram":
    """Train a unigram-LM vocabulary — the preprocess stage the reference runs
    with ``spm_train --model_type unigram --vocab_size 6000``
    (`preprocess_scripts/` SPM stage; Kudo 2018). Pure-python EM:

    1. seed: frequent substrings (len ≤ ``max_piece_len``) scored freq·len,
       capped at ``seed_factor``·vocab_size, plus every corpus character;
    2. EM: expected piece counts by forward-backward over each sentence's
       segmentation lattice; M-step renormalizes log-probs;
    3. prune: drop the pieces whose removal costs the least total
       log-likelihood (each piece's count times its score minus its best
       alternative segmentation), keeping all single characters, shrinking
       by ``shrinking_factor`` per round until ``vocab_size`` fits.

    Returns a ready :class:`SentencePieceUnigram` whose pieces are
    [<unk>, <s>, </s>] + learned pieces (score = log prob, descending).
    """
    import math
    from collections import Counter

    sent_freq: Dict[str, int] = Counter()
    for s in sentences:
        s = _normalize_sentence(s)
        if len(s) > 1:
            sent_freq[s] += 1
    if not sent_freq:
        raise ValueError("empty corpus")

    # --- seed vocabulary ---------------------------------------------------
    required: Dict[str, int] = Counter()
    substr: Dict[str, int] = Counter()
    for s, f in sent_freq.items():
        for ch in s:
            required[ch] += f
        n = len(s)
        for i in range(n):
            for j in range(i + 2, min(n, i + max_piece_len) + 1):
                substr[s[i:j]] += f
    if len(required) + 3 > vocab_size:
        raise ValueError(
            f"vocab_size={vocab_size} too small: corpus has {len(required)} "
            f"distinct characters (+3 reserved pieces); pruning keeps all "
            f"single characters so the target can never be reached")
    n_seed = max(seed_factor * vocab_size, 256)
    seeds = {p: c for p, c in substr.items() if c >= 2}
    top = sorted(seeds.items(), key=lambda kv: (-kv[1] * len(kv[0]), kv[0]))
    vocab: Dict[str, float] = {}
    total = sum(c * len(p) for p, c in top[:n_seed]) + sum(required.values())
    for p, c in top[:n_seed]:
        vocab[p] = math.log(c * len(p) / total)
    for ch, c in required.items():
        vocab[ch] = math.log(max(c, 1) / total)

    def viterbi(s: str, scores: Dict[str, float], skip: str = ""):
        """best segmentation log-prob (pieces drawn from ``scores``\\{skip})."""
        n = len(s)
        best = [float("-inf")] * (n + 1)
        best[0] = 0.0
        for i in range(n):
            if best[i] == float("-inf"):
                continue
            hi = min(n, i + max_piece_len)
            for j in range(i + 1, hi + 1):
                sub = s[i:j]
                if sub == skip:
                    continue
                sc = scores.get(sub)
                if sc is not None and best[i] + sc > best[j]:
                    best[j] = best[i] + sc
        return best[n]

    def em_step(scores: Dict[str, float]) -> Dict[str, float]:
        counts: Dict[str, float] = Counter()
        for s, f in sent_freq.items():
            n = len(s)
            # lattice edges: (start, piece, score) per end position
            edges = [[] for _ in range(n + 1)]
            for i in range(n):
                hi = min(n, i + max_piece_len)
                for j in range(i + 1, hi + 1):
                    sc = scores.get(s[i:j])
                    if sc is not None:
                        edges[j].append((i, s[i:j], sc))
            alpha = [float("-inf")] * (n + 1)
            alpha[0] = 0.0
            for j in range(1, n + 1):
                vals = [alpha[i] + sc for i, _, sc in edges[j]
                        if alpha[i] != float("-inf")]
                if vals:
                    m = max(vals)
                    alpha[j] = m + math.log(sum(math.exp(v - m) for v in vals))
            if alpha[n] == float("-inf"):
                continue  # unsegmentable (chars got pruned) — skip
            beta = [float("-inf")] * (n + 1)
            beta[n] = 0.0
            for j in range(n, 0, -1):
                if beta[j] == float("-inf"):
                    continue
                for i, piece, sc in edges[j]:
                    v = sc + beta[j]
                    if beta[i] == float("-inf"):
                        beta[i] = v
                    else:
                        m = max(beta[i], v)
                        beta[i] = m + math.log(math.exp(beta[i] - m)
                                               + math.exp(v - m))
            z = alpha[n]
            for j in range(1, n + 1):
                for i, piece, sc in edges[j]:
                    if alpha[i] == float("-inf") or beta[j] == float("-inf"):
                        continue
                    counts[piece] += f * math.exp(alpha[i] + sc + beta[j] - z)
        tot = sum(counts.values())
        return {p: math.log(c / tot) for p, c in counts.items() if c > 1e-8}

    target = vocab_size - 3  # reserve <unk>/<s>/</s>
    while True:
        for _ in range(num_sub_iterations):
            new = em_step(vocab)
            # never lose single-character coverage
            for ch in required:
                if ch not in new:
                    new[ch] = vocab.get(ch, math.log(1e-7))
            vocab = new
        if len(vocab) <= target:
            break
        # prune: loss of removing piece = count * (score - alt segmentation)
        losses = []
        for p, sc in vocab.items():
            if len(p) == 1:
                continue
            alt = viterbi(p, vocab, skip=p)
            losses.append((max(sc - alt, 0.0), p))
        losses.sort(reverse=True)
        keep = max(int(len(vocab) * shrinking_factor),
                   min(target, len(vocab)))
        keep_extra = keep - len(required)
        kept = {p for _, p in losses[:max(keep_extra, 0)]}
        before = len(vocab)
        vocab = {p: sc for p, sc in vocab.items()
                 if len(p) == 1 or p in kept}
        if len(vocab) <= target or len(vocab) == before:
            break  # done, or prune made no progress (only chars remain)

    learned = sorted(vocab.items(), key=lambda kv: (-kv[1], kv[0]))[:target]
    pieces = [(unk_piece, 0.0, _UNKNOWN), (bos_piece, 0.0, _CONTROL),
              (eos_piece, 0.0, _CONTROL)]
    pieces += [(p, sc, _NORMAL) for p, sc in learned]
    return SentencePieceUnigram(pieces)
