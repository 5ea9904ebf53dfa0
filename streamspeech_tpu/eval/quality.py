"""Quality scorers: BLEU (sacrebleu) and ASR-BLEU for speech output.

Reference: `SimulEval/simuleval/evaluator/scorers/quality_scorer.py:50-209`.
The reference's ASR_BLEU shells out to downloaded wav2vec2 checkpoints
(`asr_bleu/compute_asr_bleu.py`); this environment has no network egress, so the
ASR backend is pluggable: pass any callable wav→text (e.g. a local
transformers Wav2Vec2 pipeline or this framework's own streaming ASR agent in
self-transcription mode). Without a backend, ASR_BLEU reports NaN rather than
failing the run.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

from streamspeech_tpu.registry import QUALITY_SCORERS


@QUALITY_SCORERS.register("BLEU")
class SacreBLEUScorer:
    def __init__(self, tokenizer: str = "13a"):
        self.tokenizer = tokenizer

    def __call__(self, instances: Dict[int, object]) -> float:
        import sacrebleu

        hyps = [str(ins.prediction) for ins in instances.values()]
        refs = [[ins.reference or "" for ins in instances.values()]]
        return sacrebleu.corpus_bleu(hyps, refs,
                                     tokenize=self.tokenizer).score


def remove_simuleval_silence(wav):
    """Strip the zero runs SimulEval stitching inserts at delay gaps before
    transcription — the reference's rm_silence ASR-BLEU variant
    (`asr_bleu_rm_silence/utils.py:232-243`), reproduced exactly: a zero sample
    is dropped iff it starts or ends a run of ≥10 consecutive zeros (torch.roll
    wrap-around semantics included). Simultaneous output is scored this way in
    the paper; without it discontinuous output reads artificially low."""
    import numpy as np

    w = np.asarray(wav)
    if w.size == 0:
        return w
    z = w == 0
    left = z.copy()
    right = z.copy()
    for i in range(10):
        left &= np.roll(w, -i) == 0
        right &= np.roll(w, i) == 0
    mask = z & (left | right)
    return w[~mask]


@QUALITY_SCORERS.register("ASR_BLEU")
class ASRBLEUScorer:
    """Transcribe emitted wavs with a pluggable ASR backend, then corpus BLEU
    (`quality_scorer.py:128-179`). remove_silence=True (default) applies the
    reference's rm_silence preprocessing — the variant actually used to score
    simultaneous (discontinuous) speech output."""

    def __init__(self, asr_fn: Optional[Callable] = None,
                 tokenizer: str = "13a", remove_silence: bool = True):
        self.asr_fn = asr_fn
        self.tokenizer = tokenizer
        self.remove_silence = remove_silence

    def transcripts(self, instances) -> List[str]:
        out = []
        for ins in instances.values():
            wav = getattr(ins, "stitched", None)
            if wav is None or self.asr_fn is None:
                out.append("")
            else:
                if self.remove_silence:
                    wav = remove_simuleval_silence(wav)
                out.append(self.asr_fn(wav, getattr(ins, "target_sample_rate",
                                                    16000)))
        return out

    def __call__(self, instances) -> float:
        import sacrebleu

        if self.asr_fn is None:
            return float("nan")
        hyps = [t.lower() for t in self.transcripts(instances)]
        refs = [[(ins.reference or "").lower() for ins in instances.values()]]
        return sacrebleu.corpus_bleu(hyps, refs, tokenize=self.tokenizer).score


@QUALITY_SCORERS.register("WHISPER_ASR_BLEU")
class WhisperASRBLEUScorer(ASRBLEUScorer):
    """ASR-BLEU with a local Whisper transcriber (`quality_scorer.py:209`).
    No network egress here, so the Whisper weights must already be on disk
    (``model_path``: a transformers WhisperForConditionalGeneration directory);
    alternatively pass a prebuilt ``asr_fn``."""

    def __init__(self, asr_fn: Optional[Callable] = None,
                 model_path: Optional[str] = None, tokenizer: str = "13a",
                 language: str = "en"):
        if asr_fn is None and model_path is not None:
            asr_fn = make_whisper_asr_fn(model_path, language)
        super().__init__(asr_fn, tokenizer)


def make_whisper_asr_fn(model_path: str, language: str = "en") -> Callable:
    """Whisper transcription via the baked-in transformers (torch CPU) from a
    LOCAL checkpoint directory — the reference's whisper scorer downloads from
    the hub (`quality_scorer.py:209`); here the weights must be pre-fetched."""
    import torch
    from transformers import WhisperForConditionalGeneration, WhisperProcessor

    processor = WhisperProcessor.from_pretrained(model_path)
    model = WhisperForConditionalGeneration.from_pretrained(model_path)
    model.eval()

    def asr_fn(wav, sample_rate=16000) -> str:
        import numpy as np

        feats = processor(np.asarray(wav, np.float32),
                          sampling_rate=sample_rate,
                          return_tensors="pt").input_features
        with torch.no_grad():
            ids = model.generate(feats, language=language, task="transcribe")
        return processor.batch_decode(ids, skip_special_tokens=True)[0].strip()

    return asr_fn


def make_self_asr_fn(engine, src_dict, segment_size_ms: int = 640):
    """Build an ASR backend for ASRBLEUScorer from this framework's OWN
    streaming-ASR agent (self-transcription). The reference downloads external
    wav2vec2 CTC models (`asr_bleu/utils.py:47`); with no network egress, a
    model's own ASR head is the built-in alternative (use an English-ASR
    checkpoint for scoring English speech output)."""
    from streamspeech_tpu.agents.base import SpeechSegment
    from streamspeech_tpu.agents.streamspeech import (
        StreamSpeechAgentConfig,
        StreamSpeechASRAgent,
    )

    agent = StreamSpeechASRAgent(
        engine, StreamSpeechAgentConfig(source_segment_size=segment_size_ms),
        src_dict)

    def asr_fn(wav, sample_rate=16000) -> str:
        agent.reset()
        samples = list(wav)
        seg = int(segment_size_ms * sample_rate / 1000)
        text = []
        for i in range(0, max(len(samples), 1), seg):
            chunk = samples[i:i + seg]
            out = agent.pushpop(SpeechSegment(
                content=chunk, sample_rate=sample_rate,
                finished=i + seg >= len(samples)))
            if not out.is_empty and out.content:
                text.append(out.content)
        return " ".join(text)

    return asr_fn


@QUALITY_SCORERS.register("WER")
class WERScorer:
    """Word error rate (used by the streaming-ASR evaluation, BASELINE.md).
    Uses the native batched edit-distance kernel (native/edit_dist.cpp, the
    fairseq.libnat equivalent) when available, pure python otherwise."""

    def __call__(self, instances) -> float:
        pairs = [((ins.reference or "").split(), str(ins.prediction).split())
                 for ins in instances.values()]
        den = sum(len(r) for r, _ in pairs) or 1
        dists = batched_edit_distance(pairs)
        return 100.0 * sum(dists) / den


def _edit_distance(a: List[str], b: List[str]) -> int:
    dp = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        prev = dp[0]
        dp[0] = i
        for j in range(1, len(b) + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                        prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[-1]


_EDIT_LIB = None
_EDIT_FAILED = False


def _load_edit_lib():
    """Compile/load the libnat-equivalent batched edit-distance C++ kernel
    (`native/edit_dist.cpp`; fairseq reference: `clib/libnat/edit_dist.cpp`)."""
    global _EDIT_LIB, _EDIT_FAILED
    if _EDIT_LIB is not None or _EDIT_FAILED:
        return _EDIT_LIB
    import ctypes
    import subprocess
    from pathlib import Path

    d = Path(__file__).resolve().parents[2] / "native"
    so, src = d / "libeditdist.so", d / "edit_dist.cpp"
    try:
        if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
            subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-o", str(so),
                            str(src)], check=True, capture_output=True)
        lib = ctypes.CDLL(str(so))
        p = ctypes.POINTER(ctypes.c_int64)
        lib.edit_distances.argtypes = [p, p, p, p, ctypes.c_int64, p]
        _EDIT_LIB = lib
    except Exception:
        _EDIT_FAILED = True
    return _EDIT_LIB


def batched_edit_distance(pairs) -> List[int]:
    """pairs: list of (ref_tokens, hyp_tokens). Returns Levenshtein distances,
    via the native kernel when it builds (token strings are interned to int64
    ids first — distance only needs equality)."""
    lib = _load_edit_lib()
    if lib is None:
        return [_edit_distance(a, b) for a, b in pairs]
    import ctypes

    import numpy as np

    vocab: dict = {}

    def ids(toks):
        return [vocab.setdefault(t, len(vocab)) for t in toks]

    a_flat, b_flat, a_lens, b_lens = [], [], [], []
    for a, b in pairs:
        ai, bi = ids(a), ids(b)
        a_flat += ai
        b_flat += bi
        a_lens.append(len(ai))
        b_lens.append(len(bi))
    af = np.asarray(a_flat or [0], np.int64)
    bf = np.asarray(b_flat or [0], np.int64)
    al = np.asarray(a_lens, np.int64)
    bl = np.asarray(b_lens, np.int64)
    out = np.zeros(len(pairs), np.int64)
    p = ctypes.POINTER(ctypes.c_int64)
    lib.edit_distances(af.ctypes.data_as(p), al.ctypes.data_as(p),
                       bf.ctypes.data_as(p), bl.ctypes.data_as(p),
                       len(pairs), out.ctypes.data_as(p))
    return out.tolist()
