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


@QUALITY_SCORERS.register("ASR_BLEU")
class ASRBLEUScorer:
    """Transcribe emitted wavs with a pluggable ASR backend, then corpus BLEU
    (`quality_scorer.py:128-179`)."""

    def __init__(self, asr_fn: Optional[Callable] = None,
                 tokenizer: str = "13a"):
        self.asr_fn = asr_fn
        self.tokenizer = tokenizer

    def transcripts(self, instances) -> List[str]:
        out = []
        for ins in instances.values():
            wav = getattr(ins, "stitched", None)
            if wav is None or self.asr_fn is None:
                out.append("")
            else:
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
    """Word error rate (used by the streaming-ASR evaluation, BASELINE.md)."""

    def __call__(self, instances) -> float:
        num, den = 0, 0
        for ins in instances.values():
            ref = (ins.reference or "").split()
            hyp = str(ins.prediction).split()
            num += _edit_distance(ref, hyp)
            den += len(ref)
        return 100.0 * num / max(den, 1)


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
