"""Sentence-level streaming evaluator.

Rebuild of `SimulEval/simuleval/evaluator/evaluator.py:28-262`: for each instance,
loop send_source(segment_size) → agent.pushpop → receive_prediction until the
target finishes; write instances.log (JSONL), scores.tsv / metrics; support
resume (--continue-unfinished semantics) by skipping indices already in the log.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence

from streamspeech_tpu.agents.base import GenericAgent
from streamspeech_tpu.eval.instance import (
    Instance,
    SpeechOutputInstance,
    TextOutputInstance,
    TextToTextInstance,
)
from streamspeech_tpu.eval.latency import build_scorers
from streamspeech_tpu.eval import quality as _quality  # noqa: F401 (registers scorers)
from streamspeech_tpu.registry import QUALITY_SCORERS

DEFAULT_LATENCY = ["AL", "LAAL", "AP", "DAL", "ATD", "NumChunks", "StartOffset",
                   "EndOffset", "RTF"]
SPEECH_ONLY = ["DiscontinuitySum", "DiscontinuityAve", "DiscontinuityNum"]


class SentenceLevelEvaluator:
    def __init__(
        self,
        agent: GenericAgent,
        source_segment_size: int = 320,     # ms
        latency_metrics: Optional[List[str]] = None,
        quality_metrics: Optional[List[str]] = None,
        output_dir: Optional[str] = None,
        max_turns_per_instance: int = 10000,
        quality_scorer_kwargs: Optional[dict] = None,
    ):
        self.agent = agent
        self.source_segment_size = source_segment_size
        self.output_dir = output_dir
        self.max_turns = max_turns_per_instance
        self.speech_output = agent.target_type == "speech"
        names = list(latency_metrics if latency_metrics is not None
                     else DEFAULT_LATENCY)
        if self.speech_output and latency_metrics is None:
            names += SPEECH_ONLY
        self.latency_scorers = build_scorers(names)
        qnames = quality_metrics if quality_metrics is not None else (
            ["ASR_BLEU"] if self.speech_output else ["BLEU"])
        kw = quality_scorer_kwargs or {}
        self.quality_scorers = {n: QUALITY_SCORERS.get(n)(**kw.get(n, {}))
                                for n in qnames}
        self.instances: Dict[int, Instance] = {}
        if output_dir:
            Path(output_dir).mkdir(parents=True, exist_ok=True)

    def _make_instance(self, index, source, reference, sample_rate) -> Instance:
        if getattr(self.agent, "source_type", "speech") == "text":
            # t2t evaluation (instance.py:426 TextToTextInstance); delays are
            # measured in source tokens
            cls = TextToTextInstance
        else:
            cls = (SpeechOutputInstance if self.speech_output
                   else TextOutputInstance)
        return cls(index, source, reference, sample_rate=sample_rate,
                   output_dir=self.output_dir)

    def _done_indices(self) -> set:
        if not self.output_dir:
            return set()
        log = Path(self.output_dir) / "instances.log"
        if not log.exists():
            return set()
        done = set()
        for line in log.read_text().splitlines():
            try:
                done.add(json.loads(line)["index"])
            except Exception:
                pass
        return done

    def run_instance(self, instance: Instance) -> dict:
        self.agent.reset()
        turns = 0
        while not instance.finish_prediction and turns < self.max_turns:
            segment = instance.send_source(self.source_segment_size)
            out = self.agent.pushpop(segment)
            instance.receive_prediction(out)
            turns += 1
            if instance.source_finished_reading and out.finished:
                break
        summary = instance.summarize()
        return summary

    def __call__(self, sources: Sequence, references: Sequence[str],
                 sample_rate: int = 16000, continue_unfinished: bool = False
                 ) -> Dict[str, float]:
        done = self._done_indices() if continue_unfinished else set()
        log_f = None
        if self.output_dir:
            log_f = open(Path(self.output_dir) / "instances.log",
                         "a" if continue_unfinished else "w")
        for i, (src, ref) in enumerate(zip(sources, references)):
            if i in done:
                continue
            ins = self._make_instance(i, src, ref, sample_rate)
            summary = self.run_instance(ins)
            self.instances[i] = ins
            if log_f:
                log_f.write(json.dumps(summary) + "\n")
                log_f.flush()
        if log_f:
            log_f.close()
        return self.scores()

    def score_only(self) -> Dict[str, float]:
        """Re-score from a previous run's instances.log without running the
        agent (the reference's --score-only mode, `evaluator.py:145-160`).
        Rebuilds LogInstance-like objects from the JSONL summaries."""
        assert self.output_dir, "score_only needs --output with instances.log"
        log = Path(self.output_dir) / "instances.log"
        self.instances = {}
        for line in log.read_text().splitlines():
            d = json.loads(line)
            cls = SpeechOutputInstance if "durations" in d else TextOutputInstance
            # The rebuilt source is only ever used for its LENGTH (RTF,
            # StartOffset/EndOffset and AL all derive from source_length);
            # 16 samples/ms matches the 16 kHz rate every speech instance
            # records source_length at (`eval/instance.py` source_length is ms
            # of source audio), so the synthetic zeros are length-exact.
            src_samples = [0.0] * int(d["source_length"] * 16)
            ins = cls(d["index"], src_samples, d.get("reference"),
                      output_dir=self.output_dir)
            ins.delays = d.get("delays", [])
            ins.elapsed = d.get("elapsed", [])
            ins.finish_prediction = True
            if isinstance(ins, SpeechOutputInstance):
                ins.durations = d.get("durations", [])
                ins.intervals = d.get("intervals", [])
                ins.silences = [max(b0 - (a0 + a1), 0.0) for (a0, a1), (b0, _)
                                in zip(ins.intervals, ins.intervals[1:])
                                if b0 > a0 + a1]
                ins.target_sample_rate = 16000
            else:
                ins.prediction_list = str(d.get("prediction", "")).split()
            self.instances[d["index"]] = ins
        return self.scores()

    def scores(self) -> Dict[str, float]:
        results: Dict[str, float] = {}
        for name, scorer in self.quality_scorers.items():
            try:
                results[name] = scorer(self.instances)
            except Exception:
                results[name] = float("nan")
        for name, scorer in self.latency_scorers.items():
            try:
                results[name] = scorer(self.instances)
            except Exception:
                results[name] = float("nan")
        if self.output_dir:
            path = Path(self.output_dir) / "scores.tsv"
            with open(path, "w") as f:
                f.write("\t".join(results.keys()) + "\n")
                f.write("\t".join(f"{v:.3f}" if v == v else "nan"
                                  for v in results.values()) + "\n")
        return results
