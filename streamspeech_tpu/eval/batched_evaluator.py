"""Batched corpus evaluation: B instances per wave through one lockstep session.

The reference evaluates a corpus strictly sequentially — one SimulEval agent
process, one utterance at a time (`SimulEval/simuleval/evaluator/evaluator.py`
loop). Here the same sentence-level protocol runs B instances concurrently on
one chip: every 320 ms tick, all live instances' segments are ingested, ONE
batched encoder call advances every stream, the per-stream READ/WRITE policy
decisions (identical logic to agents/streamspeech.StreamSpeechS2STAgent.policy,
`agent/speech_to_speech.streamspeech.agent.py:422-770`) become a budget vector
for ONE scanned MT decode, and writers share ONE fused emission call.

Numerics per instance are identical to the sequential evaluator
(tests/test_batched_eval.py compares predictions + delays instance by
instance); only wall-clock (`elapsed`, the _CA latency twins) differs — that is
the point.

The corpus is processed in waves of `batch` instances (a fresh
BatchedStreamingSession per wave — streams are position-locked, so slots are
not refilled mid-wave); sort the corpus by length for tight waves, as the
reference's batch_by_size does for training.
"""

from __future__ import annotations

from types import SimpleNamespace
from typing import Dict, List, Optional, Sequence

import numpy as np

from streamspeech_tpu.agents.base import SpeechSegment
from streamspeech_tpu.agents.streamspeech import SAMPLE_RATE, StreamSpeechAgentConfig
from streamspeech_tpu.dictionary import Dictionary
from streamspeech_tpu.eval.evaluator import SentenceLevelEvaluator
from streamspeech_tpu.eval.instance import Instance
from streamspeech_tpu.ops.cmvn import GlobalCMVN
from streamspeech_tpu.ops.fbank import OnlineFbank
from streamspeech_tpu.runtime.batched import BatchedStreamingSession
from streamspeech_tpu.runtime.session import StreamSpeechEngine


class _StreamState:
    """Host-side per-stream policy state (the fields the sequential agent keeps
    on itself)."""

    def __init__(self):
        self.fbank = OnlineFbank()
        self.src_ctc_prefix_length = 0
        self.tgt_ctc_prefix_length = 0
        self.units: List[int] = []
        self.pushed_finished = False
        self.done = False
        self.turns = 0


class BatchedS2STEvaluator(SentenceLevelEvaluator):
    """Drop-in SentenceLevelEvaluator with wave-batched device work (S2ST)."""

    def __init__(
        self,
        engine: StreamSpeechEngine,
        agent_cfg: StreamSpeechAgentConfig,
        src_dict: Dictionary,
        tgt_dict: Dictionary,
        unit_dict: Dictionary,
        gcmvn: Optional[GlobalCMVN] = None,
        batch: int = 8,
        **evaluator_kwargs,
    ):
        shim = SimpleNamespace(target_type="speech")
        super().__init__(shim,
                         source_segment_size=agent_cfg.source_segment_size,
                         **evaluator_kwargs)
        self.engine = engine
        self.agent_cfg = agent_cfg
        self.src_dict = src_dict
        self.tgt_dict = tgt_dict
        self.unit_dict = unit_dict
        self.gcmvn = gcmvn
        self.batch = batch

    # ------------------------------------------------------------------

    def __call__(self, sources: Sequence, references: Sequence[str],
                 sample_rate: int = 16000, continue_unfinished: bool = False
                 ) -> Dict[str, float]:
        import json
        from pathlib import Path

        done = self._done_indices() if continue_unfinished else set()
        log_f = None
        if self.output_dir:
            log_f = open(Path(self.output_dir) / "instances.log",
                         "a" if continue_unfinished else "w")
        todo = [i for i in range(len(sources)) if i not in done]
        for w in range(0, len(todo), self.batch):
            wave = todo[w: w + self.batch]
            instances = [self._make_instance(i, sources[i], references[i],
                                             sample_rate) for i in wave]
            self._run_wave(instances)
            for ins in instances:
                self.instances[ins.index] = ins
                if log_f:
                    log_f.write(json.dumps(ins.summarize()) + "\n")
                    log_f.flush()
        if log_f:
            log_f.close()
        return self.scores()

    # ------------------------------------------------------------------

    def _run_wave(self, instances: List[Instance]) -> None:
        cfg = self.agent_cfg
        b = len(instances)
        bs = BatchedStreamingSession(self.engine, b)
        st = [_StreamState() for _ in range(b)]

        while True:
            live = [i for i in range(b)
                    if not st[i].done and st[i].turns < self.max_turns]
            if not live:
                break
            # ---- push phase: one segment per live instance, one encode ----
            for i in live:
                seg = instances[i].send_source(self.source_segment_size)
                samples = np.asarray(
                    seg.content if not seg.is_empty else [], np.float32)
                feats = st[i].fbank.push(samples) if len(samples) else \
                    np.zeros((0, 80), np.float32)
                if self.gcmvn is not None and feats.shape[0]:
                    feats = np.asarray(self.gcmvn(feats))
                if not st[i].pushed_finished:
                    bs.push_features(i, feats, finished=seg.finished)
                    st[i].pushed_finished = seg.finished
                st[i].turns += 1
            bs.encode_ready_blocks(cfg.chunk_size, cfg.conv_chunk_size)

            # ---- policy phase: per-stream READ/WRITE decisions -> budgets ----
            # (line-for-line the sequential agent's policy,
            #  agents/streamspeech.py:131-201)
            budgets = np.zeros((b,), np.int64)
            wants = {}   # stream -> (finished, new_subword_tokens, prev_tokens)
            for i in live:
                finished = instances[i].source_finished_reading
                if int(bs.enc_len[i]) == 0:
                    if finished:
                        self._write(instances[i], st[i], np.zeros((0,)),
                                    finished=True, target_finished=True)
                    continue
                hyps = bs.ctc_hypotheses(i)
                asr_tokens, _ = hyps["asr"]
                stt_tokens, _ = hyps["st"]
                if not finished:
                    if (len(asr_tokens) < st[i].src_ctc_prefix_length
                            + cfg.stride_n or
                            len(stt_tokens) < st[i].tgt_ctc_prefix_length
                            + cfg.stride_n):
                        continue  # READ
                    st[i].src_ctc_prefix_length = max(
                        len(asr_tokens), st[i].src_ctc_prefix_length)
                    st[i].tgt_ctc_prefix_length = max(
                        len(stt_tokens), st[i].tgt_ctc_prefix_length)
                    subword_tokens = ((len(stt_tokens) - cfg.lagging_k1)
                                      // cfg.stride_n) * cfg.stride_n
                    if cfg.whole_word:
                        subword_tokens += 1
                    new_subword_tokens = subword_tokens - len(bs.mt_tokens[i])
                    if new_subword_tokens < 1:
                        continue  # READ
                else:
                    new_subword_tokens = -1
                budgets[i] = new_subword_tokens
                wants[i] = (finished, new_subword_tokens,
                            list(bs.mt_tokens[i]))

            if wants:
                bs.mt_decode(budgets, max_len=cfg.max_len)

            # ---- whole-word truncation + write-eligibility ----
            writers = []
            for i, (finished, new_sub, prev_tokens) in wants.items():
                if cfg.whole_word and not finished:
                    toks = bs.mt_tokens[i]
                    j = 0
                    for j in range(len(toks) - 1, -1, -1):
                        if self.tgt_dict[toks[j]].startswith("▁"):
                            break
                    bs.mt_truncate(i, j)
                    if j == 0:
                        continue  # READ
                if bs.mt_tokens[i] == prev_tokens or (
                        not finished and
                        len(bs.mt_tokens[i]) <= len(prev_tokens)):
                    if finished:
                        self._write(instances[i], st[i], np.zeros((0,)),
                                    finished=True, target_finished=True)
                    continue
                writers.append(i)

            # ---- emission phase: ONE fused batched call for all writers ----
            if writers:
                outs = bs.emit()
                for i in writers:
                    finished, new_sub, _ = wants[i]
                    units, wav, dur = outs[i]
                    cur_units = units[len(st[i].units):]
                    if len(units) == 0 or len(cur_units) < 1:
                        if finished:
                            self._write(instances[i], st[i], np.zeros((0,)),
                                        finished=True, target_finished=True)
                        continue
                    cur_wav_len = int(dur[-len(cur_units):].sum()) * 320
                    new_wav = wav[len(wav) - cur_wav_len:] if cur_wav_len > 0 \
                        else wav[:0]
                    st[i].units = units
                    target_finished = finished and new_sub == -1
                    self._write(instances[i], st[i], new_wav,
                                finished=finished,
                                target_finished=target_finished)

    def _write(self, instance: Instance, state: _StreamState,
               wav: np.ndarray, finished: bool, target_finished: bool) -> None:
        instance.receive_prediction(SpeechSegment(
            content=list(np.asarray(wav)), sample_rate=SAMPLE_RATE,
            finished=finished))
        if target_finished or instance.finish_prediction:
            state.done = True
