"""StreamSpeech streaming agents (S2ST / S2TT / ASR) over the incremental engine.

Policy-exact rebuild of the reference agents:
- Simul-S2ST: `agent/speech_to_speech.streamspeech.agent.py:422-770` — READ/WRITE
  driven by growth of the deduplicated ASR and ST CTC hypotheses; allowed MT
  length = ((tgt_ctc_len − k1)//n)·n; whole-word truncation with KV rollback;
  duration-aware incremental waveform emission (new tail =
  dur[−len(cur_unit):].sum() × 320 samples, `:743-751`).
- Simul-S2TT: `agent/speech_to_text.s2tt.streamspeech.agent.py:381-545`.
- Streaming ASR: `agent/speech_to_text.asr.streamspeech.agent.py:385-433` — emit
  the ASR-CTC text diff each chunk.

The device work is incremental (runtime/session.py) instead of the reference's
full per-chunk recomputation; outputs are identical (tests/test_streaming.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from streamspeech_tpu.agents.base import (
    ReadAction,
    SpeechSegment,
    SpeechToSpeechAgent,
    SpeechToTextAgent,
    TextSegment,
    WriteAction,
)
from streamspeech_tpu.dictionary import Dictionary
from streamspeech_tpu.ops.cmvn import GlobalCMVN
from streamspeech_tpu.ops.fbank import OnlineFbank
from streamspeech_tpu.registry import AGENTS
from streamspeech_tpu.runtime.session import StreamSpeechEngine

SAMPLE_RATE = 16000


@dataclass
class StreamSpeechAgentConfig:
    source_segment_size: int = 320   # ms
    lagging_k1: int = 0
    lagging_k2: int = 0
    stride_n: int = 1
    stride_n2: int = 1
    max_len: int = 200
    whole_word: bool = False         # reference enables it for >=640 ms chunks
    dur_prediction: bool = True
    # overlapped streaming: dispatch chunk N+1 before observing chunk N
    # (runtime/session.py policy_step_pipelined). Identical writes at
    # identical stream positions as the synchronous path; only the host's
    # OBSERVATION lags, so wall-clock throughput stops paying the tunnel
    # round trip per chunk.
    pipelined: bool = False
    pipe_max_lag: int = 8            # in-flight chunks before a forced fetch
    pipe_ready_s: float = 0.05       # age at which an async copy has landed

    @property
    def chunk_size(self) -> int:
        """Attention chunk = segment//40 (`agent.py:395`)."""
        return max(self.source_segment_size // 40, 1)

    @property
    def conv_chunk_size(self) -> int:
        """Conv chunk forced to 16 if chunk >= 16 else 8 (`agent.py:404-413`)."""
        return 16 if self.chunk_size >= 16 else 8


def spm_text(dictionary: Dictionary, ids: List[int]) -> str:
    return dictionary.string(ids, spm_to_text=True)


class _StreamSpeechAgentBase:
    """Shared source-side machinery: incremental fbank + gcmvn + block encode."""

    def __init__(self, engine: StreamSpeechEngine, cfg: StreamSpeechAgentConfig,
                 src_dict: Dictionary, tgt_dict: Dictionary,
                 gcmvn: Optional[GlobalCMVN] = None):
        self.engine = engine
        self.cfg = cfg
        self.src_dict = src_dict
        self.tgt_dict = tgt_dict
        self.gcmvn = gcmvn
        self.fbank = OnlineFbank()

    def reset_stream(self):
        self.fbank.reset()
        self.session = self.engine.new_session()
        self.consumed_samples = 0
        self.src_ctc_prefix_length = 0
        self.tgt_ctc_prefix_length = 0

    def _extract_feats(self, states) -> np.ndarray:
        """New raw samples → incremental fbank → gcmvn."""
        new = states.source[self.consumed_samples:]
        self.consumed_samples = len(states.source)
        feats = self.fbank.push(np.asarray(new, np.float32)) if len(new) else \
            np.zeros((0, 80), np.float32)
        if self.gcmvn is not None and feats.shape[0]:
            feats = np.asarray(self.gcmvn(feats))
        return feats

    def ingest(self, states) -> int:
        """Push any new raw samples through fbank → gcmvn → encoder blocks.
        Returns total encoder frames so far."""
        self.session.push_features(self._extract_feats(states),
                                   self.cfg.chunk_size,
                                   self.cfg.conv_chunk_size,
                                   finished=states.source_finished)
        return self.session.enc_len


@AGENTS.register("streamspeech_s2st")
class StreamSpeechS2STAgent(_StreamSpeechAgentBase, SpeechToSpeechAgent):
    """Flagship simultaneous speech-to-speech agent."""

    def __init__(self, engine, cfg, src_dict, tgt_dict, unit_dict,
                 gcmvn=None, quiet=True):
        _StreamSpeechAgentBase.__init__(self, engine, cfg, src_dict, tgt_dict,
                                        gcmvn)
        self.unit_dict = unit_dict
        self.unit_blank = unit_dict.blank()
        self.quiet = quiet
        # fused single-round-trip policy path (runtime/session.py policy_step):
        # word-start lookup table for the device-side whole-word rollback
        self._starts_word = None
        if engine is not None and getattr(engine, "_policy_step", None) is not None:
            import jax.numpy as jnp
            vocab = engine.model.cfg.mt_decoder.vocab_size
            table = np.zeros((vocab,), bool)
            for i in range(min(len(tgt_dict), vocab)):
                table[i] = tgt_dict[i].startswith("▁")
            self._starts_word = jnp.asarray(table)
        SpeechToSpeechAgent.__init__(self)

    def reset(self):
        super().reset()
        self.reset_stream()
        self.units: List[int] = []
        self.unfinished_wav: Optional[np.ndarray] = None
        self.asr_text = ""
        self.st_text = ""
        self._action_queue: List = []
        self._decision_ms = None

    def _final_write(self):
        self.states.target_finished = True
        content = (self.unfinished_wav.tolist()
                   if self.unfinished_wav is not None else [])
        return WriteAction(SpeechSegment(content=content,
                                         sample_rate=SAMPLE_RATE, finished=True),
                           finished=True)

    def policy(self):
        cfg = self.cfg
        if cfg.pipelined and self._starts_word is not None:
            return self._pipelined_policy()
        finished = self.states.source_finished
        if self._starts_word is not None and not finished:
            feats = self._extract_feats(self.states)
            out = self.session.fused_policy(
                feats, cfg.chunk_size, cfg.conv_chunk_size, cfg.lagging_k1,
                cfg.stride_n, cfg.whole_word, cfg.max_len, self._starts_word,
                self.src_ctc_prefix_length, self.tgt_ctc_prefix_length,
                len(self.units))
            if out is not None:
                return self._fused_action(out)
            # not applicable this chunk: drain pending feats the host way
            self.session.push_features(
                np.zeros((0, feats.shape[1] if feats.ndim == 2 else 80),
                         np.float32),
                cfg.chunk_size, cfg.conv_chunk_size, finished=False)
            if self.session.enc_len == 0:
                return ReadAction()
            return self._host_policy(finished)
        if self.ingest(self.states) == 0:
            return self._final_write() if finished else ReadAction()
        return self._host_policy(finished)

    # ------------------------------------------------------------------
    # overlapped (pipelined) streaming: the device runs the policy with
    # device-resident counters; the host fetches each chunk's bundle with a
    # small lag and turns completed bundles into (queued) actions. Writes
    # carry their decision position so latency bookkeeping is identical to
    # the synchronous path (tests/test_pipelined_policy.py).
    # ------------------------------------------------------------------

    def _pipelined_policy(self):
        import math

        cfg = self.cfg
        ses = self.session
        finished = self.states.source_finished
        feats = self._extract_feats(self.states)
        if feats.shape[0]:
            ses.pending_feats = np.concatenate([ses.pending_feats, feats],
                                               axis=0)
        block_enc = math.lcm(max(cfg.chunk_size, 1),
                             max(cfg.conv_chunk_size, 1))
        block_frames = 4 * block_enc
        n_blocks = ses.pending_feats.shape[0] // block_frames

        if finished:
            self._pipe_drain()
            if self._action_queue:
                return self._action_queue.pop(0)
            ses.push_features(np.zeros((0, 80), np.float32),
                              cfg.chunk_size, cfg.conv_chunk_size,
                              finished=True)
            if ses.enc_len == 0:
                return self._final_write()
            return self._host_policy(True)

        if n_blocks == 1 and ses.pipe_applicable(n_blocks, block_enc):
            if ses.pipe_state is None:
                ses.pipe_set_counters(self.src_ctc_prefix_length,
                                      self.tgt_ctc_prefix_length,
                                      len(self.units))
                ses.pipe_resync()
            block = ses.pending_feats[:block_frames]
            ses.pending_feats = ses.pending_feats[block_frames:]
            decision_ms = len(self.states.source) / 16.0
            ses.pipe_dispatch(block, cfg.chunk_size, cfg.conv_chunk_size,
                              cfg.lagging_k1, cfg.stride_n, cfg.whole_word,
                              cfg.max_len, self._starts_word, decision_ms,
                              block_enc)
        elif n_blocks > 0:
            # non-standard chunk (multiple blocks / caches near capacity):
            # drain, then take the exact host path for the pending audio
            self._pipe_drain()
            ses.push_features(np.zeros((0, 80), np.float32),
                              cfg.chunk_size, cfg.conv_chunk_size,
                              finished=False)
            if ses.enc_len > 0:
                self._decision_ms = len(self.states.source) / 16.0
                act = self._host_policy(False)
                self._decision_ms = None
                if isinstance(act, WriteAction):
                    self._action_queue.append(act)

        # fold any landed bundles into actions
        while True:
            out = self._pipe_poll()
            if out is None:
                break
            self._process_pipe_out(out)
        if self._action_queue:
            return self._action_queue.pop(0)
        return ReadAction()

    def _pipe_poll(self):
        import time

        ses = self.session
        if not ses.pipe_inflight:
            return None
        if (len(ses.pipe_inflight) > self.cfg.pipe_max_lag
                or time.perf_counter() - ses.pipe_inflight[0]["t"]
                >= self.cfg.pipe_ready_s):
            return ses.pipe_fetch_oldest()
        return None

    def _pipe_drain(self):
        """Fetch every in-flight bundle (in order) into actions."""
        while self.session.pipe_inflight:
            self._process_pipe_out(self.session.pipe_fetch_oldest())
        self.session.pipe_state = None

    def _process_pipe_out(self, out):
        """Turn one fetched chunk bundle into mirror updates + a queued
        action — the lagged twin of `_fused_action`. Fallback conditions
        (decode budget beyond the fused scan; emission window overflow)
        invalidate the device's later speculation: handle this chunk through
        the exact host path, then REPLAY the remaining in-flight chunks
        host-side (the encoder-side data in their bundles is always valid)."""
        cfg = self.cfg
        ses = self.session
        hyps = ses.ctc_hypotheses()
        self.asr_text = spm_text(self.src_dict, hyps["asr"][0])
        self.st_text = spm_text(self.tgt_dict, hyps["st"][0])
        if out["grew"]:
            self.src_ctc_prefix_length = max(out["asr_count"],
                                             self.src_ctc_prefix_length)
            self.tgt_ctc_prefix_length = max(out["st_count"],
                                             self.tgt_ctc_prefix_length)

        budget_fallback = (out["grew"] and out["budget_over"]
                           and not out["do_decode"])
        emit_fallback = out["do_emit"] and not out["ok"]
        if budget_fallback:
            self._pipe_budget_fallback(out)
            return
        if emit_fallback:
            self._pipe_emit_fallback(out)
            return
        if not out["do_decode"] or not out["do_emit"]:
            return  # READ
        prev_units = len(self.units)
        units, new_wav = out["units"], out["tail"]
        if len(units) == 0 or len(units) <= prev_units:
            return  # READ (no new units)
        if self.unfinished_wav is not None and len(self.unfinished_wav) > 0:
            new_wav = np.concatenate([self.unfinished_wav,
                                      np.asarray(new_wav)])
            self.unfinished_wav = None
        self.units = list(units)
        self._action_queue.append(WriteAction(
            SpeechSegment(content=np.asarray(new_wav).tolist(),
                          sample_rate=SAMPLE_RATE, finished=False,
                          decision_ms=out["decision_ms"]),
            finished=False))

    def _pipe_budget_fallback(self, out):
        """Chunk budget exceeded the fused scan: the device skipped the
        decode (and — by budget monotonicity — so did every later in-flight
        chunk, leaving the MT caches untouched at this chunk's state). Run
        the exact host continuation here, then replay the remaining chunks
        through the host policy (their speculative gate decisions assumed the
        stale hypothesis length)."""
        cfg = self.cfg
        ses = self.session
        subword = ((out["st_count"] - cfg.lagging_k1)
                   // cfg.stride_n) * cfg.stride_n
        if cfg.whole_word:
            subword += 1
        new_subword = subword - len(ses.mt_tokens)
        ses.pipe_truncate_to_mirror()  # safety; no-op when nothing speculated
        if new_subword >= 1:
            self._decision_ms = out["decision_ms"]
            act = self._decode_and_emit(False, new_subword)
            self._decision_ms = None
            if isinstance(act, WriteAction):
                self._action_queue.append(act)
        # replay the rest host-side, chunk by chunk
        while ses.pipe_inflight:
            rep = ses.pipe_fetch_oldest(encoder_only=True)
            self._decision_ms = rep["decision_ms"]
            act = self._host_policy(False)
            self._decision_ms = None
            if isinstance(act, WriteAction):
                self._action_queue.append(act)
        ses.pipe_state = None

    def _pipe_emit_fallback(self, out):
        """The windowed tail overflowed (ok=False): run the full-emission
        host fallback for this chunk, then re-derive the remaining in-flight
        chunks' EMISSIONS host-side (their decodes are valid — emission is
        the only n_units-dependent step)."""
        ses = self.session
        prev_units = len(self.units)
        self._emit_from_host(prev_units, out["decision_ms"])
        while ses.pipe_inflight:
            rep = ses.pipe_fetch_oldest()
            if rep["grew"]:
                self.src_ctc_prefix_length = max(rep["asr_count"],
                                                 self.src_ctc_prefix_length)
                self.tgt_ctc_prefix_length = max(rep["st_count"],
                                                 self.tgt_ctc_prefix_length)
            if rep["do_decode"] and rep["do_emit"]:
                self._emit_from_host(len(self.units), rep["decision_ms"])
        ses.pipe_state = None

    def _emit_from_host(self, prev_units, decision_ms):
        units, new_wav, _ = self.session.emit_tail(prev_units)
        if len(units) == 0 or len(units) <= prev_units:
            return
        if self.unfinished_wav is not None and len(self.unfinished_wav) > 0:
            new_wav = np.concatenate([self.unfinished_wav,
                                      np.asarray(new_wav)])
            self.unfinished_wav = None
        self.units = list(units)
        self._action_queue.append(WriteAction(
            SpeechSegment(content=np.asarray(new_wav).tolist(),
                          sample_rate=SAMPLE_RATE, finished=False,
                          decision_ms=decision_ms),
            finished=False))

    def _fused_action(self, out):
        """Translate the fused policy-step bundle into an Action. All numeric
        decisions were made on device with reference semantics; this is pure
        bookkeeping + the rare exact fallbacks."""
        cfg = self.cfg
        hyps = self.session.ctc_hypotheses()
        self.asr_text = spm_text(self.src_dict, hyps["asr"][0])
        self.st_text = spm_text(self.tgt_dict, hyps["st"][0])
        if out["grew"]:
            self.src_ctc_prefix_length = max(out["asr_count"],
                                             self.src_ctc_prefix_length)
            self.tgt_ctc_prefix_length = max(out["st_count"],
                                             self.tgt_ctc_prefix_length)
        if not out["do_decode"]:
            if out["grew"] and out["budget_over"]:
                # budget exceeded the fused scan length — run the exact host
                # continuation for this chunk (device caches untouched)
                subword = ((out["st_count"] - cfg.lagging_k1)
                           // cfg.stride_n) * cfg.stride_n
                if cfg.whole_word:
                    subword += 1
                new_subword = subword - len(self.session.mt_tokens)
                if new_subword < 1:
                    return ReadAction()
                return self._decode_and_emit(False, new_subword)
            return ReadAction()
        prev_units = len(self.units)
        if not out["do_emit"]:
            # rollback-to-zero or same/shorter prefix — reference READs
            return ReadAction()
        if not out["ok"]:
            units, new_wav, dur = self.session.emit_tail(prev_units)
        else:
            units, new_wav = out["units"], out["tail"]
        if len(units) == 0 or len(units) <= prev_units:
            return ReadAction()
        if self.unfinished_wav is not None and len(self.unfinished_wav) > 0:
            new_wav = np.concatenate([self.unfinished_wav,
                                      np.asarray(new_wav)])
            self.unfinished_wav = None
        self.units = list(units)
        return WriteAction(
            SpeechSegment(content=np.asarray(new_wav).tolist(),
                          sample_rate=SAMPLE_RATE, finished=False),
            finished=False)

    def _host_policy(self, finished):
        cfg = self.cfg
        hyps = self.session.ctc_hypotheses()
        asr_tokens, _ = hyps["asr"]
        st_tokens, _ = hyps["st"]
        self.asr_text = spm_text(self.src_dict, asr_tokens)
        self.st_text = spm_text(self.tgt_dict, st_tokens)

        if not finished:
            # READ while the dedup'd CTC hypotheses haven't grown by stride_n
            if (len(asr_tokens) < self.src_ctc_prefix_length + cfg.stride_n or
                    len(st_tokens) < self.tgt_ctc_prefix_length + cfg.stride_n):
                return ReadAction()
            self.src_ctc_prefix_length = max(len(asr_tokens),
                                             self.src_ctc_prefix_length)
            self.tgt_ctc_prefix_length = max(len(st_tokens),
                                             self.tgt_ctc_prefix_length)
            subword_tokens = ((len(st_tokens) - cfg.lagging_k1)
                              // cfg.stride_n) * cfg.stride_n
            if cfg.whole_word:
                subword_tokens += 1
            new_subword_tokens = subword_tokens - len(self.session.mt_tokens)
            if new_subword_tokens < 1:
                return ReadAction()
        else:
            new_subword_tokens = -1
        return self._decode_and_emit(finished, new_subword_tokens)

    def _decode_and_emit(self, finished, new_subword_tokens):
        cfg = self.cfg
        prev_tokens = list(self.session.mt_tokens)
        self.session.mt_decode(new_subword_tokens, max_len=cfg.max_len)

        if cfg.whole_word and not finished:
            toks = self.session.mt_tokens
            j = 0
            for j in range(len(toks) - 1, -1, -1):
                if self.tgt_dict[toks[j]].startswith("▁"):
                    break
            self.session.mt_truncate(j)
            if j == 0:
                return ReadAction()

        if self.session.mt_tokens == prev_tokens or (
                not finished and
                len(self.session.mt_tokens) <= len(prev_tokens)):
            return self._final_write() if finished else ReadAction()

        # fused device-side tail emission: unit synthesis + CTC collapse +
        # windowed vocoding in one round trip, fetching only the NEW wav
        # (runtime/session.py emit_tail)
        units, new_wav, dur = self.session.emit_tail(len(self.units))
        if len(units) == 0:
            return self._final_write() if finished else ReadAction()
        cur_units = units[len(self.units):]
        if len(cur_units) < 1:
            return self._final_write() if finished else ReadAction()
        if self.unfinished_wav is not None and len(self.unfinished_wav) > 0:
            new_wav = np.concatenate([self.unfinished_wav, new_wav])
            self.unfinished_wav = None
        self.units = units

        target_finished = finished and new_subword_tokens == -1
        if target_finished:
            self.states.target_finished = True
        return WriteAction(
            SpeechSegment(content=new_wav.tolist(), sample_rate=SAMPLE_RATE,
                          finished=finished,
                          decision_ms=getattr(self, "_decision_ms", None)),
            finished=target_finished)


@AGENTS.register("streamspeech_s2tt")
class StreamSpeechS2TTAgent(_StreamSpeechAgentBase, SpeechToTextAgent):
    """Simultaneous speech-to-text translation: encoder + CTC policy + MT decoder
    (`agent/speech_to_text.s2tt.streamspeech.agent.py:381-545`)."""

    def __init__(self, engine, cfg, src_dict, tgt_dict, gcmvn=None):
        _StreamSpeechAgentBase.__init__(self, engine, cfg, src_dict, tgt_dict,
                                        gcmvn)
        SpeechToTextAgent.__init__(self)

    def reset(self):
        super().reset()
        self.reset_stream()
        self.emitted_text = ""

    def policy(self):
        cfg = self.cfg
        finished = self.states.source_finished
        if self.ingest(self.states) == 0:
            if finished:
                self.states.target_finished = True
                return WriteAction(TextSegment(content="", finished=True),
                                   finished=True)
            return ReadAction()

        hyps = self.session.ctc_hypotheses()
        asr_tokens, _ = hyps["asr"]
        st_tokens, _ = hyps["st"]

        if not finished:
            if (len(asr_tokens) < self.src_ctc_prefix_length + cfg.stride_n or
                    len(st_tokens) < self.tgt_ctc_prefix_length + cfg.stride_n):
                return ReadAction()
            self.src_ctc_prefix_length = max(len(asr_tokens),
                                             self.src_ctc_prefix_length)
            self.tgt_ctc_prefix_length = max(len(st_tokens),
                                             self.tgt_ctc_prefix_length)
            subword_tokens = ((len(st_tokens) - cfg.lagging_k1)
                              // cfg.stride_n) * cfg.stride_n
            new_subword_tokens = subword_tokens - len(self.session.mt_tokens)
            if new_subword_tokens < 1:
                return ReadAction()
        else:
            new_subword_tokens = -1

        prev = list(self.session.mt_tokens)
        self.session.mt_decode(new_subword_tokens, max_len=cfg.max_len)
        if self.session.mt_tokens == prev and not finished:
            return ReadAction()

        full_text = spm_text(self.tgt_dict, self.session.mt_tokens)
        new_text = full_text[len(self.emitted_text):].strip() \
            if full_text.startswith(self.emitted_text) else full_text
        self.emitted_text = full_text
        if not new_text and not finished:
            return ReadAction()
        if finished:
            self.states.target_finished = True
        return WriteAction(TextSegment(content=new_text, finished=finished),
                           finished=finished)


@AGENTS.register("streamspeech_asr")
class StreamSpeechASRAgent(_StreamSpeechAgentBase, SpeechToTextAgent):
    """Streaming ASR: emit the ASR-CTC text diff each chunk
    (`agent/speech_to_text.asr.streamspeech.agent.py:385-433`)."""

    def __init__(self, engine, cfg, src_dict, gcmvn=None):
        _StreamSpeechAgentBase.__init__(self, engine, cfg, src_dict, src_dict,
                                        gcmvn)
        SpeechToTextAgent.__init__(self)

    def reset(self):
        super().reset()
        self.reset_stream()
        self.emitted_text = ""

    def policy(self):
        finished = self.states.source_finished
        self.ingest(self.states)
        asr_tokens, _ = self.session.ctc_hypotheses()["asr"]
        full_text = spm_text(self.src_dict, asr_tokens)
        new_text = full_text[len(self.emitted_text):].strip() \
            if full_text.startswith(self.emitted_text) else full_text
        if not new_text and not finished:
            return ReadAction()
        self.emitted_text = full_text
        if finished:
            self.states.target_finished = True
        return WriteAction(TextSegment(content=new_text, finished=finished),
                           finished=finished)
