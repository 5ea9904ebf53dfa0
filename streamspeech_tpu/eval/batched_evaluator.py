"""Batched corpus evaluation: B instances per wave through one lockstep session.

The reference evaluates a corpus strictly sequentially — one SimulEval agent
process, one utterance at a time (`SimulEval/simuleval/evaluator/evaluator.py`
loop). Here the same sentence-level protocol runs B instances concurrently on
one chip: every 320 ms tick, all live instances' segments are ingested, ONE
batched encoder call advances every stream, the per-stream READ/WRITE policy
decisions (identical logic to the sequential agents in agents/streamspeech.py,
behavioral references `agent/speech_to_speech.streamspeech.agent.py:422-770`,
`agent/speech_to_text.{s2tt,asr}.streamspeech.agent.py`) become a budget
vector for ONE scanned MT decode, and (S2ST) writers share ONE fused emission
call.

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

from streamspeech_tpu.agents.base import SpeechSegment, TextSegment
from streamspeech_tpu.agents.streamspeech import (
    SAMPLE_RATE,
    StreamSpeechAgentConfig,
    spm_text,
)
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
        self.emitted_text = ""
        self.pushed_finished = False
        self.done = False
        self.turns = 0


class _BatchedStreamingEvaluator(SentenceLevelEvaluator):
    """Shared wave scheduling + lockstep push phase; subclasses implement the
    per-tick policy/write phase for their output modality."""

    target_type = "speech"

    def __init__(
        self,
        engine: StreamSpeechEngine,
        agent_cfg: StreamSpeechAgentConfig,
        src_dict: Dictionary,
        tgt_dict: Dictionary,
        gcmvn: Optional[GlobalCMVN] = None,
        batch: int = 8,
        mesh=None,
        mesh_axis: str = "data",
        **evaluator_kwargs,
    ):
        shim = SimpleNamespace(target_type=self.target_type)
        super().__init__(shim,
                         source_segment_size=agent_cfg.source_segment_size,
                         **evaluator_kwargs)
        self.engine = engine
        self.agent_cfg = agent_cfg
        self.src_dict = src_dict
        self.tgt_dict = tgt_dict
        self.gcmvn = gcmvn
        self.batch = batch
        # optional scale-out: shard the stream batch over a device mesh
        # (runtime/batched.py _shard_over_mesh) — serving data parallelism
        self.mesh = mesh
        self.mesh_axis = mesh_axis

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
        mesh = self.mesh
        if mesh is not None and b % mesh.shape[self.mesh_axis]:
            mesh = None   # ragged final wave: run it unsharded
        bs = BatchedStreamingSession(self.engine, b, mesh=mesh,
                                     mesh_axis=self.mesh_axis)
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
            if not getattr(self, "use_fused", False):
                # the fused tick encodes inside its single RPC; host ticks
                # need the separate batched encode first
                bs.encode_ready_blocks(cfg.chunk_size, cfg.conv_chunk_size)
            self._tick(bs, st, instances, live)
        for i in range(b):
            # expose per-stream terminal state for drift/quality analysis
            # (scripts/bench_serving.py --drift compares fp32 vs bf16 runs)
            instances[i].final_units = list(st[i].units)
            instances[i].final_text = getattr(st[i], "emitted_text", "")

    def _tick(self, bs, st, instances, live) -> None:
        raise NotImplementedError

    # READ/WRITE gate shared by the S2ST and S2TT policies
    # (agents/streamspeech.py:143-160 / :233-247)
    def _decode_budget(self, bs, st_i, i, finished, whole_word: bool):
        """Returns new_subword_tokens (None = READ this tick)."""
        cfg = self.agent_cfg
        hyps = bs.ctc_hypotheses(i)
        asr_tokens, _ = hyps["asr"]
        stt_tokens, _ = hyps["st"]
        if finished:
            return -1
        if (len(asr_tokens) < st_i.src_ctc_prefix_length + cfg.stride_n or
                len(stt_tokens) < st_i.tgt_ctc_prefix_length + cfg.stride_n):
            return None
        st_i.src_ctc_prefix_length = max(len(asr_tokens),
                                         st_i.src_ctc_prefix_length)
        st_i.tgt_ctc_prefix_length = max(len(stt_tokens),
                                         st_i.tgt_ctc_prefix_length)
        subword_tokens = ((len(stt_tokens) - cfg.lagging_k1)
                          // cfg.stride_n) * cfg.stride_n
        if whole_word:
            subword_tokens += 1
        new_subword_tokens = subword_tokens - len(bs.mt_tokens[i])
        return new_subword_tokens if new_subword_tokens >= 1 else None


class BatchedS2STEvaluator(_BatchedStreamingEvaluator):
    """Drop-in SentenceLevelEvaluator with wave-batched device work (S2ST).

    When the engine carries the fused batched policy program
    (`runtime/session.py policy_step_batched`) and the wave is in lockstep,
    each tick costs ONE device round trip for ALL streams (`use_fused=True`,
    default); out-of-lockstep ticks and rare exact fallbacks (budget over the
    fused scan, emission window overflow) run the host path below, which is
    also the complete implementation for engines without the fused program."""

    target_type = "speech"

    def __init__(self, engine, agent_cfg, src_dict, tgt_dict, unit_dict,
                 gcmvn=None, batch: int = 8, use_fused: bool = True,
                 **evaluator_kwargs):
        super().__init__(engine, agent_cfg, src_dict, tgt_dict, gcmvn, batch,
                         **evaluator_kwargs)
        self.unit_dict = unit_dict
        self.use_fused = use_fused and \
            getattr(engine, "_policy_step_batched", None) is not None
        self._starts_word = None
        if self.use_fused:
            import jax.numpy as jnp
            vocab = engine.model.cfg.mt_decoder.vocab_size
            table = np.zeros((vocab,), bool)
            for i in range(min(len(tgt_dict), vocab)):
                table[i] = tgt_dict[i].startswith("▁")
            self._starts_word = jnp.asarray(table)

    # -- fused lockstep tick (one RPC per tick for the whole wave) ---------

    def _tick(self, bs, st, instances, live) -> None:
        if self.use_fused:
            if self._tick_fused(bs, st, instances, live):
                return
            # tick consumed no device work (out of lockstep): fall through so
            # the host path drains whatever is pending
            bs.encode_ready_blocks(self.agent_cfg.chunk_size,
                                   self.agent_cfg.conv_chunk_size)
        self._tick_host(bs, st, instances, live)

    def _tick_fused(self, bs, st, instances, live) -> bool:
        cfg = self.agent_cfg
        b = bs.batch
        live_set = set(live)
        active = np.asarray([i in live_set and not st[i].done
                             for i in range(b)])
        finished = np.asarray([instances[i].source_finished_reading
                               for i in range(b)])
        out = bs.fused_tick(
            cfg.chunk_size, cfg.conv_chunk_size, cfg.lagging_k1,
            cfg.stride_n, cfg.whole_word, cfg.max_len, self._starts_word,
            np.asarray([st[i].src_ctc_prefix_length for i in range(b)]),
            np.asarray([st[i].tgt_ctc_prefix_length for i in range(b)]),
            np.asarray([len(st[i].units) for i in range(b)]),
            active, finished)
        if out is None:
            return False
        drained = []
        for i in live:
            r = out[i]
            fin = bool(finished[i])
            if r["grew"]:
                st[i].src_ctc_prefix_length = max(
                    r["asr_count"], st[i].src_ctc_prefix_length)
                st[i].tgt_ctc_prefix_length = max(
                    r["st_count"], st[i].tgt_ctc_prefix_length)
            if fin and int(bs.enc_len[i]) == 0:
                self._write(instances[i], st[i], np.zeros((0,)),
                            finished=True, target_finished=True)
                continue
            if fin:
                # finished streams decode in tranches of fused_steps per
                # tick (only once their tail is fully encoded); when a
                # stream stops progressing, a host mt_decode(-1) + one
                # emission reproduces the sequential agent's one-shot finish
                # exactly (greedy is deterministic: an EOS-stopped prefix
                # re-predicts EOS and adds nothing)
                if r["tail_ready"] and (r["hit_eos"] or not r["do_decode"]
                                        or r["keep"] <= r["prev_tokens"]):
                    drained.append(i)
                continue
            if not r["do_decode"]:
                if r["grew"] and r["budget_over"]:
                    # budget exceeded the fused scan — exact host
                    # continuation for this one stream (rare)
                    self._host_continue(bs, st, instances, i, fin)
                continue
            if not r["do_emit"]:
                continue
            if r["ok"]:
                units, new_wav = r["units"], np.asarray(r["tail"])
            else:
                outs = bs.emit_tail([len(st[j].units) for j in range(b)])
                units, new_wav, _ = outs[i]
            if len(units) == 0 or len(units) <= len(st[i].units):
                continue
            st[i].units = list(units)
            self._write(instances[i], st[i], new_wav, finished=False,
                        target_finished=False)
        if drained:
            # exact sequential finish: decode whatever remains (usually
            # nothing — the fused tranches already reached EOS/max_len),
            # then ONE emission + final write per stream
            budgets = np.zeros((b,), np.int64)
            for i in drained:
                budgets[i] = -1
            bs.mt_decode(budgets, max_len=self.agent_cfg.max_len)
            outs = bs.emit_tail([len(st[j].units) for j in range(b)])
            for i in drained:
                if not bs.mt_tokens[i]:
                    self._write(instances[i], st[i], np.zeros((0,)),
                                finished=True, target_finished=True)
                    continue
                units, new_wav, _ = outs[i]
                if len(units) == 0 or len(units) <= len(st[i].units):
                    self._write(instances[i], st[i], np.zeros((0,)),
                                finished=True, target_finished=True)
                    continue
                st[i].units = list(units)
                self._write(instances[i], st[i], new_wav, finished=True,
                            target_finished=True)
        return True

    def _host_continue(self, bs, st, instances, i, fin) -> None:
        """Exact host-path continuation for one stream whose decode budget
        exceeded the fused scan length (mirrors the sequential agent's
        fallback, agents/streamspeech.py _fused_action)."""
        cfg = self.agent_cfg
        hyps = bs.ctc_hypotheses(i)
        stt_tokens, _ = hyps["st"]
        subword = ((len(stt_tokens) - cfg.lagging_k1)
                   // cfg.stride_n) * cfg.stride_n
        if cfg.whole_word:
            subword += 1
        new_sub = subword - len(bs.mt_tokens[i])
        if new_sub < 1:
            return
        budgets = np.zeros((bs.batch,), np.int64)
        budgets[i] = new_sub
        prev_tokens = list(bs.mt_tokens[i])
        bs.mt_decode(budgets, max_len=cfg.max_len)
        if cfg.whole_word and not fin:
            toks = bs.mt_tokens[i]
            j = 0
            for j in range(len(toks) - 1, -1, -1):
                if self.tgt_dict[toks[j]].startswith("▁"):
                    break
            bs.mt_truncate(i, j)
            if j == 0:
                return
        if bs.mt_tokens[i] == prev_tokens or (
                not fin and len(bs.mt_tokens[i]) <= len(prev_tokens)):
            return
        outs = bs.emit_tail([len(st[j].units) for j in range(bs.batch)])
        units, new_wav, _ = outs[i]
        if len(units) == 0 or len(units) <= len(st[i].units):
            return
        st[i].units = list(units)
        self._write(instances[i], st[i], new_wav, finished=fin,
                    target_finished=False)

    # -- host path (complete; also the fallback) ---------------------------

    def _tick_host(self, bs, st, instances, live) -> None:
        cfg = self.agent_cfg
        b = bs.batch
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
            new_sub = self._decode_budget(bs, st[i], i, finished,
                                          cfg.whole_word)
            if new_sub is None:
                continue  # READ
            budgets[i] = new_sub
            wants[i] = (finished, new_sub, list(bs.mt_tokens[i]))

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
            if finished:
                # finished streams always go through the emission path: when
                # the fused ticks deferred the finish emission, tokens may be
                # fully decoded (== prev) yet never vocoded; emit_tail's
                # cur_units check below yields the same empty final write as
                # the sequential agent when nothing is actually pending
                if not bs.mt_tokens[i]:
                    self._write(instances[i], st[i], np.zeros((0,)),
                                finished=True, target_finished=True)
                    continue
                writers.append(i)
                continue
            if bs.mt_tokens[i] == prev_tokens or \
                    len(bs.mt_tokens[i]) <= len(prev_tokens):
                continue
            writers.append(i)

        # ---- emission phase: ONE fused batched call for all writers ----
        if writers:
            outs = bs.emit_tail([len(st[i].units) for i in range(bs.batch)])
            for i in writers:
                finished, new_sub, _ = wants[i]
                units, new_wav, dur = outs[i]
                cur_units = units[len(st[i].units):]
                if len(units) == 0 or len(cur_units) < 1:
                    if finished:
                        self._write(instances[i], st[i], np.zeros((0,)),
                                    finished=True, target_finished=True)
                    continue
                st[i].units = units
                target_finished = finished and new_sub == -1
                self._write(instances[i], st[i], new_wav, finished=finished,
                            target_finished=target_finished)

    def _write(self, instance: Instance, state: _StreamState,
               wav: np.ndarray, finished: bool, target_finished: bool) -> None:
        instance.receive_prediction(SpeechSegment(
            content=list(np.asarray(wav)), sample_rate=SAMPLE_RATE,
            finished=finished))
        if target_finished or instance.finish_prediction:
            state.done = True


class BatchedS2TTEvaluator(_BatchedStreamingEvaluator):
    """Wave-batched simultaneous speech-to-text translation
    (sequential policy: agents/streamspeech.py:219-263). With a fused-capable
    engine each lockstep tick costs ONE RPC (`policy_step_batched` with
    `with_emission=False` — the vocoder stage is skipped wholesale)."""

    target_type = "text"

    def __init__(self, engine, agent_cfg, src_dict, tgt_dict, gcmvn=None,
                 batch: int = 8, use_fused: bool = True, **evaluator_kwargs):
        super().__init__(engine, agent_cfg, src_dict, tgt_dict, gcmvn, batch,
                         **evaluator_kwargs)
        self.use_fused = use_fused and \
            getattr(engine, "_policy_step_batched", None) is not None
        self._starts_word = None
        if self.use_fused:
            import jax.numpy as jnp
            # whole_word is False for S2TT; the program still takes the table
            self._starts_word = jnp.zeros(
                (engine.model.cfg.mt_decoder.vocab_size,), bool)

    def _tick(self, bs, st, instances, live) -> None:
        if self.use_fused:
            if self._tick_fused(bs, st, instances, live):
                return
            bs.encode_ready_blocks(self.agent_cfg.chunk_size,
                                   self.agent_cfg.conv_chunk_size)
        self._tick_host(bs, st, instances, live)

    def _tick_fused(self, bs, st, instances, live) -> bool:
        cfg = self.agent_cfg
        b = bs.batch
        live_set = set(live)
        active = np.asarray([i in live_set and not st[i].done
                             for i in range(b)])
        finished = np.asarray([instances[i].source_finished_reading
                               for i in range(b)])
        out = bs.fused_tick(
            cfg.chunk_size, cfg.conv_chunk_size, cfg.lagging_k1,
            cfg.stride_n, False, cfg.max_len, self._starts_word,
            np.asarray([st[i].src_ctc_prefix_length for i in range(b)]),
            np.asarray([st[i].tgt_ctc_prefix_length for i in range(b)]),
            np.zeros((b,), np.int32), active, finished,
            with_emission=False)
        if out is None:
            return False
        drained = []
        for i in live:
            r = out[i]
            fin = bool(finished[i])
            if r["grew"]:
                st[i].src_ctc_prefix_length = max(
                    r["asr_count"], st[i].src_ctc_prefix_length)
                st[i].tgt_ctc_prefix_length = max(
                    r["st_count"], st[i].tgt_ctc_prefix_length)
            if fin and int(bs.enc_len[i]) == 0:
                self._write_text(instances[i], st[i], "", True)
                continue
            if fin:
                if r["tail_ready"] and (r["hit_eos"] or not r["do_decode"]
                                        or r["keep"] <= r["prev_tokens"]):
                    drained.append(i)
                continue
            if not r["do_decode"]:
                if r["grew"] and r["budget_over"]:
                    self._host_continue(bs, st, instances, i)
                continue
            if r["keep"] <= r["prev_tokens"]:
                continue  # READ (tokens unchanged)
            self._emit_text_diff(bs, st, instances, i, finished=False)
        if drained:
            budgets = np.zeros((b,), np.int64)
            for i in drained:
                budgets[i] = -1
            bs.mt_decode(budgets, max_len=cfg.max_len)
            for i in drained:
                self._emit_text_diff(bs, st, instances, i, finished=True)
        return True

    def _emit_text_diff(self, bs, st, instances, i, finished: bool) -> None:
        full_text = spm_text(self.tgt_dict, bs.mt_tokens[i])
        new_text = full_text[len(st[i].emitted_text):].strip() \
            if full_text.startswith(st[i].emitted_text) else full_text
        st[i].emitted_text = full_text
        if not new_text and not finished:
            return
        self._write_text(instances[i], st[i], new_text, finished)

    def _host_continue(self, bs, st, instances, i) -> None:
        """Exact host continuation when the budget exceeds the fused scan."""
        cfg = self.agent_cfg
        stt_tokens, _ = bs.ctc_hypotheses(i)["st"]
        subword = ((len(stt_tokens) - cfg.lagging_k1)
                   // cfg.stride_n) * cfg.stride_n
        new_sub = subword - len(bs.mt_tokens[i])
        if new_sub < 1:
            return
        budgets = np.zeros((bs.batch,), np.int64)
        budgets[i] = new_sub
        prev = list(bs.mt_tokens[i])
        bs.mt_decode(budgets, max_len=cfg.max_len)
        if bs.mt_tokens[i] == prev:
            return
        self._emit_text_diff(bs, st, instances, i, finished=False)

    def _tick_host(self, bs, st, instances, live) -> None:
        cfg = self.agent_cfg
        b = bs.batch
        budgets = np.zeros((b,), np.int64)
        wants = {}
        for i in live:
            finished = instances[i].source_finished_reading
            if int(bs.enc_len[i]) == 0:
                if finished:
                    self._write_text(instances[i], st[i], "", True)
                continue
            new_sub = self._decode_budget(bs, st[i], i, finished,
                                          whole_word=False)
            if new_sub is None:
                continue
            budgets[i] = new_sub
            wants[i] = (finished, list(bs.mt_tokens[i]))
        if wants:
            bs.mt_decode(budgets, max_len=cfg.max_len)
        for i, (finished, prev) in wants.items():
            if bs.mt_tokens[i] == prev and not finished:
                continue  # READ
            full_text = spm_text(self.tgt_dict, bs.mt_tokens[i])
            new_text = full_text[len(st[i].emitted_text):].strip() \
                if full_text.startswith(st[i].emitted_text) else full_text
            st[i].emitted_text = full_text
            if not new_text and not finished:
                continue
            self._write_text(instances[i], st[i], new_text, finished)

    def _write_text(self, instance, state, text: str, finished: bool) -> None:
        instance.receive_prediction(TextSegment(content=text,
                                                finished=finished))
        if finished or instance.finish_prediction:
            state.done = True


class BatchedASREvaluator(_BatchedStreamingEvaluator):
    """Wave-batched streaming ASR (sequential policy:
    agents/streamspeech.py:281-294 — emit the ASR-CTC text diff each chunk).
    Only the batched encoder runs on device; no MT decode or vocoder."""

    target_type = "text"

    def _tick(self, bs, st, instances, live) -> None:
        for i in live:
            finished = instances[i].source_finished_reading
            asr_tokens, _ = bs.ctc_hypotheses(i)["asr"]
            full_text = spm_text(self.src_dict, asr_tokens)
            new_text = full_text[len(st[i].emitted_text):].strip() \
                if full_text.startswith(st[i].emitted_text) else full_text
            if not new_text and not finished:
                continue
            st[i].emitted_text = full_text
            instance = instances[i]
            instance.receive_prediction(TextSegment(content=new_text,
                                                    finished=finished))
            if finished or instance.finish_prediction:
                st[i].done = True
