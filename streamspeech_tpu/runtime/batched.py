"""Batched multi-stream serving: B concurrent streaming sessions in lockstep.

Production serving runs many live conversations per chip. This session batches
them: one `encode_block` call per tick advances ALL streams (the batch
dimension), the scanned greedy MT decode takes per-stream budgets and decode
positions (KV caches with per-example indices, models/layers._append_kv), and
emission is batched through the NAR unit decoder + vocoder
(StreamSpeechEngine._emit_batched). Per-stream state that differs across
streams — hypothesis lengths, true encoder lengths once a stream finishes — is
carried in per-example index arrays and validity masks, so every stream's
numerics are IDENTICAL to running B independent StreamingSessions
(tests/test_batched.py asserts this at the output level).

The reference serves one utterance per agent process
(`agent/speech_to_speech.streamspeech.agent.py` holds one `self.states`); this
is the TPU-native scale-up: B streams share one set of compiled programs and
one trip through the MXU per tick.

Lockstep contract: all streams advance on a shared block clock. Every tick,
each unfinished stream must have a full block of pending fbank frames buffered;
a stream that finishes mid-block contributes its zero-padded tail with a
per-example valid length (the encoder masks the padding as attention keys and
conv taps — conformer.py encode_block), and afterwards contributes empty
blocks whose outputs are discarded.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from streamspeech_tpu.ops.ctc import ctc_collapse
from streamspeech_tpu.runtime.session import EOS, PAD, StreamSpeechEngine, _bucket


class BatchedStreamingSession:
    """B lockstep streaming sessions sharing every device call.

    ``mesh``: optional `jax.sharding.Mesh` — shards the stream batch over
    ``mesh_axis`` so one lockstep tick SPMD-partitions across chips (each
    device advances B/n streams; the tick is batch-parallel so XLA inserts no
    collectives). This is the serving analogue of data-parallel training: the
    reference serves one utterance per single-GPU agent process
    (`agent/speech_to_speech.streamspeech.agent.py`), while here one logical
    session scales over an ICI-connected slice. Numerics are identical to the
    unsharded session (tests/test_mesh_serving.py).
    """

    def __init__(self, engine: StreamSpeechEngine, batch: int,
                 mesh=None, mesh_axis: str = "data"):
        self.e = engine
        self.batch = batch
        model, v = engine.model, engine.variables
        c = model.cfg
        # all fresh device state in ONE jitted dispatch (the engine's shared
        # _session_init, batch-parameterized) — the previous eager per-layer
        # construction issued hundreds of tiny ops, each a tunnel round trip
        (self.enc_state, self.enc_buf, mt_self,
         mt_cross) = engine._session_init(v, batch=batch,
                                          per_example_index=True)
        self.enc_len = np.zeros((batch,), np.int64)   # true frames per stream
        self.asr_ids: List[List[int]] = [[] for _ in range(batch)]
        self.st_ids: List[List[int]] = [[] for _ in range(batch)]
        self.mt_self = list(mt_self)
        self.mt_cross = list(mt_cross)
        self.mt_tokens: List[List[int]] = [[] for _ in range(batch)]
        self.feat_dim = c.encoder.input_feat_per_channel
        self.pending = [np.zeros((0, self.feat_dim), np.float32)
                        for _ in range(batch)]
        self.finished_input = np.zeros((batch,), bool)
        self.tail_done = np.zeros((batch,), bool)
        if mesh is not None:
            self._shard_over_mesh(mesh, mesh_axis)

    def _shard_over_mesh(self, mesh, axis: str) -> None:
        """Commit the per-stream device state with the batch dim sharded over
        ``axis`` (params stay replicated — the engine's jit programs then
        compile as SPMD over the mesh via sharding propagation)."""
        from jax.sharding import NamedSharding, PartitionSpec

        n = mesh.shape[axis]
        if self.batch % n:
            raise ValueError(
                f"batch {self.batch} not divisible by mesh axis "
                f"'{axis}' size {n}")

        def leaf(x):
            if getattr(x, "ndim", 0) >= 1 and x.shape[0] == self.batch:
                spec = PartitionSpec(axis, *([None] * (x.ndim - 1)))
            else:
                spec = PartitionSpec()   # scalars (pos, shared KV index)
            return jax.device_put(x, NamedSharding(mesh, spec))

        self.enc_state = jax.tree.map(leaf, self.enc_state)
        self.enc_buf = leaf(self.enc_buf)
        self.mt_self = jax.tree.map(leaf, self.mt_self)
        self.mt_cross = jax.tree.map(leaf, self.mt_cross)

    # ------------------------------------------------------------------
    # encoder side (lockstep block clock)
    # ------------------------------------------------------------------

    def push_features(self, stream: int, feats: np.ndarray,
                      finished: bool = False) -> None:
        """Buffer new (already CMVN'd) fbank frames for one stream. Call
        `encode_ready_blocks` after feeding all streams for the tick."""
        assert not self.finished_input[stream], "stream already finished"
        self.pending[stream] = np.concatenate([self.pending[stream], feats],
                                              axis=0)
        if finished:
            self.finished_input[stream] = True

    def encode_ready_blocks(self, chunk_size: int, conv_chunk_size: int) -> int:
        """Run lockstep blocks while every unfinished stream has a full block
        buffered (finished streams contribute their valid-masked tail, then
        empty blocks). Returns the number of blocks encoded."""
        block_enc = math.lcm(max(chunk_size, 1), max(conv_chunk_size, 1))
        block_frames = 4 * block_enc
        ran = 0
        while True:
            have = np.asarray([p.shape[0] for p in self.pending])
            ready = (have >= block_frames) | self.finished_input
            # a tick needs all streams ready and at least one real frame
            if not ready.all() or not (have > 0).any():
                break
            blocks = np.zeros((self.batch, block_frames, self.feat_dim),
                              np.float32)
            valid = np.zeros((self.batch,), np.int32)
            for i in range(self.batch):
                n = min(have[i], block_frames)
                blocks[i, :n] = self.pending[i][:n]
                self.pending[i] = self.pending[i][n:]
                valid[i] = n
                if self.finished_input[i] and self.pending[i].shape[0] == 0:
                    self.tail_done[i] = True
            self._run_block(blocks, valid, chunk_size, conv_chunk_size)
            ran += 1
        return ran

    def _run_block(self, blocks: np.ndarray, valid: np.ndarray, chunk: int,
                   conv_chunk: int) -> None:
        enc, self.enc_state, self.enc_buf, asr_ids, st_ids = \
            self.e._encode_block(self.e.variables, blocks,
                                 self.enc_state, self.enc_buf,
                                 np.asarray(valid, np.int32),
                                 chunk=chunk, conv_chunk=conv_chunk)
        self.mt_cross = self.e._mt_fill_cross(self.e.variables, enc,
                                              self.mt_cross)
        out_valid = -(-valid // 4)    # real encoder frames per stream
        asr_np, st_np = jax.device_get((asr_ids, st_ids))
        for i in range(self.batch):
            n = int(out_valid[i])
            self.asr_ids[i].extend(asr_np[i, :n].tolist())
            self.st_ids[i].extend(st_np[i, :n].tolist())
            self.enc_len[i] += n

    def ctc_hypotheses(self, stream: int) -> Dict[str, Tuple[List[int], List[int]]]:
        return {"asr": ctc_collapse(np.asarray(self.asr_ids[stream]), blank=0),
                "st": ctc_collapse(np.asarray(self.st_ids[stream]), blank=0)}

    # ------------------------------------------------------------------
    # fused lockstep tick: ONE device round trip for ALL streams
    # ------------------------------------------------------------------

    def fused_tick(self, chunk: int, conv_chunk: int, k1: int, n: int,
                   whole_word: bool, max_len: int, starts_word,
                   src_len: np.ndarray, tgt_len: np.ndarray,
                   n_prev_units: np.ndarray, active: np.ndarray,
                   finished: np.ndarray,
                   with_emission: bool = True) -> Optional[List[Dict]]:
        """One lockstep policy tick through `engine._policy_step_batched`
        (encode + gates + decode + rollback + emission for every stream in a
        single RPC). Feed features via `push_features` first. Returns None
        when the tick is not applicable — pending blocks out of lockstep, or
        MT/encoder capacity exceeded — in which case the caller must run the
        host path (`encode_ready_blocks` + `mt_decode` + `emit_tail`)."""
        e = self.e
        if getattr(e, "_policy_step_batched", None) is None:
            return None
        block_enc = math.lcm(max(chunk, 1), max(conv_chunk, 1))
        block_frames = 4 * block_enc
        steps = e.fused_steps
        have = np.asarray([p.shape[0] for p in self.pending])
        unfinished = ~np.asarray(self.finished_input)
        # every active unfinished stream must hold exactly one full block
        if (active & unfinished & ((have // block_frames) != 1)).any():
            return None
        if not ((active & (have > 0)).any()):
            return None
        lens = np.asarray([len(t) for t in self.mt_tokens])
        if (lens[active] + steps).max(initial=0) > e.max_mt_tokens:
            return None
        if (self.enc_len[active] + block_enc).max(initial=0) > \
                e.max_enc_frames:
            return None

        blocks = np.zeros((self.batch, block_frames, self.feat_dim),
                          np.float32)
        valid = np.zeros((self.batch,), np.int32)
        # the finish decode may only start once the whole tail is encoded —
        # i.e. this tick consumes the last pending frames
        tail_ready = np.asarray(self.finished_input) & \
            (have <= block_frames)
        for i in range(self.batch):
            if not active[i]:
                self.pending[i] = self.pending[i][:0]
                continue
            nfr = min(have[i], block_frames)
            blocks[i, :nfr] = self.pending[i][:nfr]
            self.pending[i] = self.pending[i][nfr:]
            valid[i] = nfr
            if self.finished_input[i] and self.pending[i].shape[0] == 0:
                self.tail_done[i] = True

        max_len = min(max_len, e.max_mt_tokens - 2, e.mt_buckets[-1] - 2)
        mt_cap = _bucket(min(int(lens.max(initial=0)) + steps + 2,
                             e.mt_buckets[-1]), e.mt_buckets)
        up = e.model.cfg.unit_decoder.ctc_upsample_rate
        u_cap = _bucket(min(mt_cap * up, e.unit_buckets[-1]), e.unit_buckets)

        mt_buf = np.full((self.batch, e.max_mt_tokens), PAD, np.int32)
        for i, t in enumerate(self.mt_tokens):
            if t:
                mt_buf[i, : len(t)] = t
        asr_count = np.asarray(
            [len(ctc_collapse(np.asarray(ids), blank=0)[0])
             for ids in self.asr_ids], np.int32)
        st_count = np.asarray(
            [len(ctc_collapse(np.asarray(ids), blank=0)[0])
             for ids in self.st_ids], np.int32)
        last_asr = np.asarray([ids[-1] if ids else -1
                               for ids in self.asr_ids], np.int32)
        last_st = np.asarray([ids[-1] if ids else -1
                              for ids in self.st_ids], np.int32)

        (self.enc_state, self.enc_buf, self.mt_self, self.mt_cross, mt_buf_d,
         asr_ids, st_ids, keep, asr_count_d, st_count_d, _, _, units, count,
         dur, tail, cur_len, flags) = e._policy_step_batched(
            e.variables, e.vocoder_variables, blocks, valid,
            np.asarray(self.enc_len, np.int32), self.enc_state, self.enc_buf,
            self.mt_self, self.mt_cross, mt_buf, lens.astype(np.int32),
            np.asarray(src_len, np.int32), np.asarray(tgt_len, np.int32),
            asr_count, st_count, last_asr, last_st,
            np.asarray(n_prev_units, np.int32), starts_word,
            np.asarray(active, bool), np.asarray(finished, bool),
            tail_ready,
            chunk=chunk, conv_chunk=conv_chunk, whole_word=whole_word,
            k1=k1, n=n, steps=steps, mt_cap=mt_cap, unit_capacity=u_cap,
            window_frames=e.emit_window_frames, ctx_frames=e.emit_ctx_frames,
            tail_cap=e.emit_tail_cap, max_len=max_len,
            with_emission=with_emission)

        # Fetch strategy (tunnel RPC discipline, CLAUDE.md): a round trip
        # costs ~35 ms and fetch bandwidth ~47 MB/s. The wav tails are
        # B x tail_cap floats — for small waves one combined fetch wins; once
        # the tail payload alone exceeds ~an RTT of bandwidth, fetch the
        # small bundle first and ride a second RPC for the tails only on
        # ticks where some stream actually emitted.
        tail_bytes = self.batch * self.e.emit_tail_cap * 4
        if tail_bytes <= getattr(self.e, "split_fetch_bytes", 2_000_000):
            (mt_buf_d, asr_ids, st_ids, keep, asr_count_d, st_count_d, units,
             count, dur, tail, cur_len, flags) = jax.device_get(
                (mt_buf_d, asr_ids, st_ids, keep, asr_count_d, st_count_d,
                 units, count, dur, tail, cur_len, flags))
            tails = [tail[i, : int(cur_len[i])] for i in range(self.batch)]
        else:
            (mt_buf_d, asr_ids, st_ids, keep, asr_count_d, st_count_d,
             count, cur_len, flags) = jax.device_get(
                (mt_buf_d, asr_ids, st_ids, keep, asr_count_d, st_count_d,
                 count, cur_len, flags))
            if flags[:, 1].any():
                # slice each stream's VALID tail samples on device (cur_len
                # is host-known now, so these are cheap static slices) and
                # batch-fetch only those bytes in the second RPC
                units, dur, *tails = jax.device_get(
                    (units, dur, *[tail[i, : int(cur_len[i])]
                                   for i in range(self.batch)]))
            else:
                units = dur = None
                tails = [np.zeros((0,), np.float32)] * self.batch

        out: List[Dict] = []
        out_valid = -(-valid // 4)
        for i in range(self.batch):
            ov = int(out_valid[i])
            self.asr_ids[i].extend(asr_ids[i, :ov].tolist())
            self.st_ids[i].extend(st_ids[i, :ov].tolist())
            self.enc_len[i] += ov
            r = {
                "do_decode": bool(flags[i, 0]), "do_emit": bool(flags[i, 1]),
                "ok": bool(flags[i, 2]), "budget_over": bool(flags[i, 3]),
                "hit_eos": bool(flags[i, 4]), "grew": bool(flags[i, 5]),
                "keep": int(keep[i]), "asr_count": int(asr_count_d[i]),
                "st_count": int(st_count_d[i]), "count": int(count[i]),
                "prev_tokens": int(lens[i]),
                "tail_ready": bool(tail_ready[i]),
            }
            if r["do_decode"]:
                self.mt_tokens[i] = mt_buf_d[i][: r["keep"]].tolist()
            if r["do_emit"]:
                r["units"] = units[i, : r["count"]].tolist()
                r["dur"] = dur[i, : r["count"]]
                r["tail"] = tails[i]
            out.append(r)
        return out

    # ------------------------------------------------------------------
    # MT decoding (per-example budgets/positions, one scanned call per round)
    # ------------------------------------------------------------------

    def _cross_valid(self) -> jnp.ndarray:
        return jnp.arange(self.e.max_enc_frames)[None, :] < \
            np.asarray(self.enc_len)[:, None]

    def mt_decode(self, budgets: np.ndarray, max_len: int = 200
                  ) -> List[List[int]]:
        """Greedy continue-from-prefix for all streams at once. budgets [B]
        (0 = hold that stream; <0 = decode to EOS). Returns the hypotheses."""
        max_len = min(max_len, self.e.max_mt_tokens - 2,
                      self.e.mt_buckets[-1] - 2)
        lens = np.asarray([len(t) for t in self.mt_tokens])
        budgets = np.where(np.asarray(budgets) < 0, max_len, budgets)
        # EOS is NOT sticky across calls: like the single session, the next
        # call re-predicts against the (possibly grown) encoder context
        budgets = np.clip(budgets, 0, max_len - lens)
        while (budgets > 0).any():
            chunk_b = np.minimum(budgets, self.e.max_decode_per_call)
            first = np.asarray([t[-1] if t else EOS for t in self.mt_tokens],
                               np.int32)
            offsets = np.asarray([len(t) for t in self.mt_tokens], np.int32)
            toks, emitted, hit_eos, self.mt_self = self.e._mt_decode_greedy(
                self.e.variables, first, offsets,
                np.asarray(chunk_b, np.int32), self.mt_self, self.mt_cross,
                max_steps=self.e.max_decode_per_call,
                cross_valid=self._cross_valid())
            toks, emitted, hit_eos = jax.device_get((toks, emitted, hit_eos))
            for i in range(self.batch):
                self.mt_tokens[i].extend(toks[i, : emitted[i]].tolist())
            new_lens = np.asarray([len(t) for t in self.mt_tokens], np.int32)
            self.mt_self = [kv.truncate(new_lens) for kv in self.mt_self]
            budgets = np.where(hit_eos | (emitted == 0), 0, budgets - emitted)
        return [list(t) for t in self.mt_tokens]

    def mt_truncate(self, stream: int, keep: int) -> None:
        """Whole-word rollback for ONE stream (`agent.py:554-574` semantics);
        other streams' caches are untouched (per-example index truncation)."""
        keep = max(0, min(keep, len(self.mt_tokens[stream])))
        self.mt_tokens[stream] = self.mt_tokens[stream][:keep]
        new_lens = np.asarray([len(t) for t in self.mt_tokens], np.int32)
        self.mt_self = [kv.truncate(new_lens) for kv in self.mt_self]

    # ------------------------------------------------------------------
    # emission (batched NAR synthesis → CTC collapse → vocoder)
    # ------------------------------------------------------------------

    def emit(self) -> List[Tuple[List[int], np.ndarray, np.ndarray]]:
        """One fused device call for all streams: returns per-stream
        (unit dict-ids, wav, per-unit durations)."""
        assert self.e.vocoder is not None, "no vocoder configured"
        lens = [len(t) + 1 for t in self.mt_tokens]
        s = _bucket(min(max(lens), self.e.mt_buckets[-1]),
                    self.e.mt_buckets)
        prev = np.full((self.batch, s), PAD, np.int32)
        for i, t in enumerate(self.mt_tokens):
            prev[i, 0] = EOS
            prev[i, 1: len(t) + 1] = t
        u_bucket = _bucket(
            min(max(lens) * self.e.model.cfg.unit_decoder.ctc_upsample_rate,
                self.e.unit_buckets[-1]), self.e.unit_buckets)
        max_frames = u_bucket * self.e.max_dur_per_unit
        units, count, wav, n_samples, dur = jax.device_get(
            self.e._emit_batched(
                self.e.variables, self.e.vocoder_variables, prev,
                self.enc_buf, np.asarray(self.enc_len),
                np.asarray(lens, np.int32),
                valid_tokens_cap=s, max_frames=max_frames))
        out = []
        for i in range(self.batch):
            c = int(count[i])
            out.append((units[i, :c].tolist(), wav[i, : int(n_samples[i])],
                        dur[i, :c]))
        return out

    def emit_tail(self, n_prev_units: List[int]
                  ) -> List[Tuple[List[int], np.ndarray, np.ndarray]]:
        """Batched tail emission: per-stream (unit dict-ids, NEW wav tail,
        durations) via windowed vocoding + small fetch; falls back to the full
        `emit` for any stream whose window/tail cap is exceeded (rare)."""
        assert self.e.vocoder is not None, "no vocoder configured"
        lens = [len(t) + 1 for t in self.mt_tokens]
        s = _bucket(min(max(lens), self.e.mt_buckets[-1]),
                    self.e.mt_buckets)
        prev = np.full((self.batch, s), PAD, np.int32)
        for i, t in enumerate(self.mt_tokens):
            prev[i, 0] = EOS
            prev[i, 1: len(t) + 1] = t
        u_bucket = _bucket(
            min(max(lens) * self.e.model.cfg.unit_decoder.ctc_upsample_rate,
                self.e.unit_buckets[-1]), self.e.unit_buckets)
        units, count, dur, tail, cur_len, ok = jax.device_get(
            self.e._emit_tail_batched(
                self.e.variables, self.e.vocoder_variables, prev,
                self.enc_buf, np.asarray(self.enc_len),
                np.asarray(lens, np.int32),
                np.asarray(n_prev_units, np.int32),
                valid_tokens_cap=s, unit_capacity=u_bucket,
                window_frames=self.e.emit_window_frames,
                ctx_frames=self.e.emit_ctx_frames,
                tail_cap=self.e.emit_tail_cap))
        full = None
        out = []
        for i in range(self.batch):
            c = int(count[i])
            if not bool(ok[i]):
                if full is None:
                    full = self.emit()
                u, wav, d = full[i]
                new = len(u) - n_prev_units[i]
                cur = int(d[-new:].sum()) * 320 if new > 0 else 0
                out.append((u, wav[len(wav) - cur:] if cur else wav[:0], d))
                continue
            out.append((units[i, :c].tolist(), tail[i, : int(cur_len[i])],
                        dur[i, :c]))
        return out
