"""Streaming inference engine: incremental encoder + cached decoders + vocoder.

This is the TPU-native replacement for the reference agent's per-chunk full
recomputation (`agent/speech_to_speech.streamspeech.agent.py:422-770` re-extracts
fbank, re-encodes the whole utterance, and re-runs generators every 320 ms chunk —
O(T²) device work per utterance). Here:

- fbank is extracted incrementally (ops/fbank.OnlineFbank — mathematically exact);
- the encoder advances one block per chunk over ring KV/conv caches
  (`encode_block`, exact by chunk-mask prefix invariance);
- MT decoding continues from its KV caches, with whole-word truncation pruning
  (`agent.py:554-574` semantics via KVCache.truncate);
- the unit-synthesis emission path (MT features → T2U → NAR unit CTC → vocoder)
  re-runs over the full prefix exactly as the reference does at emission time
  (`agent.py:638-751`) — it is the cheap part and keeps numerics identical.

All jitted entry points have static (bucketed) shapes: one compiled program per
(block size, mt bucket, unit bucket).
"""

from __future__ import annotations

import functools
import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from streamspeech_tpu.models.layers import KVCache
from streamspeech_tpu.models.streamspeech import StreamSpeechModel
from streamspeech_tpu.models.vocoder import CodeGenerator
from streamspeech_tpu.ops.ctc import ctc_collapse

EOS = 2
PAD = 1


def _bucket(n: int, buckets: Tuple[int, ...]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"length {n} exceeds largest bucket {buckets[-1]}")


class StreamSpeechEngine:
    """Owns the model variables and all jitted closures (shared across sessions)."""

    def __init__(
        self,
        model: StreamSpeechModel,
        variables: Dict,
        vocoder: Optional[CodeGenerator] = None,
        vocoder_variables: Optional[Dict] = None,
        max_enc_frames: int = 512,
        max_mt_tokens: int = 128,
        mt_buckets: Tuple[int, ...] = (16, 32, 64, 128),
        unit_buckets: Tuple[int, ...] = (64, 128, 256, 512),
        max_dur_per_unit: int = 4,
    ):
        self.model = model
        self.variables = {"params": variables["params"],
                          "batch_stats": variables.get("batch_stats", {})}
        self.vocoder = vocoder
        self.vocoder_variables = vocoder_variables
        self.max_enc_frames = max_enc_frames
        self.max_mt_tokens = max_mt_tokens
        self.mt_buckets = mt_buckets
        self.unit_buckets = unit_buckets
        self.max_dur_per_unit = max_dur_per_unit
        c = model.cfg

        @functools.partial(jax.jit, static_argnames=("chunk", "conv_chunk"),
                           donate_argnums=(2, 3))  # state + enc_buf buffers are
        # consumed and rewritten every chunk — donation avoids copying the
        # 12-layer KV caches per block
        def encode_block(variables, block, state, enc_buf, valid_len, chunk,
                         conv_chunk):
            enc, state, asr_ids, st_ids = model.apply(
                variables, block, state, chunk, conv_chunk, valid_len,
                method=StreamSpeechModel.encode_block_with_ctc)
            enc_buf = jax.lax.dynamic_update_slice(
                enc_buf, enc, (0, state.pos - enc.shape[1], 0))
            return enc, state, enc_buf, asr_ids, st_ids

        self._encode_block = encode_block

        @jax.jit
        def mt_fill_cross(variables, enc_new, cross_caches):
            return model.apply(variables, enc_new, cross_caches,
                               method=StreamSpeechModel.mt_fill_cross)

        self._mt_fill_cross = mt_fill_cross

        @jax.jit
        def mt_step(variables, token, offset, self_caches, cross_caches):
            logits, feats, self_caches = model.apply(
                variables, token, offset, self_caches, cross_caches,
                method=StreamSpeechModel.mt_decoder_step)
            return jnp.argmax(logits[:, -1], axis=-1), self_caches

        self._mt_step = mt_step

        @functools.partial(jax.jit, static_argnames=("max_steps",))
        def mt_decode_greedy(variables, first, offset, budget, self_caches,
                             cross_caches, max_steps, cross_valid=None):
            return model.apply(variables, first, offset, budget, self_caches,
                               cross_caches, max_steps, cross_valid,
                               method=StreamSpeechModel.mt_decode_greedy)

        self._mt_decode_greedy = mt_decode_greedy
        self.max_decode_per_call = 16

        @functools.partial(jax.jit, static_argnames=())
        def synthesize(variables, mt_tokens, enc_buf, enc_len):
            ids, logits = model.apply(variables, mt_tokens, enc_buf, enc_len,
                                      method=StreamSpeechModel.synthesize_units)
            return ids

        self._synthesize = synthesize

        if vocoder is not None:
            @functools.partial(jax.jit, static_argnames=("max_frames",))
            def vocode(voc_vars, codes, dur_mask, max_frames):
                dur = vocoder.apply(voc_vars, codes,
                                    method=CodeGenerator.predict_durations)
                dur = dur * dur_mask  # zero out padding units
                wav, n_samples, dur = vocoder.apply(voc_vars, codes, dur,
                                                    max_frames)
                return wav, n_samples, dur

            self._vocode = vocode

            unit_blank = model.cfg.unit_decoder.vocab_size - 1
            nspecial = 4

            @functools.partial(jax.jit,
                               static_argnames=("valid_tokens_cap",
                                                "max_frames"))
            def emit(variables, voc_vars, mt_tokens, enc_buf, enc_len,
                     n_tokens, valid_tokens_cap, max_frames):
                """Fused emission: NAR unit synthesis → device-side CTC collapse
                → duration prediction → waveform. ONE host round trip for the
                whole reference emission path (`agent.py:638-751`)."""
                from streamspeech_tpu.ops.ctc import ctc_collapse_device

                ids = model.apply(variables, mt_tokens, enc_buf, enc_len,
                                  method=StreamSpeechModel.synthesize_units)[0]
                up = model.cfg.unit_decoder.ctc_upsample_rate
                ids = ids[0][: valid_tokens_cap * up]
                # hide positions beyond the real prefix + non-unit symbols
                pos_valid = jnp.arange(ids.shape[0]) < n_tokens * up
                is_unit = (ids >= nspecial) & (ids < unit_blank)
                ids = jnp.where(pos_valid & is_unit, ids, unit_blank)
                units, count = ctc_collapse_device(ids, blank=unit_blank)
                codes = jnp.where(units == unit_blank, 0, units - nspecial)
                capacity = max_frames // self.max_dur_per_unit
                count = jnp.minimum(count, capacity)
                # static resize to the vocoder bucket: capacity may exceed the
                # available ids (few tokens, large unit bucket) — pad; excess
                # codes are masked by dur_mask either way
                if capacity > codes.shape[0]:
                    codes = jnp.pad(codes, (0, capacity - codes.shape[0]))
                codes = codes[None, :capacity]
                dur_mask = (jnp.arange(capacity) < count).astype(jnp.int32)
                dur = vocoder.apply(voc_vars, codes,
                                    method=CodeGenerator.predict_durations)
                dur = dur * dur_mask[None]
                wav, n_samples, dur = vocoder.apply(voc_vars, codes, dur,
                                                    max_frames)
                return units, count, wav[0], n_samples[0], dur[0]

            self._emit = emit

            @functools.partial(jax.jit,
                               static_argnames=("valid_tokens_cap",
                                                "max_frames"))
            def emit_batched(variables, voc_vars, mt_tokens, enc_buf, enc_len,
                             n_tokens, valid_tokens_cap, max_frames):
                """Batched fused emission for multi-stream serving: the same
                path as `emit` with per-stream token counts n_tokens [B] and
                encoder lengths enc_len [B]; everything stays batched through
                the NAR unit decoder, CTC collapse, and vocoder."""
                from streamspeech_tpu.ops.ctc import ctc_collapse_device

                ids = model.apply(variables, mt_tokens, enc_buf, enc_len,
                                  method=StreamSpeechModel.synthesize_units)[0]
                up = model.cfg.unit_decoder.ctc_upsample_rate
                ids = ids[:, : valid_tokens_cap * up]
                pos_valid = jnp.arange(ids.shape[1])[None, :] < \
                    (n_tokens * up)[:, None]
                is_unit = (ids >= nspecial) & (ids < unit_blank)
                ids = jnp.where(pos_valid & is_unit, ids, unit_blank)
                units, count = ctc_collapse_device(ids, blank=unit_blank)
                codes = jnp.where(units == unit_blank, 0, units - nspecial)
                capacity = max_frames // self.max_dur_per_unit
                count = jnp.minimum(count, capacity)
                if capacity > codes.shape[1]:
                    codes = jnp.pad(codes,
                                    ((0, 0), (0, capacity - codes.shape[1])))
                codes = codes[:, :capacity]
                dur_mask = (jnp.arange(capacity)[None, :]
                            < count[:, None]).astype(jnp.int32)
                dur = vocoder.apply(voc_vars, codes,
                                    method=CodeGenerator.predict_durations)
                dur = dur * dur_mask
                wav, n_samples, dur = vocoder.apply(voc_vars, codes, dur,
                                                    max_frames)
                return units, count, wav, n_samples, dur

            self._emit_batched = emit_batched

    def new_session(self) -> "StreamingSession":
        return StreamingSession(self)


class StreamingSession:
    """Per-utterance state + host-side orchestration (batch 1)."""

    def __init__(self, engine: StreamSpeechEngine):
        self.e = engine
        model, v = engine.model, engine.variables
        c = model.cfg
        self.enc_state = model.apply(
            v, 1, engine.max_enc_frames,
            method=StreamSpeechModel.encoder_stream_init)
        self.enc_buf = jnp.zeros((1, engine.max_enc_frames, c.encoder.embed_dim))
        self.enc_len = 0
        self.asr_ids: List[int] = []
        self.st_ids: List[int] = []
        # MT decoder caches: self-attn per layer + cross per layer
        dc = c.mt_decoder
        h, dh = dc.attention_heads, dc.embed_dim // dc.attention_heads
        self.mt_self = [KVCache.create(1, engine.max_mt_tokens, h, dh)
                        for _ in range(dc.layers)]
        self.mt_cross = [KVCache.create(1, engine.max_enc_frames, h, dh)
                         for _ in range(dc.layers)]
        self.mt_tokens: List[int] = []  # hypothesis (dict ids), EXCLUDING leading eos
        self.mt_steps = 0               # tokens fed (incl. leading eos)
        self.units: List[int] = []      # emitted units (dictionary ids)
        self.pending_feats = np.zeros((0, c.encoder.input_feat_per_channel),
                                      np.float32)
        self.finished_input = False

    # ------------------------------------------------------------------
    # encoder side
    # ------------------------------------------------------------------

    def push_features(self, feats: np.ndarray, chunk_size: int,
                      conv_chunk_size: int, finished: bool = False) -> int:
        """Feed new (already CMVN'd) fbank frames; encodes all complete blocks
        (block = 4*chunk_size fbank frames), plus the padded tail at finish.
        Returns number of new encoder frames."""
        self.pending_feats = np.concatenate([self.pending_feats, feats], axis=0)
        # Blocks must be whole DEPTHWISE-conv chunks (the conv is non-causal
        # within a chunk: outputs in the first half of a chunk read its second
        # half) and whole attention chunks; a partial chunk is only valid as the
        # final tail. lcm covers mixed settings like chunk 24 / conv_chunk 8.
        block_enc = math.lcm(max(chunk_size, 1), max(conv_chunk_size, 1))
        block_frames = 4 * block_enc
        new_frames = 0
        while self.pending_feats.shape[0] >= block_frames:
            block = self.pending_feats[:block_frames]
            self.pending_feats = self.pending_feats[block_frames:]
            new_frames += self._run_block(block, chunk_size, conv_chunk_size)
        if finished and not self.finished_input:
            self.finished_input = True
            tail = self.pending_feats
            self.pending_feats = tail[:0]
            if tail.shape[0] > 0:
                pad_to = -(-tail.shape[0] // 4) * 4
                block = np.zeros((pad_to, tail.shape[1]), np.float32)
                block[: tail.shape[0]] = tail
                new_frames += self._run_block(block, chunk_size, conv_chunk_size,
                                              valid_len=tail.shape[0])
        return new_frames

    def _run_block(self, block: np.ndarray, chunk: int, conv_chunk: int,
                   valid_len: Optional[int] = None) -> int:
        vl = jnp.asarray(block.shape[0] if valid_len is None else valid_len,
                         jnp.int32)
        enc, self.enc_state, self.enc_buf, asr_ids, st_ids = self.e._encode_block(
            self.e.variables, jnp.asarray(block)[None], self.enc_state,
            self.enc_buf, vl, chunk=chunk, conv_chunk=conv_chunk)
        s = enc.shape[1]
        self.enc_len += s
        # grow MT cross-attn caches with the new frames
        self.mt_cross = self.e._mt_fill_cross(self.e.variables, enc,
                                              self.mt_cross)
        self.asr_ids.extend(np.asarray(asr_ids[0]).tolist())
        self.st_ids.extend(np.asarray(st_ids[0]).tolist())
        return s

    def ctc_hypotheses(self) -> Dict[str, Tuple[List[int], List[int]]]:
        """Collapsed (tokens, frame indices) for the ASR and ST CTC heads
        (blank = 0, `agent/ctc_decoder.py:67-89`)."""
        return {
            "asr": ctc_collapse(np.asarray(self.asr_ids), blank=0),
            "st": ctc_collapse(np.asarray(self.st_ids), blank=0),
        }

    # ------------------------------------------------------------------
    # MT decoding
    # ------------------------------------------------------------------

    def mt_decode(self, max_new_tokens: int, max_len: int = 200) -> List[int]:
        """Greedy continue-from-prefix; decodes up to max_new_tokens (or to EOS
        when max_new_tokens < 0). Returns the full hypothesis (no leading eos).
        """
        # hypothesis length is bounded by the KV-cache capacity and the largest
        # MT shape bucket (long-utterance safety)
        max_len = min(max_len, self.e.max_mt_tokens - 2,
                      self.e.mt_buckets[-1] - 2)
        budget = max_new_tokens if max_new_tokens >= 0 else max_len
        # Invariant at entry/exit: mt_steps == len(mt_tokens) — the KV caches hold
        # feeds of [eos] + tokens[:-1]; the newest token is always un-fed. This is
        # the same invariant the reference maintains via whole-word KV pruning
        # (`agent.py:554-574`); on an EOS prediction the feed that predicted it is
        # rolled back so the next call re-predicts against the grown encoder.
        # Decoding runs in scanned multi-token jit calls: ONE device round trip
        # per ≤ max_decode_per_call tokens.
        while budget > 0 and len(self.mt_tokens) < max_len:
            chunk_budget = min(budget, self.e.max_decode_per_call,
                               max_len - len(self.mt_tokens))
            feed = self.mt_tokens[-1] if self.mt_tokens else EOS
            toks, emitted, hit_eos, self.mt_self = self.e._mt_decode_greedy(
                self.e.variables, jnp.asarray([feed], jnp.int32),
                jnp.asarray(self.mt_steps, jnp.int32),
                jnp.asarray(chunk_budget, jnp.int32),
                self.mt_self, self.mt_cross,
                max_steps=self.e.max_decode_per_call)
            n = int(emitted[0])
            self.mt_tokens.extend(np.asarray(toks[0])[:n].tolist())
            self.mt_steps += n
            self.mt_self = [kv.truncate(jnp.asarray(self.mt_steps, jnp.int32))
                            for kv in self.mt_self]
            budget -= n
            if bool(hit_eos[0]) or n == 0:
                break
        return list(self.mt_tokens)

    def mt_truncate(self, keep: int):
        """Whole-word rollback: keep the first ``keep`` hypothesis tokens and
        prune the self-attn KV caches (`agent.py:554-574`)."""
        keep = max(0, min(keep, len(self.mt_tokens)))
        drop = len(self.mt_tokens) - keep
        if drop <= 0:
            return
        self.mt_tokens = self.mt_tokens[:keep]
        self.mt_steps -= drop
        self.mt_self = [kv.truncate(jnp.asarray(self.mt_steps, jnp.int32))
                        for kv in self.mt_self]

    # ------------------------------------------------------------------
    # unit synthesis + vocoder
    # ------------------------------------------------------------------

    def synthesize_units(self, unit_blank: int) -> List[int]:
        """Full-prefix NAR unit generation; returns collapsed unit dict-ids."""
        tokens = [EOS] + self.mt_tokens
        s = _bucket(len(tokens), self.e.mt_buckets)
        padded = np.full((1, s), PAD, np.int32)
        padded[0, : len(tokens)] = tokens
        ids = self.e._synthesize(self.e.variables, jnp.asarray(padded),
                                 self.enc_buf, jnp.asarray(self.enc_len))
        up = self.e.model.cfg.unit_decoder.ctc_upsample_rate
        valid = len(tokens) * up
        ids = np.asarray(ids[0])[:valid]
        units, _ = ctc_collapse(ids, blank=unit_blank, pad=PAD)
        return [u for u in units if u not in (0, EOS)]

    def emit(self) -> Tuple[List[int], np.ndarray, np.ndarray]:
        """Fused emission path (one device round trip): full-prefix unit
        synthesis, device-side CTC collapse, duration-aware vocoding.
        Returns (unit dict-ids, full wav, per-unit durations)."""
        assert self.e.vocoder is not None, "no vocoder configured"
        tokens = [EOS] + self.mt_tokens
        s = _bucket(len(tokens), self.e.mt_buckets)
        padded = np.full((1, s), PAD, np.int32)
        padded[0, : len(tokens)] = tokens
        u_bucket = _bucket(min(len(tokens) *
                               self.e.model.cfg.unit_decoder.ctc_upsample_rate,
                               self.e.unit_buckets[-1]), self.e.unit_buckets)
        max_frames = u_bucket * self.e.max_dur_per_unit
        units, count, wav, n_samples, dur = self.e._emit(
            self.e.variables, self.e.vocoder_variables, jnp.asarray(padded),
            self.enc_buf, jnp.asarray(self.enc_len),
            jnp.asarray(len(tokens), jnp.int32),
            valid_tokens_cap=s, max_frames=max_frames)
        count = int(count)
        unit_ids = np.asarray(units)[:count].tolist()
        n = int(n_samples)
        return unit_ids, np.asarray(wav[:n]), np.asarray(dur[:count])

    def vocode(self, unit_codes: List[int]) -> Tuple[np.ndarray, np.ndarray]:
        """unit_codes: raw vocoder codes (0-based). Returns (wav, durations)."""
        assert self.e.vocoder is not None, "no vocoder configured"
        u = _bucket(max(len(unit_codes), 1), self.e.unit_buckets)
        codes = np.zeros((1, u), np.int32)
        codes[0, : len(unit_codes)] = unit_codes
        dur_mask = np.zeros((1, u), np.int32)
        dur_mask[0, : len(unit_codes)] = 1
        max_frames = u * self.e.max_dur_per_unit
        wav, n_samples, dur = self.e._vocode(self.e.vocoder_variables,
                                             jnp.asarray(codes),
                                             jnp.asarray(dur_mask),
                                             max_frames=max_frames)
        n = int(n_samples[0])
        return np.asarray(wav[0][:n]), np.asarray(dur[0][: len(unit_codes)])
