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
import os
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from streamspeech_tpu.models.layers import KVCache
from streamspeech_tpu.runtime.aot import aot_jit
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
        from streamspeech_tpu import enable_persistent_compile_cache
        enable_persistent_compile_cache()
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
        # tail-emission window: vocode the last `window` expanded frames with
        # `ctx` frames of receptive-field context (HiFi-GAN RF ≈ 21 frames for
        # the default config; exactness asserted by tests/test_emit_tail.py)
        self.emit_window_frames = 256
        self.emit_ctx_frames = 64
        self.emit_tail_cap = (self.emit_window_frames
                              - self.emit_ctx_frames) * 320
        c = model.cfg

        @functools.partial(aot_jit, static_argnames=("chunk", "conv_chunk"),
                           donate_argnums=(2, 3))  # state + enc_buf buffers are
        # consumed and rewritten every chunk — donation avoids copying the
        # 12-layer KV caches per block
        def encode_block(variables, block, state, enc_buf, valid_len, chunk,
                         conv_chunk):
            enc, state, asr_ids, st_ids = model.apply(
                variables, block, state, chunk, conv_chunk, valid_len,
                method=StreamSpeechModel.encode_block_with_ctc)
            enc_buf = jax.lax.dynamic_update_slice(
                enc_buf, enc.astype(enc_buf.dtype),
                (0, state.pos - enc.shape[1], 0))
            return enc, state, enc_buf, asr_ids, st_ids

        self._encode_block = encode_block

        @jax.jit
        def mt_fill_cross(variables, enc_new, cross_caches):
            return model.apply(variables, enc_new, cross_caches,
                               method=StreamSpeechModel.mt_fill_cross)

        self._mt_fill_cross = mt_fill_cross

        @functools.partial(jax.jit,
                           static_argnames=("batch", "per_example_index"))
        def session_init(variables, batch=1, per_example_index=False):
            # fresh per-session device state in ONE dispatch: the unjitted
            # version (eager encoder_stream_init + per-layer KVCache zeros)
            # issues hundreds of tiny eager ops, each a tunnel round trip —
            # it dominated new_session() latency and a chunk of warmup.
            # `batch`/`per_example_index` serve BatchedStreamingSession (B
            # lockstep streams; per-example MT self-cache decode positions)
            enc_state = model.apply(variables, batch, max_enc_frames,
                                    method=StreamSpeechModel.encoder_stream_init)
            enc_buf = jnp.zeros((batch, max_enc_frames, c.encoder.embed_dim))
            dc = c.mt_decoder
            h, dh = dc.attention_heads, dc.embed_dim // dc.attention_heads
            mt_self = [KVCache.create(batch, max_mt_tokens, h, dh,
                                      per_example_index=per_example_index)
                       for _ in range(dc.layers)]
            mt_cross = [KVCache.create(batch, max_enc_frames, h, dh)
                        for _ in range(dc.layers)]
            return enc_state, enc_buf, mt_self, mt_cross

        self._session_init = session_init

        @jax.jit
        def mt_step(variables, token, offset, self_caches, cross_caches):
            logits, feats, self_caches = model.apply(
                variables, token, offset, self_caches, cross_caches,
                method=StreamSpeechModel.mt_decoder_step)
            return jnp.argmax(logits[:, -1], axis=-1), self_caches

        self._mt_step = mt_step

        @functools.partial(aot_jit, static_argnames=("max_steps",))
        def mt_decode_greedy(variables, first, offset, budget, self_caches,
                             cross_caches, max_steps, cross_valid=None):
            return model.apply(variables, first, offset, budget, self_caches,
                               cross_caches, max_steps, cross_valid,
                               method=StreamSpeechModel.mt_decode_greedy)

        self._mt_decode_greedy = mt_decode_greedy
        self.max_decode_per_call = 16
        # long-scan tier for the finish flush (decode-to-EOS in few RTTs)
        self.finish_decode_steps = 64
        # fused policy-step scan length: covers typical per-chunk budgets
        # (1-4 tokens); larger budgets fall back to the host loop (exact)
        self.fused_steps = 8

        @aot_jit
        def synthesize(variables, mt_tokens, enc_buf, enc_len):
            ids, logits = model.apply(variables, mt_tokens, enc_buf, enc_len,
                                      method=StreamSpeechModel.synthesize_units)
            return ids

        self._synthesize = synthesize

        if vocoder is not None:
            @functools.partial(aot_jit, static_argnames=("max_frames",))
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

            @functools.partial(aot_jit,
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

            @functools.partial(aot_jit,
                               static_argnames=("valid_tokens_cap",
                                                "unit_capacity",
                                                "window_frames", "ctx_frames",
                                                "tail_cap"))
            def emit_tail(variables, voc_vars, mt_tokens, enc_buf, enc_len,
                          n_tokens, n_prev_units, valid_tokens_cap,
                          unit_capacity, window_frames, ctx_frames, tail_cap):
                """Tail emission: like `emit` but vocodes only a bounded window
                of frames ending at the sequence end (receptive-field context
                included) and returns ONLY the new-wav tail. Cuts the vocoder
                compute from O(total prefix) to O(window) and the host fetch
                from max_frames*320 floats (~650k, ~56 ms through the tunnel)
                to tail_cap (~65k). `ok=False` → caller falls back to the full
                `emit` program (window/tail caps exceeded; rare)."""
                from streamspeech_tpu.ops.ctc import ctc_collapse_device

                ids = model.apply(variables, mt_tokens, enc_buf, enc_len,
                                  method=StreamSpeechModel.synthesize_units)[0]
                up = model.cfg.unit_decoder.ctc_upsample_rate
                ids = ids[0][: valid_tokens_cap * up]
                pos_valid = jnp.arange(ids.shape[0]) < n_tokens * up
                is_unit = (ids >= nspecial) & (ids < unit_blank)
                ids = jnp.where(pos_valid & is_unit, ids, unit_blank)
                units, count = ctc_collapse_device(ids, blank=unit_blank)
                codes = jnp.where(units == unit_blank, 0, units - nspecial)
                count = jnp.minimum(count, unit_capacity)
                if unit_capacity > codes.shape[0]:
                    codes = jnp.pad(codes, (0, unit_capacity - codes.shape[0]))
                codes = codes[None, :unit_capacity]
                pos = jnp.arange(unit_capacity)
                dur_mask = (pos < count).astype(jnp.int32)
                dur = vocoder.apply(voc_vars, codes,
                                    method=CodeGenerator.predict_durations)
                dur = dur * dur_mask[None]
                total = jnp.sum(dur[0])
                # frames belonging to the not-yet-emitted units
                need = jnp.sum(jnp.where(pos >= n_prev_units, dur[0], 0))
                start = jnp.maximum(total - need - ctx_frames, 0)
                wav_win, n_valid = vocoder.apply(
                    voc_vars, codes, dur, start[None], window_frames,
                    method=CodeGenerator.vocode_window)
                cur_len = need * 320
                tail_start = n_valid[0] * 320 - cur_len
                wav_pad = jnp.pad(wav_win[0], (0, tail_cap))
                tail = jax.lax.dynamic_slice(wav_pad, (tail_start,), (tail_cap,))
                ok = ((total - start) <= window_frames) & (cur_len <= tail_cap)
                return units, count, dur[0], tail, cur_len, ok

            self._emit_tail = emit_tail

            @functools.partial(aot_jit,
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

            @functools.partial(aot_jit,
                               static_argnames=("valid_tokens_cap",
                                                "unit_capacity",
                                                "window_frames", "ctx_frames",
                                                "tail_cap"))
            def emit_tail_batched(variables, voc_vars, mt_tokens, enc_buf,
                                  enc_len, n_tokens, n_prev_units,
                                  valid_tokens_cap, unit_capacity,
                                  window_frames, ctx_frames, tail_cap):
                """Batched tail emission: per-stream windowed vocoding + small
                per-stream tail fetch (the full-buffer fetch is B×650k floats
                ≈ B×56 ms through the tunnel — the serving bottleneck)."""
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
                cap = unit_capacity
                count = jnp.minimum(count, cap)
                if cap > codes.shape[1]:
                    codes = jnp.pad(codes, ((0, 0), (0, cap - codes.shape[1])))
                    units = jnp.pad(units, ((0, 0), (0, cap - units.shape[1])),
                                    constant_values=unit_blank)
                codes = codes[:, :cap]
                posu = jnp.arange(cap)[None, :]
                dur = vocoder.apply(voc_vars, codes,
                                    method=CodeGenerator.predict_durations)
                dur = dur * (posu < count[:, None]).astype(jnp.int32)
                total = jnp.sum(dur, axis=1)
                need = jnp.sum(jnp.where(posu >= n_prev_units[:, None],
                                         dur, 0), axis=1)
                start = jnp.maximum(total - need - ctx_frames, 0)
                wav_win, n_valid = vocoder.apply(
                    voc_vars, codes, dur, start, window_frames,
                    method=CodeGenerator.vocode_window)
                cur_len = need * 320
                tail_start = n_valid * 320 - cur_len
                wav_pad = jnp.pad(wav_win, ((0, 0), (0, tail_cap)))
                tail = jax.vmap(
                    lambda w, s: jax.lax.dynamic_slice(w, (s,), (tail_cap,))
                )(wav_pad, tail_start)
                ok = ((total - start) <= window_frames) & \
                    (cur_len <= tail_cap)
                return units[:, :cap], count, dur, tail, cur_len, ok

            self._emit_tail_batched = emit_tail_batched

            def policy_core(variables, voc_vars, block, valid_len, enc_state,
                            enc_buf, mt_self, mt_cross, mt_buf, n_tokens,
                            src_len, tgt_len, asr_count, st_count, last_asr,
                            last_st, n_units, starts_word, chunk, conv_chunk,
                            finished, whole_word, k1, n, steps, mt_cap,
                            unit_capacity, window_frames, ctx_frames,
                            tail_cap, max_len):
                """ONE device round trip for a whole S2ST policy chunk: encode
                block -> CTC growth gates -> (cond) MT greedy continue ->
                whole-word rollback -> unit synthesis -> windowed vocode tail.

                The reference needs 3+ host syncs per chunk
                (`agent/speech_to_speech.streamspeech.agent.py:422-770`);
                through this environment's ~36 ms tunnel each sync IS the
                latency budget, so every policy decision (the growth gates of
                agent.py:485-520, the whole-word rollback of :542-559, the
                same-emission gates of :609-637 and the unit-growth gates of
                :688-737) is computed on device and the host reads back one
                bundle of scalars + the new wav tail. Policy counters are
                host-provided scalars (cheap in the request), so the host
                stays the source of truth and can interleave the unfused
                fallback path (budget > steps; multi-block chunks) freely.
                """
                from streamspeech_tpu.ops.ctc import ctc_collapse_device

                enc, enc_state, asr_ids, st_ids = model.apply(
                    variables, block, enc_state, chunk, conv_chunk, valid_len,
                    method=StreamSpeechModel.encode_block_with_ctc)
                enc_buf = jax.lax.dynamic_update_slice(
                    enc_buf, enc.astype(enc_buf.dtype),
                    (0, enc_state.pos - enc.shape[1], 0))
                mt_cross = model.apply(variables, enc, mt_cross,
                                       method=StreamSpeechModel.mt_fill_cross)

                # dedup'd CTC hypothesis growth (blank=0), continuing across
                # block boundaries via the carried last raw frame id — the
                # device twin of ops/ctc.ctc_collapse counting
                def grow(count, last, ids_row):
                    prev = jnp.concatenate([last[None], ids_row[:-1]])
                    fresh = (ids_row != prev) & (ids_row != 0)
                    return count + jnp.sum(fresh), ids_row[-1]

                asr_count, last_asr = grow(asr_count, last_asr, asr_ids[0])
                st_count, last_st = grow(st_count, last_st, st_ids[0])

                if not finished:
                    grew = (asr_count >= src_len + n) & \
                        (st_count >= tgt_len + n)
                    subword = ((st_count - k1) // n) * n + \
                        (1 if whole_word else 0)
                    # the host path clamps the hypothesis at max_len
                    # (mt_decode's `len < max_len` loop guard) — mirror it so
                    # the streaming budget can never march past the bucket
                    budget = jnp.minimum(subword - n_tokens,
                                         max_len - n_tokens)
                    decode_wanted = grew & (budget >= 1)
                else:
                    grew = jnp.asarray(True)
                    budget = jnp.asarray(max_len, jnp.int32) - n_tokens
                    decode_wanted = budget >= 1
                budget_over = budget > steps
                room = n_tokens + steps <= mt_buf.shape[1]
                do_decode = decode_wanted & ~budget_over & room

                pos_mt = jnp.arange(mt_buf.shape[1], dtype=jnp.int32)

                def decode_branch(ops):
                    mt_self, mt_buf = ops
                    feed = jnp.where(n_tokens > 0,
                                     mt_buf[0, jnp.maximum(n_tokens - 1, 0)],
                                     EOS)
                    toks, emitted, hit_eos, mt_self = model.apply(
                        variables, feed[None], n_tokens,
                        jnp.minimum(budget, steps), mt_self, mt_cross,
                        steps, None,
                        method=StreamSpeechModel.mt_decode_greedy)
                    cand = jax.lax.dynamic_update_slice(
                        mt_buf, toks.astype(mt_buf.dtype), (0, n_tokens))
                    n_total = n_tokens + emitted[0]
                    # keep old buf beyond the accepted region (PAD fill from
                    # the scan must not overwrite the stale-but-unused tail)
                    mt_buf = jnp.where((pos_mt >= n_total)[None], mt_buf, cand)
                    if whole_word and not finished:
                        # rollback to the last word-start token, exclusive
                        # (agent.py:542-559); none found -> keep 0 -> READ
                        ws = starts_word[mt_buf[0]] & (pos_mt < n_total)
                        keep = jnp.maximum(jnp.max(
                            jnp.where(ws, pos_mt, -1)), 0)
                    else:
                        keep = n_total
                    mt_self = [kv.truncate(keep) for kv in mt_self]
                    return mt_self, mt_buf, keep, hit_eos[0]

                def skip_branch(ops):
                    mt_self, mt_buf = ops
                    return mt_self, mt_buf, n_tokens, jnp.asarray(False)

                mt_self, mt_buf, keep, hit_eos = jax.lax.cond(
                    do_decode, decode_branch, skip_branch, (mt_self, mt_buf))

                # same-emission / shorter-prefix gates (agent.py:609-637):
                # tokens are append-only then truncated, so "equal" is
                # keep == n_tokens and "shorter" is keep < n_tokens
                do_emit = do_decode & (keep > n_tokens)

                cap = unit_capacity

                def emit_branch(_):
                    shifted = jnp.concatenate(
                        [jnp.full((1,), EOS, mt_buf.dtype),
                         mt_buf[0]])[:mt_cap]
                    padded = jnp.where(
                        pos_mt[:mt_cap] <= keep, shifted, PAD)[None]
                    ids = model.apply(
                        variables, padded, enc_buf, enc_state.pos,
                        method=StreamSpeechModel.synthesize_units)[0]
                    up = model.cfg.unit_decoder.ctc_upsample_rate
                    ids = ids[0][: mt_cap * up]
                    pv = jnp.arange(ids.shape[0]) < (keep + 1) * up
                    is_unit = (ids >= nspecial) & (ids < unit_blank)
                    ids = jnp.where(pv & is_unit, ids, unit_blank)
                    units, count = ctc_collapse_device(ids, blank=unit_blank)
                    codes = jnp.where(units == unit_blank, 0, units - nspecial)
                    count = jnp.minimum(count, cap)
                    if cap > codes.shape[0]:
                        codes = jnp.pad(codes, (0, cap - codes.shape[0]))
                        units = jnp.pad(units, (0, cap - units.shape[0]),
                                        constant_values=unit_blank)
                    codes = codes[None, :cap]
                    posu = jnp.arange(cap)
                    dur = vocoder.apply(voc_vars, codes,
                                        method=CodeGenerator.predict_durations)
                    dur = dur * (posu < count).astype(jnp.int32)[None]
                    total = jnp.sum(dur[0])
                    need = jnp.sum(jnp.where(posu >= n_units, dur[0], 0))
                    start = jnp.maximum(total - need - ctx_frames, 0)
                    wav_win, n_valid = vocoder.apply(
                        voc_vars, codes, dur, start[None], window_frames,
                        method=CodeGenerator.vocode_window)
                    cur_len = need * 320
                    tail_start = n_valid[0] * 320 - cur_len
                    wav_pad = jnp.pad(wav_win[0], (0, tail_cap))
                    tail = jax.lax.dynamic_slice(wav_pad, (tail_start,),
                                                 (tail_cap,))
                    ok = ((total - start) <= window_frames) & \
                        (cur_len <= tail_cap)
                    return units[:cap], count, dur[0], tail, cur_len, ok

                def no_emit(_):
                    return (jnp.full((cap,), unit_blank, jnp.int32),
                            jnp.asarray(0, jnp.int32),
                            jnp.zeros((cap,), jnp.int32),
                            jnp.zeros((tail_cap,), jnp.float32),
                            jnp.asarray(0, jnp.int32), jnp.asarray(True))

                units, count, dur, tail, cur_len, ok = jax.lax.cond(
                    do_emit, emit_branch, no_emit, None)

                flags = jnp.stack([do_decode.astype(jnp.int32),
                                   do_emit.astype(jnp.int32),
                                   ok.astype(jnp.int32),
                                   budget_over.astype(jnp.int32),
                                   hit_eos.astype(jnp.int32),
                                   grew.astype(jnp.int32)])
                return (enc_state, enc_buf, mt_self, mt_cross, mt_buf,
                        asr_ids[0], st_ids[0], keep, asr_count, st_count,
                        last_asr, last_st, units, count, dur, tail, cur_len,
                        flags, grew, do_emit, ok)

            @functools.partial(
                aot_jit,
                static_argnames=("chunk", "conv_chunk", "finished",
                                 "whole_word", "k1", "n", "steps", "mt_cap",
                                 "unit_capacity", "window_frames",
                                 "ctx_frames", "tail_cap", "max_len"),
                donate_argnums=(4, 5, 6, 7))
            def policy_step(variables, voc_vars, block, valid_len, enc_state,
                            enc_buf, mt_self, mt_cross, mt_buf, n_tokens,
                            src_len, tgt_len, asr_count, st_count, last_asr,
                            last_st, n_units, starts_word, chunk, conv_chunk,
                            finished, whole_word, k1, n, steps, mt_cap,
                            unit_capacity, window_frames, ctx_frames,
                            tail_cap, max_len):
                """Host-counter fused policy chunk (see policy_core): the host
                stays the source of truth for the policy counters, passed as
                cheap inlined scalars every call (the synchronous exactness
                path and the fallback interleave path)."""
                return policy_core(
                    variables, voc_vars, block, valid_len, enc_state, enc_buf,
                    mt_self, mt_cross, mt_buf, n_tokens, src_len, tgt_len,
                    asr_count, st_count, last_asr, last_st, n_units,
                    starts_word, chunk, conv_chunk, finished, whole_word, k1,
                    n, steps, mt_cap, unit_capacity, window_frames,
                    ctx_frames, tail_cap, max_len)[:18]

            self._policy_step = policy_step

            @functools.partial(
                aot_jit,
                static_argnames=("chunk", "conv_chunk", "whole_word", "k1",
                                 "n", "steps", "mt_cap", "unit_capacity",
                                 "window_frames", "ctx_frames", "tail_cap",
                                 "max_len"),
                donate_argnums=(4, 5, 6, 7, 8))
            def policy_step_pipelined(variables, voc_vars, block, valid_len,
                                      enc_state, enc_buf, mt_self, mt_cross,
                                      pol, starts_word, chunk, conv_chunk,
                                      whole_word, k1, n, steps, mt_cap,
                                      unit_capacity, window_frames,
                                      ctx_frames, tail_cap, max_len):
                """Device-resident-counter twin of `policy_step` for the
                OVERLAPPED streaming loop: the policy counters (hypothesis
                length, CTC prefix lengths, growth gates state, emitted-unit
                count, the hypothesis buffer itself) live on device in `pol`
                and are updated in-program with the agent's own recurrences
                (`agents/streamspeech.py:_fused_action`), so chunk N+1 can be
                DISPATCHED before chunk N's results ever reach the host. The
                host fetches each chunk's result bundle asynchronously
                (`copy_to_host_async` started at dispatch; `device_get` ~0.2
                ms once landed) with a small lag, turning the per-chunk cost
                from dispatch+compute+RTT (~51 ms serial) into ~max(compute,
                bandwidth) — the tunnel RTT leaves the critical path
                entirely. The reference host policy is the semantic spec
                (`agent/speech_to_speech.streamspeech.agent.py:422-770`);
                exactness vs the synchronous path is asserted by
                tests/test_pipelined_policy.py."""
                (mt_buf, n_tokens, src_len, tgt_len, asr_count, st_count,
                 last_asr, last_st, n_units) = pol
                (enc_state, enc_buf, mt_self, mt_cross, mt_buf2, asr_row,
                 st_row, keep, asr_count2, st_count2, last_asr2, last_st2,
                 units, count, dur, tail, cur_len, flags, grew, do_emit,
                 ok_emit) = policy_core(
                    variables, voc_vars, block, valid_len, enc_state, enc_buf,
                    mt_self, mt_cross, mt_buf, n_tokens, src_len, tgt_len,
                    asr_count, st_count, last_asr, last_st, n_units,
                    starts_word, chunk, conv_chunk, False, whole_word, k1,
                    n, steps, mt_cap, unit_capacity, window_frames,
                    ctx_frames, tail_cap, max_len)
                # the agent's host-side counter recurrences, on device:
                # prefix lengths advance on growth (gate passed), emitted-unit
                # count advances on an in-window emission that grew the units
                src_len2 = jnp.where(grew, jnp.maximum(asr_count2, src_len),
                                     src_len)
                tgt_len2 = jnp.where(grew, jnp.maximum(st_count2, tgt_len),
                                     tgt_len)
                upd = do_emit & ok_emit & (count > n_units)
                n_units2 = jnp.where(upd, count, n_units)
                pol2 = (mt_buf2, keep, src_len2, tgt_len2, asr_count2,
                        st_count2, last_asr2, last_st2, n_units2)
                bundle = (flags, keep, asr_row, st_row, asr_count2, st_count2,
                          count, units, dur, tail, cur_len, mt_buf2)
                return enc_state, enc_buf, mt_self, mt_cross, pol2, bundle

            self._policy_step_pipelined = policy_step_pipelined

            @jax.jit
            def pipe_pack(mt_buf, n_tokens, src_len, tgt_len, asr_count,
                          st_count, last_asr, last_st, n_units):
                """(Re)build the device policy-state tuple from host values —
                all args are host numpy (inlined into the execute RPC, no
                extra round trip). Used at pipelined-mode entry and after any
                host-path interlude (fallback/finish) to resync the device."""
                return tuple(jnp.asarray(v, jnp.int32) for v in
                             (mt_buf, n_tokens, src_len, tgt_len, asr_count,
                              st_count, last_asr, last_st, n_units))

            self._pipe_pack = pipe_pack

            @functools.partial(
                aot_jit,
                static_argnames=("chunk", "conv_chunk", "whole_word", "k1",
                                 "n", "steps", "mt_cap", "unit_capacity",
                                 "window_frames", "ctx_frames", "tail_cap",
                                 "max_len", "with_emission"),
                donate_argnums=(5, 6, 7, 8))
            def policy_step_batched(variables, voc_vars, block, valid_len,
                                    enc_len, enc_state, enc_buf, mt_self,
                                    mt_cross, mt_buf, n_tokens, src_len,
                                    tgt_len, asr_count, st_count, last_asr,
                                    last_st, n_units, starts_word, active,
                                    finished, tail_ready, chunk, conv_chunk,
                                    whole_word, k1, n, steps, mt_cap,
                                    unit_capacity, window_frames, ctx_frames,
                                    tail_cap, max_len, with_emission=True):
                """Batched twin of `policy_step`: ONE device round trip
                advances B lockstep streams — encode + CTC growth gates +
                (cond) per-stream-budget MT decode + whole-word rollback +
                batched unit synthesis + windowed vocode tails. Per-stream
                vectors replace the scalars; `lax.cond` guards become
                any-stream conds with per-example masking inside (a stream
                that READs decodes with budget 0 and keeps its caches via the
                per-example-index truncation). Finished streams (`finished`)
                run the decode-to-EOS finish in tranches of `steps` tokens
                per tick — the host loops ticks until they drain, then makes
                the single final write like the sequential agent
                (`agent/speech_to_speech.streamspeech.agent.py:422-770`).
                """
                from streamspeech_tpu.ops.ctc import ctc_collapse_device

                B = block.shape[0]
                enc, enc_state, asr_ids, st_ids = model.apply(
                    variables, block, enc_state, chunk, conv_chunk, valid_len,
                    method=StreamSpeechModel.encode_block_with_ctc)
                s = enc.shape[1]
                enc_buf = jax.lax.dynamic_update_slice(
                    enc_buf, enc.astype(enc_buf.dtype),
                    (0, enc_state.pos - s, 0))
                mt_cross = model.apply(variables, enc, mt_cross,
                                       method=StreamSpeechModel.mt_fill_cross)
                out_valid = -(-valid_len // 4)          # [B] new real frames
                enc_len_new = enc_len + out_valid
                cross_valid = (jnp.arange(enc_buf.shape[1])[None, :]
                               < enc_len_new[:, None])

                # dedup'd CTC growth per stream, only over the valid frames
                posf = jnp.arange(s)[None, :]
                valid_f = posf < out_valid[:, None]

                def grow(count, last, ids):
                    prev = jnp.concatenate([last[:, None], ids[:, :-1]],
                                           axis=1)
                    fresh = (ids != prev) & (ids != 0) & valid_f
                    new_last = jnp.where(
                        out_valid > 0,
                        jnp.take_along_axis(
                            ids, jnp.maximum(out_valid - 1, 0)[:, None],
                            axis=1)[:, 0],
                        last)
                    return count + jnp.sum(fresh, axis=1), new_last

                asr_count, last_asr = grow(asr_count, last_asr, asr_ids)
                st_count, last_st = grow(st_count, last_st, st_ids)

                grew = (asr_count >= src_len + n) & (st_count >= tgt_len + n)
                subword = ((st_count - k1) // n) * n + \
                    (1 if whole_word else 0)
                # clamp at max_len like the host mt_decode loop guard — the
                # streaming budget must never march the hypothesis past the
                # mt bucket
                budget_stream = jnp.minimum(subword - n_tokens,
                                            max_len - n_tokens)
                budget_fin = jnp.full_like(n_tokens, max_len) - n_tokens
                budget = jnp.where(finished,
                                   jnp.clip(budget_fin, 0, steps),
                                   budget_stream)
                # a finished stream starts its finish decode only once its
                # ENTIRE tail is encoded this tick (tail_ready): the
                # sequential agent ingests the whole tail before decoding, so
                # earlier tranches would greedy-decode against a shorter
                # encoder context and diverge
                decode_wanted = jnp.where(finished,
                                          (budget_fin >= 1) & tail_ready,
                                          grew & (budget_stream >= 1))
                budget_over = (~finished) & (budget_stream > steps)
                room = n_tokens + steps <= mt_buf.shape[1]
                do_decode = decode_wanted & ~budget_over & room & active

                pos_mt = jnp.arange(mt_buf.shape[1], dtype=jnp.int32)

                def decode_branch(ops):
                    mt_self, mt_buf = ops
                    feed = jnp.where(
                        n_tokens > 0,
                        jnp.take_along_axis(
                            mt_buf, jnp.maximum(n_tokens - 1, 0)[:, None],
                            axis=1)[:, 0],
                        EOS)
                    budgets = jnp.where(do_decode,
                                        jnp.clip(budget, 0, steps), 0)
                    toks, emitted, hit_eos, mt_self = model.apply(
                        variables, feed, n_tokens, budgets, mt_self,
                        mt_cross, steps, cross_valid,
                        method=StreamSpeechModel.mt_decode_greedy)
                    cand = jax.vmap(
                        lambda row, t, off: jax.lax.dynamic_update_slice(
                            row, t.astype(row.dtype), (off,))
                    )(mt_buf, toks, n_tokens)
                    n_total = n_tokens + emitted
                    mt_buf = jnp.where(pos_mt[None] >= n_total[:, None],
                                       mt_buf, cand)
                    if whole_word:
                        ws = starts_word[mt_buf] & \
                            (pos_mt[None] < n_total[:, None])
                        keep_ww = jnp.maximum(jnp.max(
                            jnp.where(ws, pos_mt[None], -1), axis=1), 0)
                        keep = jnp.where(finished, n_total, keep_ww)
                    else:
                        keep = n_total
                    keep = jnp.where(do_decode, keep, n_tokens)
                    mt_self = [kv.truncate(keep) for kv in mt_self]
                    return mt_self, mt_buf, keep, hit_eos & do_decode

                def skip_branch(ops):
                    mt_self, mt_buf = ops
                    return (mt_self, mt_buf, n_tokens,
                            jnp.zeros((B,), bool))

                mt_self, mt_buf, keep, hit_eos = jax.lax.cond(
                    jnp.any(do_decode), decode_branch, skip_branch,
                    (mt_self, mt_buf))

                # finished streams decode in tranches but emit ONCE when
                # drained (host calls emit_tail then) — per-tranche tails
                # would re-synthesize earlier units from a shorter prefix and
                # diverge from the sequential one-shot finish emission
                do_emit = do_decode & (keep > n_tokens) & ~finished
                if not with_emission:   # text-output serving (S2TT) skips
                    do_emit = jnp.zeros_like(do_emit)   # the vocoder wholesale
                cap = unit_capacity

                def emit_branch(_):
                    shifted = jnp.concatenate(
                        [jnp.full((B, 1), EOS, mt_buf.dtype), mt_buf],
                        axis=1)[:, :mt_cap]
                    padded = jnp.where(
                        pos_mt[None, :mt_cap] <= keep[:, None], shifted, PAD)
                    ids = model.apply(
                        variables, padded, enc_buf, enc_len_new,
                        method=StreamSpeechModel.synthesize_units)[0]
                    up = model.cfg.unit_decoder.ctc_upsample_rate
                    ids = ids[:, : mt_cap * up]
                    pv = (jnp.arange(ids.shape[1])[None]
                          < ((keep + 1) * up)[:, None])
                    is_unit = (ids >= nspecial) & (ids < unit_blank)
                    ids = jnp.where(pv & is_unit, ids, unit_blank)
                    units, count = ctc_collapse_device(ids, blank=unit_blank)
                    codes = jnp.where(units == unit_blank, 0,
                                      units - nspecial)
                    count = jnp.minimum(count, cap)
                    if cap > codes.shape[1]:
                        codes = jnp.pad(codes,
                                        ((0, 0), (0, cap - codes.shape[1])))
                        units = jnp.pad(units,
                                        ((0, 0), (0, cap - units.shape[1])),
                                        constant_values=unit_blank)
                    codes = codes[:, :cap]
                    units = units[:, :cap]
                    posu = jnp.arange(cap)[None, :]
                    dur = vocoder.apply(voc_vars, codes,
                                        method=CodeGenerator.predict_durations)
                    dur = dur * (posu < count[:, None]).astype(jnp.int32)
                    total = jnp.sum(dur, axis=1)
                    need = jnp.sum(jnp.where(posu >= n_units[:, None],
                                             dur, 0), axis=1)
                    start = jnp.maximum(total - need - ctx_frames, 0)
                    wav_win, n_valid = vocoder.apply(
                        voc_vars, codes, dur, start, window_frames,
                        method=CodeGenerator.vocode_window)
                    cur_len = need * 320
                    tail_start = n_valid * 320 - cur_len
                    wav_pad = jnp.pad(wav_win, ((0, 0), (0, tail_cap)))
                    tail = jax.vmap(
                        lambda w, st: jax.lax.dynamic_slice(
                            w, (st,), (tail_cap,)))(wav_pad, tail_start)
                    ok = ((total - start) <= window_frames) & \
                        (cur_len <= tail_cap)
                    return units, count, dur, tail, cur_len, ok

                def no_emit(_):
                    return (jnp.full((B, cap), unit_blank, jnp.int32),
                            jnp.zeros((B,), jnp.int32),
                            jnp.zeros((B, cap), jnp.int32),
                            jnp.zeros((B, tail_cap), jnp.float32),
                            jnp.zeros((B,), jnp.int32),
                            jnp.ones((B,), bool))

                units, count, dur, tail, cur_len, ok = jax.lax.cond(
                    jnp.any(do_emit), emit_branch, no_emit, None)

                flags = jnp.stack([do_decode.astype(jnp.int32),
                                   do_emit.astype(jnp.int32),
                                   ok.astype(jnp.int32),
                                   budget_over.astype(jnp.int32),
                                   hit_eos.astype(jnp.int32),
                                   grew.astype(jnp.int32)], axis=1)
                return (enc_state, enc_buf, mt_self, mt_cross, mt_buf,
                        asr_ids, st_ids, keep, asr_count, st_count,
                        last_asr, last_st, units, count, dur, tail, cur_len,
                        flags)

            self._policy_step_batched = policy_step_batched

    def new_session(self) -> "StreamingSession":
        return StreamingSession(self)

    def close(self) -> None:
        """Release every compiled program (and its executable cache) this
        engine owns. A process that interleaves serving and training must be
        able to drop a warmed engine without its residual programs/buffers
        taxing later, unrelated jit executions (the bench.py stage-order
        effect: a train step measured after the streaming stages degraded
        ~27x until the engines were closed). The engine is unusable after."""
        import gc

        for name in list(vars(self)):
            fn = getattr(self, name)
            # jitted closures (hasattr 'lower') AND aot_jit wrappers (plain
            # functions carrying _aot_jit_fn + clear_cache — runtime/aot.py):
            # the wrappers hold the jit executables and their closures over
            # model/variables, so skipping them kept everything alive
            if callable(fn) and (hasattr(fn, "lower")
                                 or hasattr(fn, "_aot_jit_fn")):
                cc = getattr(fn, "clear_cache", None)
                if callable(cc):
                    try:
                        cc()
                    except Exception:
                        pass
                try:
                    delattr(self, name)
                except AttributeError:
                    pass
        self.model = None
        self.variables = None
        self.vocoder = None
        self.vocoder_variables = None
        gc.collect()

    def warmup(self, chunk: int = 8, conv_chunk: int = 8,
               whole_word: bool = False, k1: int = 0, n: int = 1,
               max_len: int = 200, pipelined: bool = False,
               sync: Optional[bool] = None,
               concurrency: Optional[int] = None) -> int:
        """Compile every streaming program variant for the given chunking
        (serving-startup cost, NOT per-chunk): through this environment's
        remote compile helper a lazy mid-stream compile costs minutes and
        wrecks tail latency. Returns the number of programs warmed.
        ``pipelined=True`` compiles the device-resident-counter programs of
        the overlapped loop (policy_step_pipelined + the cross-clamped
        fallback decode). ``sync`` controls the synchronous fused-policy
        programs (policy_step); default = ``not pipelined``, because the
        pipelined agent's fallbacks take the host path (push_features /
        mt_decode / emit_tail — all warmed unconditionally), never
        fused_policy — tracing policy_step costs ~12 s of single-core Python
        here, a third of a pipelined server's startup, for a program it
        would never run. Pass sync=True to warm both (e.g. one engine
        serving both agent modes).

        ``concurrency > 1`` runs the per-program warmup thunks from a thread
        pool: Python-side tracing stays GIL-serialized, but the remote
        compile / persistent-cache-load RPC of one program overlaps the
        tracing of the next (the thunks hit DISJOINT jit variants, so no
        thread blocks another's executable-cache entry beyond jax's internal
        compile locking). Default: 4 when the backend compiles remotely
        (TPU), 1 otherwise — local CPU compiles are host-CPU-bound, so
        threads only add contention (measured 47 s serial vs 57 s threaded
        on this box's single core). Set ``STREAMSPEECH_WARMUP_VERBOSE=1``
        for per-program timings."""
        import numpy as np

        if sync is None:
            sync = not pipelined
        if concurrency is None:
            try:
                concurrency = 4 if jax.default_backend() != "cpu" else 1
            except Exception:
                concurrency = 1

        thunks = []  # (label, thunk) pairs, executed below

        def add(label):
            def deco(fn):
                thunks.append((label, fn))
                return fn
            return deco

        block = np.zeros((4 * math.lcm(max(chunk, 1), max(conv_chunk, 1)), 80),
                         np.float32)
        block_enc = math.lcm(max(chunk, 1), max(conv_chunk, 1))
        if pipelined and self.vocoder is not None:
            table = jnp.zeros((self.model.cfg.mt_decoder.vocab_size,), bool)
            for cap in self.mt_buckets:
                fill = cap - self.fused_steps - 2
                if fill < 0 or fill + 2 * self.fused_steps + 2 > \
                        self.max_mt_tokens:
                    continue

                @add(f"pipe_dispatch[mt{cap}]")
                def _(fill=fill):
                    sess = self.new_session()
                    sess.mt_tokens = [4] * fill
                    sess.mt_steps = fill
                    sess.pipe_set_counters(0, 0, 0)
                    sess.pipe_resync()
                    sess.pipe_dispatch(block, chunk, conv_chunk, k1, n,
                                       whole_word, max_len, table, 0.0,
                                       block_enc)
                    sess.pipe_fetch_oldest()

            # cross-clamped fallback decode (pipelined host interludes run
            # while the device cache is ahead of the mirror)
            @add("pipe_fallback_decode")
            def _():
                s2 = self.new_session()
                s2.push_features(block, chunk, conv_chunk)
                s2.enc_len_dispatched = s2.enc_len + block_enc
                s2.mt_decode(1)

        if sync and self.vocoder is not None:
            table2 = jnp.zeros((self.model.cfg.mt_decoder.vocab_size,), bool)
            for cap in self.mt_buckets:
                fill = cap - self.fused_steps - 2
                if fill < 0 or fill + self.fused_steps > self.max_mt_tokens:
                    continue

                # gates forced shut (huge prefix counters): compiles the
                # encode+gates part; then forced open: compiles decode+emit
                @add(f"fused_policy_shut[mt{cap}]")
                def _(fill=fill):
                    sess = self.new_session()
                    sess.mt_tokens = [4] * fill
                    sess.mt_steps = fill
                    sess.fused_policy(block, chunk, conv_chunk, k1, n,
                                      whole_word, max_len, table2,
                                      10 ** 6, 10 ** 6, 0)

                @add(f"fused_policy_open[mt{cap}]")
                def _(fill=fill):
                    sess2 = self.new_session()
                    sess2.mt_tokens = [4] * fill
                    sess2.mt_steps = fill
                    sess2.fused_policy(block, chunk, conv_chunk, k1, n,
                                       whole_word, max_len, table2, 0, 0, 0)

        # host-path programs (fallbacks + finish): encoder, mt scan 4/16,
        # tail + full emission per mt bucket
        @add("encoder")
        def _():
            sess = self.new_session()
            sess.push_features(block, chunk, conv_chunk)

        for steps in (1, self.max_decode_per_call - 1,
                      self.finish_decode_steps - 1):
            @add(f"mt_decode[{steps}]")
            def _(steps=steps):
                s2 = self.new_session()
                s2.push_features(block, chunk, conv_chunk)
                s2.mt_decode(steps)

        if self.vocoder is not None:
            for cap in self.mt_buckets:
                @add(f"emit_tail[mt{cap}]")
                def _(cap=cap):
                    s3 = self.new_session()
                    s3.push_features(block, chunk, conv_chunk)
                    s3.mt_tokens = [4] * max(1, cap - 2)
                    s3.mt_steps = len(s3.mt_tokens)
                    s3.emit_tail(0)

        verbose = bool(os.environ.get("STREAMSPEECH_WARMUP_VERBOSE"))

        def run_one(item):
            label, fn = item
            t0 = time.perf_counter()
            fn()
            if verbose:
                print(f"warmup[{label}]: {time.perf_counter() - t0:.1f}s",
                      flush=True)

        if concurrency > 1 and len(thunks) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=concurrency) as ex:
                list(ex.map(run_one, thunks))
        else:
            for item in thunks:
                run_one(item)
        return len(thunks)


class StreamingSession:
    """Per-utterance state + host-side orchestration (batch 1)."""

    def __init__(self, engine: StreamSpeechEngine):
        self.e = engine
        c = engine.model.cfg
        # all fresh device state in ONE jitted dispatch (engine._session_init)
        # — the previous eager construction issued hundreds of tiny ops, each
        # a tunnel round trip, dominating per-session startup
        (self.enc_state, self.enc_buf, mt_self,
         mt_cross) = engine._session_init(engine.variables)
        self.enc_len = 0
        self.asr_ids: List[int] = []
        self.st_ids: List[int] = []
        # MT decoder caches: self-attn per layer + cross per layer
        self.mt_self = list(mt_self)
        self.mt_cross = list(mt_cross)
        self.mt_tokens: List[int] = []  # hypothesis (dict ids), EXCLUDING leading eos
        self.mt_steps = 0               # tokens fed (incl. leading eos)
        self.units: List[int] = []      # emitted units (dictionary ids)
        self.pending_feats = np.zeros((0, c.encoder.input_feat_per_channel),
                                      np.float32)
        self.finished_input = False
        # optional fused-policy call recording (benchmarks.measure_nosync_rtf
        # replays the exact call sequence with chained dispatch, no per-chunk
        # fetch, to measure device-side pipeline compute without tunnel RTT)
        self.record: Optional[List[Dict]] = None
        # --- overlapped (pipelined) streaming state -----------------------
        # device-resident policy counters (authoritative while pipelining);
        # the session's regular fields become a LAGGED MIRROR updated at
        # bundle-fetch time. enc_len_dispatched tracks the frames already
        # dispatched to the device (ahead of the mirror's self.enc_len).
        self.pipe_state = None
        self.pipe_inflight: List[Dict] = []
        self.enc_len_dispatched = 0
        self._pipe_src_len = 0
        self._pipe_tgt_len = 0
        self._pipe_n_units = 0

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
        # NB tunnel discipline: numpy args are inlined into the execute RPC
        # (free); an explicit jnp.asarray/device_put costs a ~31 ms round trip,
        # and EACH np.asarray fetch costs another — fetch once via device_get.
        vl = np.int32(block.shape[0] if valid_len is None else valid_len)
        enc, self.enc_state, self.enc_buf, asr_ids, st_ids = self.e._encode_block(
            self.e.variables, block[None], self.enc_state,
            self.enc_buf, vl, chunk=chunk, conv_chunk=conv_chunk)
        s = enc.shape[1]
        self.enc_len += s
        self.enc_len_dispatched = max(self.enc_len_dispatched, self.enc_len)
        # grow MT cross-attn caches with the new frames
        self.mt_cross = self.e._mt_fill_cross(self.e.variables, enc,
                                              self.mt_cross)
        asr_np, st_np = jax.device_get((asr_ids[0], st_ids[0]))
        self.asr_ids.extend(asr_np.tolist())
        self.st_ids.extend(st_np.tolist())
        return s

    def fused_policy(self, feats: np.ndarray, chunk: int, conv_chunk: int,
                     k1: int, n: int, whole_word: bool, max_len: int,
                     starts_word, src_len: int, tgt_len: int,
                     n_prev_units: int) -> Optional[Dict]:
        """Single-round-trip policy chunk (engine._policy_step). Returns None
        when not applicable — caller pushes the pending feats through the host
        path instead. Applicable = unfinished input, exactly one complete
        block pending, MT buffer has decode room."""
        self.pending_feats = np.concatenate([self.pending_feats, feats], axis=0)
        block_enc = math.lcm(max(chunk, 1), max(conv_chunk, 1))
        block_frames = 4 * block_enc
        steps = self.e.fused_steps
        if (self.finished_input
                or self.pending_feats.shape[0] // block_frames != 1
                or self.mt_steps + steps > self.e.max_mt_tokens
                or self.enc_len + block_enc > self.e.max_enc_frames):
            return None
        block = self.pending_feats[:block_frames]
        self.pending_feats = self.pending_feats[block_frames:]

        max_len = min(max_len, self.e.max_mt_tokens - 2,
                      self.e.mt_buckets[-1] - 2)
        mt_cap = _bucket(min(len(self.mt_tokens) + steps + 2,
                             self.e.mt_buckets[-1]), self.e.mt_buckets)
        up = self.e.model.cfg.unit_decoder.ctc_upsample_rate
        u_cap = _bucket(min(mt_cap * up, self.e.unit_buckets[-1]),
                        self.e.unit_buckets)

        mt_buf = np.full((1, self.e.max_mt_tokens), PAD, np.int32)
        if self.mt_tokens:
            mt_buf[0, : len(self.mt_tokens)] = self.mt_tokens
        # host-side collapse state for the device growth recurrence
        asr_count = len(ctc_collapse(np.asarray(self.asr_ids), blank=0)[0])
        st_count = len(ctc_collapse(np.asarray(self.st_ids), blank=0)[0])
        last_asr = self.asr_ids[-1] if self.asr_ids else -1
        last_st = self.st_ids[-1] if self.st_ids else -1

        if self.record is not None:
            self.record.append(dict(
                block=block[None], valid_len=np.int32(block.shape[0]),
                mt_buf=mt_buf, n_tokens=np.int32(len(self.mt_tokens)),
                src_len=np.int32(src_len), tgt_len=np.int32(tgt_len),
                asr_count=np.int32(asr_count), st_count=np.int32(st_count),
                last_asr=np.int32(last_asr), last_st=np.int32(last_st),
                n_units=np.int32(n_prev_units), starts_word=starts_word,
                static=dict(chunk=chunk, conv_chunk=conv_chunk,
                            finished=False, whole_word=whole_word, k1=k1,
                            n=n, steps=steps, mt_cap=mt_cap,
                            unit_capacity=u_cap,
                            window_frames=self.e.emit_window_frames,
                            ctx_frames=self.e.emit_ctx_frames,
                            tail_cap=self.e.emit_tail_cap, max_len=max_len)))
        (self.enc_state, self.enc_buf, self.mt_self, self.mt_cross, mt_buf_d,
         asr_ids, st_ids, keep, asr_count_d, st_count_d, _, _, units, count,
         dur, tail, cur_len, flags) = self.e._policy_step(
            self.e.variables, self.e.vocoder_variables,
            block[None], np.int32(block.shape[0]),
            self.enc_state, self.enc_buf, self.mt_self, self.mt_cross,
            mt_buf, np.int32(len(self.mt_tokens)),
            np.int32(src_len), np.int32(tgt_len),
            np.int32(asr_count), np.int32(st_count),
            np.int32(last_asr), np.int32(last_st),
            np.int32(n_prev_units), starts_word,
            chunk=chunk, conv_chunk=conv_chunk, finished=False,
            whole_word=whole_word, k1=k1, n=n, steps=steps, mt_cap=mt_cap,
            unit_capacity=u_cap, window_frames=self.e.emit_window_frames,
            ctx_frames=self.e.emit_ctx_frames, tail_cap=self.e.emit_tail_cap,
            max_len=max_len)

        # ONE fetch for EVERYTHING, every chunk. A second RPC costs a full
        # ~31 ms tunnel round trip; the extra payload of always fetching the
        # emission bundle (tail_cap floats ≈ 240 KB at ~47 MB/s ≈ 5 ms + the
        # token/dur rows) is far cheaper than a second RTT on the ~1/3 of
        # chunks that decode/emit. Per-output np.asarray would cost a ~33 ms
        # round trip each; device_get batches the tuple into one RPC.
        (flags, keep, asr_count_d, st_count_d, count, asr_ids, st_ids,
         mt_buf_d, units, dur, tail, cur_len) = jax.device_get(
            (flags, keep, asr_count_d, st_count_d, count, asr_ids, st_ids,
             mt_buf_d, units, dur, tail, cur_len))
        out = {
            "do_decode": bool(flags[0]), "do_emit": bool(flags[1]),
            "ok": bool(flags[2]), "budget_over": bool(flags[3]),
            "hit_eos": bool(flags[4]), "grew": bool(flags[5]),
            "keep": int(keep),
            "asr_count": int(asr_count_d), "st_count": int(st_count_d),
            "count": int(count),
        }
        self.enc_len += block_enc
        self.asr_ids.extend(asr_ids.tolist())
        self.st_ids.extend(st_ids.tolist())
        if out["do_decode"]:
            self.mt_tokens = mt_buf_d[0][: out["keep"]].tolist()
            self.mt_steps = out["keep"]
        if out["do_emit"]:
            out["units"] = units[: out["count"]].tolist()
            out["dur"] = dur[: out["count"]]
            out["tail"] = tail[: int(cur_len)]
        return out

    # ------------------------------------------------------------------
    # overlapped (pipelined) streaming: dispatch chunk N+1 before fetching
    # chunk N — the tunnel RTT leaves the critical path (see
    # policy_step_pipelined). The session's regular fields are a lagged
    # mirror, updated as each chunk's result bundle is fetched.
    # ------------------------------------------------------------------

    def pipe_resync(self):
        """(Re)build the device policy-state from the host mirror. Called at
        pipelined-mode entry and after any host-path interlude (fallbacks,
        finish) — the mirror is authoritative at those points. Dispatch-only
        (host values are inlined into the RPC): no round trip."""
        assert not self.pipe_inflight, "resync with chunks in flight"
        mt_buf = np.full((1, self.e.max_mt_tokens), PAD, np.int32)
        if self.mt_tokens:
            mt_buf[0, : len(self.mt_tokens)] = self.mt_tokens
        asr_count = len(ctc_collapse(np.asarray(self.asr_ids), blank=0)[0])
        st_count = len(ctc_collapse(np.asarray(self.st_ids), blank=0)[0])
        self.pipe_state = self.e._pipe_pack(
            mt_buf, np.int32(len(self.mt_tokens)),
            np.int32(self._pipe_src_len), np.int32(self._pipe_tgt_len),
            np.int32(asr_count), np.int32(st_count),
            np.int32(self.asr_ids[-1] if self.asr_ids else -1),
            np.int32(self.st_ids[-1] if self.st_ids else -1),
            np.int32(self._pipe_n_units))
        self.enc_len_dispatched = self.enc_len

    def pipe_set_counters(self, src_len: int, tgt_len: int, n_units: int):
        """The agent owns the policy counters (prefix lengths, emitted-unit
        count); it deposits them here before resyncs."""
        self._pipe_src_len = src_len
        self._pipe_tgt_len = tgt_len
        self._pipe_n_units = n_units

    def _pipe_max_len(self) -> int:
        return min(self.e.max_mt_tokens - 2, self.e.mt_buckets[-1] - 2)

    def pipe_applicable(self, n_blocks_pending: int, block_enc: int) -> bool:
        steps = self.e.fused_steps
        # The in-program budget clamp guarantees the device hypothesis never
        # exceeds max_len (= largest bucket - 2), and the scan appends at
        # most `steps` KV slots beyond it before truncation — so capacity is
        # a STATIC property, independent of how many chunks are in flight
        # (an in-flight-scaled bound here silently de-pipelined every chunk
        # once lag built up: the r3 bench's "pipelined ≈ sync" regression).
        return (not self.finished_input
                and n_blocks_pending == 1
                and self._pipe_max_len() + steps + 2 <= self.e.max_mt_tokens
                and self.enc_len_dispatched + block_enc
                <= self.e.max_enc_frames)

    def pipe_dispatch(self, block: np.ndarray, chunk: int, conv_chunk: int,
                      k1: int, n: int, whole_word: bool, max_len: int,
                      starts_word, decision_ms: float, block_enc: int):
        """Dispatch one policy chunk against the device-resident state and
        start the async host copy of its result bundle. Never blocks."""
        steps = self.e.fused_steps
        max_len = min(max_len, self._pipe_max_len())
        # bucket by the lagged mirror + in-flight growth, clamped by max_len
        # (the device hypothesis can never exceed it); a larger-than-sync
        # bucket only costs compute, never changes results
        bound = min(len(self.mt_tokens)
                    + (len(self.pipe_inflight) + 1) * steps, max_len)
        mt_cap = _bucket(min(bound + 2, self.e.mt_buckets[-1]),
                         self.e.mt_buckets)
        up = self.e.model.cfg.unit_decoder.ctc_upsample_rate
        u_cap = _bucket(min(mt_cap * up, self.e.unit_buckets[-1]),
                        self.e.unit_buckets)
        (self.enc_state, self.enc_buf, self.mt_self, self.mt_cross,
         self.pipe_state, bundle) = self.e._policy_step_pipelined(
            self.e.variables, self.e.vocoder_variables,
            block[None], np.int32(block.shape[0]),
            self.enc_state, self.enc_buf, self.mt_self, self.mt_cross,
            self.pipe_state, starts_word,
            chunk=chunk, conv_chunk=conv_chunk, whole_word=whole_word,
            k1=k1, n=n, steps=steps, mt_cap=mt_cap, unit_capacity=u_cap,
            window_frames=self.e.emit_window_frames,
            ctx_frames=self.e.emit_ctx_frames,
            tail_cap=self.e.emit_tail_cap, max_len=max_len)
        for a in bundle:
            a.copy_to_host_async()
        self.enc_len_dispatched += block_enc
        self.pipe_inflight.append(dict(
            bundle=bundle, t=time.perf_counter(),
            block_enc=block_enc, decision_ms=decision_ms))

    def pipe_fetch_oldest(self, encoder_only: bool = False) -> Dict:
        """Fetch the oldest in-flight bundle (~0.2 ms once the async copy has
        landed) and fold it into the host mirror. With ``encoder_only`` the
        decode/emit fields are DISCARDED (replay mode: the host re-derives
        the policy for this chunk because an earlier fallback invalidated the
        speculative device decisions)."""
        rec = self.pipe_inflight.pop(0)
        (flags, keep, asr_row, st_row, asr_count, st_count, count, units,
         dur, tail, cur_len, mt_buf) = jax.device_get(rec["bundle"])
        self.enc_len += rec["block_enc"]
        self.asr_ids.extend(asr_row.tolist())
        self.st_ids.extend(st_row.tolist())
        out = {
            "do_decode": bool(flags[0]), "do_emit": bool(flags[1]),
            "ok": bool(flags[2]), "budget_over": bool(flags[3]),
            "hit_eos": bool(flags[4]), "grew": bool(flags[5]),
            "keep": int(keep), "asr_count": int(asr_count),
            "st_count": int(st_count), "count": int(count),
            "decision_ms": rec["decision_ms"], "encoder_only": encoder_only,
        }
        if encoder_only:
            return out
        if out["do_decode"]:
            self.mt_tokens = mt_buf[0][: out["keep"]].tolist()
            self.mt_steps = out["keep"]
        if out["do_emit"]:
            out["units"] = units[: out["count"]].tolist()
            out["dur"] = dur[: out["count"]]
            out["tail"] = tail[: int(cur_len)]
        return out

    def pipe_truncate_to_mirror(self):
        """Replay-mode entry: speculative decodes beyond the mirror hypothesis
        are pruned from the KV caches (their slots are ≥ mirror length, so
        content below is untouched — same invariant as whole-word rollback)."""
        self.mt_self = [kv.truncate(np.int32(self.mt_steps))
                        for kv in self.mt_self]

    def mirror_cross_valid(self) -> Optional[np.ndarray]:
        """Boolean [1, max_enc] clamp for host-path cross-attention while the
        device encoder cache is AHEAD of the mirror (pipelined replay /
        fallbacks): only the mirror's enc_len frames may be attended, exactly
        what the reference saw at this chunk."""
        if self.enc_len_dispatched <= self.enc_len:
            return None
        return (np.arange(self.e.max_enc_frames) < self.enc_len)[None]

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
        While the device encoder cache is ahead of the mirror (pipelined
        fallback/replay) cross-attention is clamped to the mirror's frames.
        """
        cross_valid = self.mirror_cross_valid()
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
            chunk_budget = min(budget, self.e.finish_decode_steps,
                               max_len - len(self.mt_tokens))
            feed = self.mt_tokens[-1] if self.mt_tokens else EOS
            # scan length is the dominant device cost (~4.4 ms/step through
            # the tunnel) but each extra hop costs a ~31 ms fetch RTT: short
            # scans for typical 1-4 token streaming budgets, a 16-scan
            # mid-tier, and a long scan for the finish flush (decode-to-EOS
            # used to pay ~5 RTTs at 16 steps/hop). The scan appends KV
            # entries for all `steps` slots before truncation, so a tier must
            # also fit the cache: fall back to the next smaller one if not.
            room = self.e.max_mt_tokens - self.mt_steps - 1
            steps = 4
            for tier in (4, self.e.max_decode_per_call,
                         self.e.finish_decode_steps):
                steps = tier
                if chunk_budget <= tier:
                    break
            while steps > room and steps > 4:
                steps = 4 if steps == self.e.max_decode_per_call else \
                    self.e.max_decode_per_call
            chunk_budget = min(chunk_budget, steps, max(room, 1))
            toks, emitted, hit_eos, self.mt_self = self.e._mt_decode_greedy(
                self.e.variables, np.asarray([feed], np.int32),
                np.int32(self.mt_steps), np.int32(chunk_budget),
                self.mt_self, self.mt_cross,
                max_steps=steps, cross_valid=cross_valid)
            toks, emitted, hit_eos = jax.device_get((toks, emitted, hit_eos))
            n = int(emitted[0])
            self.mt_tokens.extend(toks[0][:n].tolist())
            self.mt_steps += n
            self.mt_self = [kv.truncate(np.int32(self.mt_steps))
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
        self.mt_self = [kv.truncate(np.int32(self.mt_steps))
                        for kv in self.mt_self]

    # ------------------------------------------------------------------
    # unit synthesis + vocoder
    # ------------------------------------------------------------------

    def synthesize_units(self, unit_blank: int) -> List[int]:
        """Full-prefix NAR unit generation; returns collapsed unit dict-ids."""
        tokens = [EOS] + self.mt_tokens
        s = _bucket(min(len(tokens), self.e.mt_buckets[-1]),
                    self.e.mt_buckets)
        padded = np.full((1, s), PAD, np.int32)
        padded[0, : len(tokens)] = tokens
        ids = self.e._synthesize(self.e.variables, padded,
                                 self.enc_buf, np.int32(self.enc_len))
        up = self.e.model.cfg.unit_decoder.ctc_upsample_rate
        valid = len(tokens) * up
        ids = jax.device_get(ids[0])[:valid]
        units, _ = ctc_collapse(ids, blank=unit_blank, pad=PAD)
        return [u for u in units if u not in (0, EOS)]

    def emit(self) -> Tuple[List[int], np.ndarray, np.ndarray]:
        """Fused emission path (one device round trip): full-prefix unit
        synthesis, device-side CTC collapse, duration-aware vocoding.
        Returns (unit dict-ids, full wav, per-unit durations)."""
        assert self.e.vocoder is not None, "no vocoder configured"
        tokens = [EOS] + self.mt_tokens
        s = _bucket(min(len(tokens), self.e.mt_buckets[-1]),
                    self.e.mt_buckets)
        padded = np.full((1, s), PAD, np.int32)
        padded[0, : len(tokens)] = tokens
        u_bucket = _bucket(min(len(tokens) *
                               self.e.model.cfg.unit_decoder.ctc_upsample_rate,
                               self.e.unit_buckets[-1]), self.e.unit_buckets)
        max_frames = u_bucket * self.e.max_dur_per_unit
        units, count, wav, n_samples, dur = jax.device_get(self.e._emit(
            self.e.variables, self.e.vocoder_variables, padded,
            self.enc_buf, np.int32(self.enc_len), np.int32(len(tokens)),
            valid_tokens_cap=s, max_frames=max_frames))
        count = int(count)
        unit_ids = units[:count].tolist()
        n = int(n_samples)
        return unit_ids, wav[:n], dur[:count]

    def emit_tail(self, n_prev_units: int
                  ) -> Tuple[List[int], np.ndarray, np.ndarray]:
        """Emission returning only the NEW wav tail (what the agent actually
        writes): windowed vocoding + small fetch. Falls back to the full
        `emit` program when the window/tail caps are exceeded (long final
        flush). Returns (all unit dict-ids, new wav tail, per-unit durations).
        """
        assert self.e.vocoder is not None, "no vocoder configured"
        tokens = [EOS] + self.mt_tokens
        s = _bucket(min(len(tokens), self.e.mt_buckets[-1]),
                    self.e.mt_buckets)
        padded = np.full((1, s), PAD, np.int32)
        padded[0, : len(tokens)] = tokens
        u_bucket = _bucket(min(len(tokens) *
                               self.e.model.cfg.unit_decoder.ctc_upsample_rate,
                               self.e.unit_buckets[-1]), self.e.unit_buckets)
        units, count, dur, tail, cur_len, ok = jax.device_get(
            self.e._emit_tail(
                self.e.variables, self.e.vocoder_variables, padded,
                self.enc_buf, np.int32(self.enc_len), np.int32(len(tokens)),
                np.int32(n_prev_units),
                valid_tokens_cap=s, unit_capacity=u_bucket,
                window_frames=self.e.emit_window_frames,
                ctx_frames=self.e.emit_ctx_frames,
                tail_cap=self.e.emit_tail_cap))
        if not bool(ok):
            unit_ids, wav, dur_np = self.emit()
            new = len(unit_ids) - n_prev_units
            if new <= 0:
                return unit_ids, wav[:0], dur_np
            cur = int(dur_np[-new:].sum()) * 320
            return unit_ids, wav[len(wav) - cur:], dur_np
        count = int(count)
        n = int(cur_len)
        return units[:count].tolist(), tail[:n], dur[:count]

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
