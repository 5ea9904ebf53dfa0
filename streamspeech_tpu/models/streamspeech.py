"""StreamSpeech model assembly (two-pass S2UT with CTC-guided streaming).

Behavioral reference: `researches/ctc_unity/models/streamspeech_model.py:57-430`.

Forward (training):
  fbank → chunk Conformer encoder → {ASR CTC head, ST CTC head} → CTC-derived
  streaming mask (stop-gradient) → MT decoder (cross-attn restricted by the mask)
  → T2U encoder (causal) → ×upsample NAR unit-CTC decoder (wait-k cross mask).

Aux-head blank conventions (checked against the reference):
- unit CTC: blank = last index ("<blank>" appended by the task,
  `researches/ctc_unity/tasks/speech_to_speech_ctc.py:14-19`);
- ASR/ST CTC heads: blank = index 0 — fairseq's CtcCriterion defaults to blank 0
  when the task has no blank_symbol (`fairseq/fairseq/criterions/ctc.py`), and the
  streaming-mask computation reads probs[..., 0] as blank
  (`streamspeech_model.py:288-341`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from streamspeech_tpu.config import StreamSpeechConfig
from streamspeech_tpu.models.conformer import ChunkConformerEncoder
from streamspeech_tpu.models.transformer import (
    CTCHead,
    CTCTransformerUnitDecoder,
    TransformerDecoder,
    UniTransformerEncoder,
    UniTransformerEncoderWithEmb,
    PAD,
)
from streamspeech_tpu.ops.masks import (lengths_to_mask,
    streaming_allowed_from_ctc, waitk_allowed)


def ctc_not_blank_probs(logits: jnp.ndarray, blank: int = 0) -> jnp.ndarray:
    """P(new token emitted at frame t) = 1 - P(blank) - P(repeat of previous frame),
    reference `streamspeech_model.py:288-314`. Returns stop-gradient'd [B, T].

    repeat_t = Σ_{v≠blank} p_t(v)·p_{t-1}(v) is computed as the full dot of
    consecutive prob rows minus the blank product — algebraically identical
    to the reference's concatenate-out-the-blank-column form, but it avoids
    materializing TWO extra [B, T, V] fp32 buffers (nonblank + shifted copy):
    at the train shape [8, 256, 6000] those were the single largest HBM
    writes in the whole step (scripts/analyze_hlo.py, ×2 aux heads). The
    slice pair below fuses into the reduction.

    On TPU at mask-building shapes the whole computation runs as one Pallas
    kernel (`ops/pallas_policy.py`): logits stream through VMEM once and the
    fp32 posteriors never reach HBM at all (output is only [B, T])."""
    from streamspeech_tpu.ops.pallas_policy import (nb_pallas_ok,
                                                    not_blank_probs_pallas)

    if nb_pallas_ok(logits.shape[1], logits.shape[-1]):
        return not_blank_probs_pallas(logits, blank)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    blank_p = probs[:, :, blank]
    dot = jnp.einsum("btv,btv->bt", probs[:, 1:], probs[:, :-1])
    dot = jnp.pad(dot, ((0, 0), (1, 0)))
    prev_blank = jnp.pad(blank_p[:, :-1], ((0, 0), (1, 0)))
    repeat = dot - blank_p * prev_blank
    return jax.lax.stop_gradient(1.0 - (repeat + blank_p))


class StreamSpeechModel(nn.Module):
    cfg: StreamSpeechConfig
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.encoder = ChunkConformerEncoder(c.encoder, dtype=self.dtype,
                                             name="encoder")
        self.source_unigram_head = CTCHead(c.source_unigram_vocab, dtype=self.dtype,
                                           name="source_unigram_head")
        self.ctc_target_unigram_head = CTCHead(c.ctc_target_unigram_vocab,
                                               dtype=self.dtype,
                                               name="ctc_target_unigram_head")
        self.mt_decoder = TransformerDecoder(c.mt_decoder, dtype=self.dtype,
                                             name="mt_decoder")
        if c.synthesizer_encoder_layers <= 0:
            self.synthesizer_encoder = None
        elif c.cascade:
            # cascade variant: T2U consumes re-embedded MT OUTPUT tokens →
            # standalone real-time TTS (`streamspeech_model_cascade.py:280-375`)
            self.synthesizer_encoder = UniTransformerEncoderWithEmb(
                c.mt_decoder.embed_dim, c.mt_decoder.ffn_embed_dim,
                c.mt_decoder.attention_heads, c.synthesizer_encoder_layers,
                c.mt_decoder.vocab_size, c.mt_decoder.dropout,
                unidirectional=True, dtype=self.dtype,
                name="synthesizer_encoder")
        else:
            self.synthesizer_encoder = UniTransformerEncoder(
                c.mt_decoder.embed_dim, c.mt_decoder.ffn_embed_dim,
                c.mt_decoder.attention_heads, c.synthesizer_encoder_layers,
                c.mt_decoder.dropout, unidirectional=True, dtype=self.dtype,
                name="synthesizer_encoder")
        self.unit_decoder = CTCTransformerUnitDecoder(c.unit_decoder,
                                                      dtype=self.dtype,
                                                      name="unit_decoder")

    def encode(self, src_tokens, src_lengths, chunk_size=None, conv_chunk_size=None,
               deterministic=True, use_running_stats=True):
        return self.encoder(src_tokens, src_lengths, chunk_size, conv_chunk_size,
                            deterministic, use_running_stats)

    def __call__(
        self,
        src_tokens: jnp.ndarray,          # [B, T, 80]
        src_lengths: jnp.ndarray,         # [B]
        prev_output_tokens_mt: jnp.ndarray,  # [B, S]
        chunk_size: Optional[int] = 8,
        conv_chunk_size: Optional[int] = 8,
        k1: int = 0,
        n1: int = 1,
        k2: int = 0,
        n2: Optional[int] = None,
        streaming: bool = True,
        mt_mask_mode: str = "ctc",   # "ctc" (CTC-derived) | "waitk" (fixed)
        deterministic: bool = True,
        use_running_stats: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        enc, enc_lengths = self.encoder(src_tokens, src_lengths, chunk_size,
                                        conv_chunk_size, deterministic,
                                        use_running_stats)
        t_enc = enc.shape[1]
        enc_valid = lengths_to_mask(enc_lengths, t_enc)

        asr_logits = self.source_unigram_head(enc)
        st_logits = self.ctc_target_unigram_head(enc)

        allowed_cross = None
        if streaming and mt_mask_mode == "waitk":
            # fixed wait-k training (`speech_to_speech_ctc_waitk_criterion.py:74`)
            allowed_cross = waitk_allowed(prev_output_tokens_mt.shape[1],
                                          t_enc, k1, n1, n1)
        elif streaming:
            asr_nb = ctc_not_blank_probs(asr_logits, blank=0)
            st_nb = ctc_not_blank_probs(st_logits, blank=0)
            eff_chunk = (chunk_size if chunk_size is not None and chunk_size < 999
                         else None)
            allowed_cross = streaming_allowed_from_ctc(
                asr_nb, st_nb, prev_output_tokens_mt.shape[1],
                src_wait=k1, src_step=n1, tgt_step=n1, chunk_size=eff_chunk)

        mt_logits, mt_feats = self.mt_decoder(prev_output_tokens_mt, enc, enc_valid,
                                              allowed_cross, deterministic)
        mt_valid = prev_output_tokens_mt != PAD

        if self.synthesizer_encoder is None:
            t2u = mt_feats
        elif c.cascade:
            t2u = self.synthesizer_encoder(prev_output_tokens_mt, deterministic)
        else:
            t2u = self.synthesizer_encoder(mt_feats, mt_valid, deterministic)

        unit_logits, _ = self.unit_decoder(
            t2u, enc_valid=mt_valid,
            src_wait=k2 if streaming else None,
            src_step=n2 if streaming else None,
            deterministic=deterministic)

        return {
            "unit_logits": unit_logits,          # [B, S*up, V_units]
            "mt_logits": mt_logits,              # [B, S, V_text]
            "mt_features": mt_feats,
            "asr_logits": asr_logits,            # [B, T', V_src]
            "st_logits": st_logits,              # [B, T', V_tgt_text]
            "encoder_out": enc,
            "encoder_lengths": enc_lengths,
            "encoder_valid": enc_valid,
            "mt_valid": mt_valid,
        }


    # ------------------------------------------------------------------
    # incremental (streaming) methods — used via model.apply(..., method=...)
    # ------------------------------------------------------------------

    def encoder_stream_init(self, batch: int, max_frames: int):
        return self.encoder.init_stream_state(batch, max_frames)

    def encode_block_with_ctc(self, block, state, chunk_size: int,
                              conv_chunk_size: int, valid_len=None):
        """Streaming hot path: encode one block incrementally and return the
        aux-CTC argmax ids for the new frames (the policy inputs).
        Returns (enc_block, state', asr_ids [B,s], st_ids [B,s])."""
        enc, state = self.encoder.encode_block(block, state, chunk_size,
                                               conv_chunk_size, valid_len)
        asr_ids = jnp.argmax(self.source_unigram_head(enc), axis=-1)
        st_ids = jnp.argmax(self.ctc_target_unigram_head(enc), axis=-1)
        return enc, state, asr_ids, st_ids

    def mt_decoder_step(self, tokens_new, position_offset, self_caches,
                        cross_caches):
        """One (or few) MT token step(s) with KV caches (greedy continue-from-
        prefix, `agent/sequence_generator.py:165-215` semantics)."""
        return self.mt_decoder.step(tokens_new, position_offset, self_caches,
                                    cross_caches, None)

    def mt_decode_greedy(self, first_token, offset, budget, self_caches,
                         cross_caches, max_steps: int = 16, cross_valid=None):
        """Greedy-decode up to ``budget`` (≤ max_steps) MT tokens in ONE jitted
        call via lax.scan — a single host↔device round trip per policy call
        instead of one per token (the reference pays a full generator run per
        chunk). Returns (tokens [B, max_steps] PAD-padded, n_emitted [B],
        hit_eos [B], self_caches'). Iterations after stop append garbage KV
        entries; the caller truncates the caches to offset + n_emitted.
        """
        eos, pad = 2, 1

        def body(carry, i):
            feed, emitted, stopped, caches = carry
            logits, _, caches = self.mt_decoder.step(
                feed[:, None], offset + i, caches, cross_caches, cross_valid)
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            nxt = jnp.where(nxt == pad, eos, nxt)  # never emit pad
            valid = (~stopped) & (nxt != eos) & (emitted < budget)
            emitted = emitted + valid.astype(jnp.int32)
            stopped = stopped | (nxt == eos) | (emitted >= budget)
            feed = jnp.where(valid, nxt, feed)
            out = jnp.where(valid, nxt, jnp.full_like(nxt, pad))
            return (feed, emitted, stopped, caches), (out, nxt == eos)

        b = first_token.shape[0]
        init = (first_token.astype(jnp.int32),
                jnp.zeros((b,), jnp.int32),
                jnp.zeros((b,), bool),
                self_caches)
        (feed, emitted, stopped, caches), (outs, eos_seen) = jax.lax.scan(
            body, init, jnp.arange(max_steps, dtype=jnp.int32))
        return outs.T, emitted, jnp.any(eos_seen, axis=0), caches

    def mt_fill_cross(self, enc_new, cross_caches):
        """Append newly-encoded frames into the MT decoder's cross-attn caches
        (the reference appends grown encoder keys, `transformer_layer.py:490-506`)."""
        return self.mt_decoder.fill_cross_caches(enc_new, cross_caches)

    def synthesize_units(self, prev_output_tokens_mt, enc, enc_len):
        """Fresh full-prefix unit synthesis, exactly the reference's emission path
        (`agent/...agent.py:638-700`): re-run MT decoder features over the full
        prefix against the CURRENT encoder (no streaming mask), T2U encoder
        (causal), NAR unit decoder (full), return unit-CTC argmax ids.

        enc: [B, T_max, C] accumulated encoder buffer; enc_len: valid frames.
        """
        t = enc.shape[1]
        enc_valid = lengths_to_mask(jnp.asarray([enc_len])
                                    if jnp.ndim(enc_len) == 0 else enc_len, t)
        feats = self.mt_decoder.extract_features(prev_output_tokens_mt, enc,
                                                 enc_valid, None, True)
        mt_valid = prev_output_tokens_mt != PAD
        if self.synthesizer_encoder is None:
            t2u = feats
        elif self.cfg.cascade:
            t2u = self.synthesizer_encoder(prev_output_tokens_mt, True)
        else:
            t2u = self.synthesizer_encoder(feats, mt_valid, True)
        unit_logits, _ = self.unit_decoder(t2u, enc_valid=mt_valid,
                                           deterministic=True,
                                           serving_positions=True)
        return jnp.argmax(unit_logits, axis=-1), unit_logits


def build_model(cfg: StreamSpeechConfig, dtype=jnp.float32) -> StreamSpeechModel:
    return StreamSpeechModel(cfg, dtype=dtype)


def init_params(model: StreamSpeechModel, rng, batch=2, frames=64, mt_len=8):
    c = model.cfg
    src = jnp.zeros((batch, frames, c.encoder.input_feat_per_channel))
    lens = jnp.full((batch,), frames, dtype=jnp.int32)
    mt = jnp.full((batch, mt_len), 2, dtype=jnp.int32)
    return model.init({"params": rng}, src, lens, mt, n2=1,
                      use_running_stats=False)
