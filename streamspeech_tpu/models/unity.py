"""UnitY-family baselines: two-pass S2UT with an AUTOREGRESSIVE unit decoder.

Behavioral references:
- `researches/chunk_unity/models/s2s_conformer_chunk_unity.py:51` (chunk_unity_conformer)
- `researches/uni_unity/models/s2s_conformer_uni_unity.py:51` (uni_unity_conformer,
  + wait-k criterion variant)
- fairseq original `fairseq/fairseq/models/speech_to_speech/s2s_conformer_unity.py`
  with `TransformerUnitDecoder` (`chunk_unity/models/s2s_transformer.py:60`).

Same chunk-Conformer encoder + first-pass MT decoder + T2U encoder as
StreamSpeech; the second pass is a standard AR transformer decoder over units
(pre-norm, CE loss) instead of the ×upsample NAR CTC decoder. Model selection:

  arch "streamspeech"          → models.streamspeech.StreamSpeechModel (NAR)
  arch "chunk_unity_conformer" → UnitYModel(chunk encoder)
  arch "uni_unity_conformer"   → UnitYModel(unidirectional encoder, chunk=None)
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from streamspeech_tpu.config import DecoderConfig, StreamSpeechConfig
from streamspeech_tpu.models.conformer import ChunkConformerEncoder
from streamspeech_tpu.models.streamspeech import ctc_not_blank_probs
from streamspeech_tpu.models.transformer import (
    AugTransformerUnitDecoder,
    CTCHead,
    PAD,
    TransformerDecoder,
    UniTransformerEncoder,
)
from streamspeech_tpu.ops.masks import lengths_to_mask, streaming_allowed_from_ctc
from streamspeech_tpu.registry import ARCHS


class UnitYModel(nn.Module):
    """Two-pass S2UT with AR unit decoder (4L unit decoder in the UnitY paper;
    layer counts come from the config)."""

    cfg: StreamSpeechConfig
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.encoder = ChunkConformerEncoder(c.encoder, dtype=self.dtype,
                                             name="encoder")
        self.source_unigram_head = CTCHead(c.source_unigram_vocab,
                                           dtype=self.dtype,
                                           name="source_unigram_head")
        self.ctc_target_unigram_head = CTCHead(c.ctc_target_unigram_vocab,
                                               dtype=self.dtype,
                                               name="ctc_target_unigram_head")
        self.mt_decoder = TransformerDecoder(c.mt_decoder, dtype=self.dtype,
                                             name="mt_decoder")
        self.synthesizer_encoder = (
            UniTransformerEncoder(
                c.mt_decoder.embed_dim, c.mt_decoder.ffn_embed_dim,
                c.mt_decoder.attention_heads, c.synthesizer_encoder_layers,
                c.mt_decoder.dropout, unidirectional=c.encoder.unidirectional,
                dtype=self.dtype, name="synthesizer_encoder")
            if c.synthesizer_encoder_layers > 0 else None)
        # AR unit decoder: a TransformerDecoder over the unit vocabulary
        ud = DecoderConfig(
            embed_dim=c.unit_decoder.embed_dim,
            ffn_embed_dim=c.unit_decoder.ffn_embed_dim,
            layers=c.unit_decoder.layers,
            attention_heads=c.unit_decoder.attention_heads,
            dropout=c.unit_decoder.dropout,
            normalize_before=True,
            vocab_size=c.unit_decoder.vocab_size,
            max_target_positions=c.unit_decoder.max_target_positions)
        if getattr(c, "t2u_augmented_cross_attn", False):
            # --synthesizer-augmented-cross-attention: dual cross-attention,
            # primary = speech encoder out, aug = T2U out
            # (`s2s_conformer_unity.py:258-263`)
            self.unit_decoder = AugTransformerUnitDecoder(
                ud, dtype=self.dtype, name="unit_decoder")
        else:
            self.unit_decoder = TransformerDecoder(ud, dtype=self.dtype,
                                                   name="unit_decoder")

    def __call__(
        self,
        src_tokens: jnp.ndarray,
        src_lengths: jnp.ndarray,
        prev_output_tokens_mt: jnp.ndarray,
        prev_output_tokens: jnp.ndarray,   # AR unit teacher-forcing input
        chunk_size: Optional[int] = 8,
        conv_chunk_size: Optional[int] = 8,
        k1: int = 0,
        n1: int = 1,
        streaming: bool = False,
        deterministic: bool = True,
        use_running_stats: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        enc, enc_lengths = self.encoder(src_tokens, src_lengths, chunk_size,
                                        conv_chunk_size, deterministic,
                                        use_running_stats)
        enc_valid = lengths_to_mask(enc_lengths, enc.shape[1])
        asr_logits = self.source_unigram_head(enc)
        st_logits = self.ctc_target_unigram_head(enc)

        allowed_cross = None
        if streaming:
            asr_nb = ctc_not_blank_probs(asr_logits, blank=0)
            st_nb = ctc_not_blank_probs(st_logits, blank=0)
            eff_chunk = (chunk_size if chunk_size is not None and
                         chunk_size < 999 else None)
            allowed_cross = streaming_allowed_from_ctc(
                asr_nb, st_nb, prev_output_tokens_mt.shape[1], k1, n1, n1,
                eff_chunk)

        mt_logits, mt_feats = self.mt_decoder(prev_output_tokens_mt, enc,
                                              enc_valid, allowed_cross,
                                              deterministic)
        mt_valid = prev_output_tokens_mt != PAD
        t2u = (self.synthesizer_encoder(mt_feats, mt_valid, deterministic)
               if self.synthesizer_encoder is not None else mt_feats)
        if isinstance(self.unit_decoder, AugTransformerUnitDecoder):
            unit_logits, _ = self.unit_decoder(
                prev_output_tokens, enc, t2u, enc_valid, mt_valid,
                deterministic)
        else:
            unit_logits, _ = self.unit_decoder(prev_output_tokens, t2u,
                                               mt_valid, None, deterministic)
        return {
            "unit_logits": unit_logits,
            "mt_logits": mt_logits,
            "asr_logits": asr_logits,
            "st_logits": st_logits,
            "encoder_out": enc,
            "encoder_lengths": enc_lengths,
            "encoder_valid": enc_valid,
            "mt_valid": mt_valid,
        }


@ARCHS.register("chunk_unity_conformer")
def chunk_unity_conformer(cfg: Optional[StreamSpeechConfig] = None) -> StreamSpeechConfig:
    cfg = cfg or StreamSpeechConfig.simul_s2st()
    cfg.encoder.chunk_size = 8
    cfg.unit_decoder.layers = 2
    return cfg


@ARCHS.register("uni_unity_conformer")
def uni_unity_conformer(cfg: Optional[StreamSpeechConfig] = None) -> StreamSpeechConfig:
    cfg = cfg or StreamSpeechConfig.simul_s2st()
    cfg.encoder.chunk_size = None
    cfg.encoder.unidirectional = True
    return cfg


@ARCHS.register("streamspeech")
def streamspeech_arch(cfg: Optional[StreamSpeechConfig] = None) -> StreamSpeechConfig:
    return cfg or StreamSpeechConfig.simul_s2st()


@ARCHS.register("streamspeech_cascade")
def streamspeech_cascade_arch(cfg: Optional[StreamSpeechConfig] = None
                              ) -> StreamSpeechConfig:
    cfg = cfg or StreamSpeechConfig.simul_s2st()
    cfg.cascade = True
    return cfg


def unity_loss(out: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray],
               label_smoothing: float = 0.1) -> Dict[str, jnp.ndarray]:
    """UnitY criterion: label-smoothed CE on AR unit logits + the same multitask
    losses as StreamSpeech (`fairseq/fairseq/criterions/speech_to_speech_criterion.py`
    RdropLabelSmoothedCrossEntropyCriterion path)."""
    from streamspeech_tpu.train.criterion import label_smoothed_nll
    from streamspeech_tpu.ops.ctc import ctc_loss_sum
    import jax

    unit_valid = batch["target_units"] != PAD
    ce = label_smoothed_nll(out["unit_logits"], batch["target_units"],
                            unit_valid, label_smoothing)
    mt_valid = batch["mt_targets"] != PAD
    mt_ce = label_smoothed_nll(out["mt_logits"], batch["mt_targets"], mt_valid,
                               label_smoothing)
    enc_lengths = out["encoder_lengths"]
    asr_loss = ctc_loss_sum(
        jax.nn.log_softmax(out["asr_logits"].astype(jnp.float32), -1),
        enc_lengths, batch["src_text"], batch["src_text_lengths"], blank_id=0)
    st_loss = ctc_loss_sum(
        jax.nn.log_softmax(out["st_logits"].astype(jnp.float32), -1),
        enc_lengths, batch["tgt_text"], batch["tgt_text_lengths"], blank_id=0)
    total = ce["loss"] + 8.0 * mt_ce["loss"] + 4.0 * asr_loss + 4.0 * st_loss
    return {
        "loss": total,
        "unit_ce_loss": ce["loss"],
        "mt_loss": mt_ce["loss"],
        "asr_ctc_loss": asr_loss,
        "st_ctc_loss": st_loss,
        "sample_size": jnp.maximum(jnp.sum(unit_valid), 1),
    }
