"""Speech-to-text model family: chunk-Conformer encoder + text decoder (+CTC).

Covers the reference's S2T baselines:
- `chunk_s2t_conformer` (`researches/chunk_unity/models/s2t_conformer.py:222`)
- `s2t_conformer_modified` (`researches/translatotron/models/*.py:20-31`)
- the encoder+decoder backbone of the DiSeg S2TT baseline family
  (`researches/diseg/models/*.py` — the differentiable-segmentation criterion
  itself is roadmap, SURVEY §2.5).

Training: label-smoothed CE on the decoder (+ optional encoder CTC head, the
hybrid CTC/attention setup used for streaming ASR evaluation in BASELINE.md).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from streamspeech_tpu.config import DecoderConfig, EncoderConfig
from streamspeech_tpu.models.conformer import ChunkConformerEncoder
from streamspeech_tpu.models.transformer import CTCHead, PAD, TransformerDecoder
from streamspeech_tpu.ops.masks import lengths_to_mask


class S2TConformerModel(nn.Module):
    encoder_cfg: EncoderConfig
    decoder_cfg: DecoderConfig
    ctc_vocab: int = 0  # > 0 adds an encoder CTC head
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = ChunkConformerEncoder(self.encoder_cfg, dtype=self.dtype,
                                             name="encoder")
        self.decoder = TransformerDecoder(self.decoder_cfg, dtype=self.dtype,
                                          name="decoder")
        self.ctc_head = (CTCHead(self.ctc_vocab, dtype=self.dtype,
                                 name="ctc_head") if self.ctc_vocab else None)

    def __call__(self, src_tokens, src_lengths, prev_output_tokens,
                 chunk_size: Optional[int] = None,
                 conv_chunk_size: Optional[int] = None,
                 deterministic: bool = True,
                 use_running_stats: bool = True) -> Dict[str, jnp.ndarray]:
        enc, enc_lengths = self.encoder(src_tokens, src_lengths, chunk_size,
                                        conv_chunk_size, deterministic,
                                        use_running_stats)
        enc_valid = lengths_to_mask(enc_lengths, enc.shape[1])
        logits, feats = self.decoder(prev_output_tokens, enc, enc_valid, None,
                                     deterministic)
        out = {"logits": logits, "encoder_out": enc,
               "encoder_lengths": enc_lengths, "encoder_valid": enc_valid}
        if self.ctc_head is not None:
            out["ctc_logits"] = self.ctc_head(enc)
        return out


def s2t_loss(out: Dict[str, jnp.ndarray], targets: jnp.ndarray,
             label_smoothing: float = 0.1,
             ctc_targets: Optional[jnp.ndarray] = None,
             ctc_target_lengths: Optional[jnp.ndarray] = None,
             ctc_weight: float = 0.0) -> Dict[str, jnp.ndarray]:
    from streamspeech_tpu.train.criterion import label_smoothed_nll
    from streamspeech_tpu.ops.ctc import ctc_loss_sum

    valid = targets != PAD
    ce = label_smoothed_nll(out["logits"], targets, valid, label_smoothing)
    total = ce["loss"]
    metrics = {"ce_loss": ce["loss"], "nll_loss": ce["nll_loss"]}
    if ctc_weight > 0 and ctc_targets is not None:
        ctc = ctc_loss_sum(
            jax.nn.log_softmax(out["ctc_logits"].astype(jnp.float32), -1),
            out["encoder_lengths"], ctc_targets, ctc_target_lengths, blank_id=0)
        total = total + ctc_weight * ctc
        metrics["ctc_loss"] = ctc
    metrics["loss"] = total
    metrics["sample_size"] = jnp.maximum(jnp.sum(valid), 1)
    return metrics
