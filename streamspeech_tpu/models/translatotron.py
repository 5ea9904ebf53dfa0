"""Translatotron 2: two-pass direct S2ST with a SPECTROGRAM synthesizer.

Behavioral reference: `researches/translatotron/models/*.py:20-31`
(s2spect2_conformer_modified) wrapping fairseq's
`fairseq/fairseq/models/speech_to_speech/s2s_conformer_translatotron2.py`:
chunk-Conformer encoder → linguistic (MT) decoder → synthesizer encoder →
TTS transformer decoder that autoregressively predicts mel-spectrogram frames
(n_frames_per_step at a time) + an EOS/stop head, refined by a conv postnet
(`fairseq/fairseq/models/text_to_speech/tts_transformer.py` decoder +
`fastspeech2.py` Postnet).

Loss (`fairseq/fairseq/criterions/speech_to_speech_criterion.py` Tacotron2 path):
L1+L2 on before/after-postnet spectra + BCE on the stop logit + multitask CE/CTC.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn

from streamspeech_tpu.models.layers import LayerNorm
import jax
import jax.numpy as jnp

from streamspeech_tpu.config import StreamSpeechConfig
from streamspeech_tpu.models.conformer import ChunkConformerEncoder
from streamspeech_tpu.models.transformer import (
    CTCHead,
    PAD,
    TransformerDecoder,
    TransformerDecoderLayer,
    UniTransformerEncoder,
)
from streamspeech_tpu.ops.masks import causal_allowed, lengths_to_mask
from streamspeech_tpu.ops.pos_encoding import sinusoidal_embedding


class Postnet(nn.Module):
    """5 × (conv1d k5 → BN → tanh) residual refiner (`fastspeech2.py` Postnet)."""

    mel_dim: int = 80
    channels: int = 512
    kernel: int = 5
    layers: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_stats: bool = True):
        from streamspeech_tpu.ops.conv1d import conv1d

        y = x
        for i in range(self.layers):
            cout = self.mel_dim if i == self.layers - 1 else self.channels
            w = self.param(f"conv{i}_w", nn.initializers.normal(0.02),
                           (self.kernel, y.shape[-1], cout))
            b = self.param(f"conv{i}_b", nn.initializers.zeros, (cout,))
            y = conv1d(y, w.astype(self.dtype), b.astype(self.dtype),
                       padding=(self.kernel - 1) // 2)
            y = nn.BatchNorm(use_running_average=use_running_stats,
                             momentum=0.9, name=f"bn{i}", dtype=self.dtype)(y)
            if i != self.layers - 1:
                y = jnp.tanh(y)
        return x + y


class TTSTransformerDecoder(nn.Module):
    """Autoregressive spectrogram decoder: prenet → transformer decoder layers
    (causal self-attn + cross-attn to the synthesizer encoder) → feat_out +
    eos_out heads."""

    mel_dim: int = 80
    embed_dim: int = 512
    ffn_dim: int = 2048
    heads: int = 8
    layers: int = 4
    n_frames_per_step: int = 1
    prenet_dim: int = 256
    dropout: float = 0.1
    max_positions: int = 4096
    dtype: Any = jnp.float32

    def setup(self):
        self.prenet1 = nn.Dense(self.prenet_dim, dtype=self.dtype, name="prenet1")
        self.prenet2 = nn.Dense(self.prenet_dim, dtype=self.dtype, name="prenet2")
        self.prenet_proj = nn.Dense(self.embed_dim, dtype=self.dtype,
                                    name="prenet_proj")
        self.pos_table = jnp.asarray(
            sinusoidal_embedding(self.max_positions, self.embed_dim, PAD))
        self.dec_layers = [
            TransformerDecoderLayer(self.embed_dim, self.ffn_dim, self.heads,
                                    self.dropout, normalize_before=True,
                                    dtype=self.dtype, name=f"layers_{i}")
            for i in range(self.layers)
        ]
        self.layer_norm = LayerNorm(dtype=self.dtype, name="layer_norm")
        self.feat_out = nn.Dense(self.mel_dim * self.n_frames_per_step,
                                 dtype=self.dtype, name="feat_out")
        self.eos_out = nn.Dense(1, dtype=self.dtype, name="eos_out")

    def __call__(self, prev_frames, enc, enc_valid=None, deterministic=True):
        """prev_frames [B, T, mel_dim] (teacher forcing, shifted right)."""
        b, t, _ = prev_frames.shape
        x = jax.nn.relu(self.prenet1(prev_frames))
        x = jax.nn.relu(self.prenet2(x))
        x = self.prenet_proj(x)
        pos = jnp.clip(PAD + 1 + jnp.arange(t), 0, self.pos_table.shape[0] - 1)
        x = x + jnp.take(self.pos_table, pos, axis=0)[None]
        allowed = causal_allowed(t)
        for layer in self.dec_layers:
            x, _ = layer(x, enc, allowed, None, None, enc_valid, deterministic)
        x = self.layer_norm(x)
        feats = self.feat_out(x).reshape(b, t * self.n_frames_per_step,
                                         self.mel_dim)
        eos_logits = self.eos_out(x)[..., 0]
        return feats, eos_logits


class Translatotron2Model(nn.Module):
    cfg: StreamSpeechConfig
    mel_dim: int = 80
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.encoder = ChunkConformerEncoder(c.encoder, dtype=self.dtype,
                                             name="encoder")
        self.source_unigram_head = CTCHead(c.source_unigram_vocab,
                                           dtype=self.dtype,
                                           name="source_unigram_head")
        self.mt_decoder = TransformerDecoder(c.mt_decoder, dtype=self.dtype,
                                             name="mt_decoder")
        self.synthesizer_encoder = UniTransformerEncoder(
            c.mt_decoder.embed_dim, c.mt_decoder.ffn_embed_dim,
            c.mt_decoder.attention_heads, max(c.synthesizer_encoder_layers, 1),
            c.mt_decoder.dropout, unidirectional=False, dtype=self.dtype,
            name="synthesizer_encoder")
        self.spec_decoder = TTSTransformerDecoder(
            mel_dim=self.mel_dim, embed_dim=c.mt_decoder.embed_dim,
            ffn_dim=c.mt_decoder.ffn_embed_dim,
            heads=c.mt_decoder.attention_heads, layers=c.unit_decoder.layers,
            dropout=c.mt_decoder.dropout, dtype=self.dtype, name="spec_decoder")
        self.postnet = Postnet(self.mel_dim, dtype=self.dtype, name="postnet")

    def __call__(self, src_tokens, src_lengths, prev_output_tokens_mt,
                 prev_spec_frames, chunk_size=None, conv_chunk_size=None,
                 deterministic=True, use_running_stats=True
                 ) -> Dict[str, jnp.ndarray]:
        enc, enc_lengths = self.encoder(src_tokens, src_lengths, chunk_size,
                                        conv_chunk_size, deterministic,
                                        use_running_stats)
        enc_valid = lengths_to_mask(enc_lengths, enc.shape[1])
        asr_logits = self.source_unigram_head(enc)
        mt_logits, mt_feats = self.mt_decoder(prev_output_tokens_mt, enc,
                                              enc_valid, None, deterministic)
        mt_valid = prev_output_tokens_mt != PAD
        t2u = self.synthesizer_encoder(mt_feats, mt_valid, deterministic)
        spec_before, eos_logits = self.spec_decoder(prev_spec_frames, t2u,
                                                    mt_valid, deterministic)
        spec_after = self.postnet(spec_before, use_running_stats)
        return {
            "spec_before": spec_before,
            "spec_after": spec_after,
            "eos_logits": eos_logits,
            "mt_logits": mt_logits,
            "asr_logits": asr_logits,
            "encoder_lengths": enc_lengths,
        }


    def generate_spec(self, src_tokens, src_lengths, prev_output_tokens_mt,
                      max_frames: int = 256, stop_threshold: float = 0.5,
                      chunk_size=None, conv_chunk_size=None):
        """Offline spectrogram generation (the reference's Tacotron2-style
        inference loop, `fairseq/fairseq/models/text_to_speech/tts_transformer.py`
        decoder eval path): encode → MT features (teacher-forced tokens) →
        synthesizer encoder → autoregressively decode mel frames until the
        stop head fires. Returns (mel [B, max_frames, mel], n_frames [B]).

        The AR loop is a lax.scan over a static frame budget: each step
        re-runs the (short) decoder over the prefix — O(T²) like the
        reference's loop, fine for offline eval; KV caches would drop it to
        O(T) if this baseline ever needs serving."""
        c = self.cfg
        enc, enc_lengths = self.encoder(src_tokens, src_lengths, chunk_size,
                                        conv_chunk_size, True, True)
        enc_valid = lengths_to_mask(enc_lengths, enc.shape[1])
        _, mt_feats = self.mt_decoder(prev_output_tokens_mt, enc, enc_valid,
                                      None, True)
        mt_valid = prev_output_tokens_mt != PAD
        t2u = self.synthesizer_encoder(mt_feats, mt_valid, True)
        b = src_tokens.shape[0]
        mel_buf = jnp.zeros((b, max_frames + 1, self.mel_dim), self.dtype)

        def body(carry, i):
            mel_buf, stopped, n = carry
            feats, eos_logits = self.spec_decoder(mel_buf[:, :max_frames],
                                                  t2u, mt_valid, True)
            frame = jnp.take_along_axis(
                feats, i[None, None, None].repeat(b, 0), axis=1)[:, 0]
            stop = jax.nn.sigmoid(jnp.take_along_axis(
                eos_logits, i[None, None].repeat(b, 0), axis=1))[:, 0] \
                > stop_threshold
            mel_buf = jax.lax.dynamic_update_slice(
                mel_buf, frame[:, None], (0, i + 1, 0))
            n = n + (~stopped).astype(jnp.int32)
            stopped = stopped | stop
            return (mel_buf, stopped, n), None

        (mel_buf, stopped, n), _ = jax.lax.scan(
            body, (mel_buf, jnp.zeros((b,), bool), jnp.zeros((b,), jnp.int32)),
            jnp.arange(max_frames))
        mel = self.postnet(mel_buf[:, 1:], True)
        return mel, n


def synthesize_translatotron2(model, variables, src_tokens, src_lengths,
                              prev_output_tokens_mt, max_frames: int = 256):
    """Full offline T2 eval path: spectrogram generation + Griffin-Lim
    waveform synthesis. Returns (wav [B, samples], n_samples [B])."""
    import numpy as np

    from streamspeech_tpu.ops.griffin_lim import griffin_lim_from_logmel

    import functools

    @functools.partial(jax.jit, static_argnames=("max_frames",))
    def gen(variables, src, lens, mt, max_frames):
        return model.apply(variables, src, lens, mt, max_frames=max_frames,
                           method=Translatotron2Model.generate_spec)

    mel, n = gen(variables, src_tokens, src_lengths, prev_output_tokens_mt,
                 max_frames=max_frames)
    mel, n = jax.device_get((mel, n))
    wavs = []
    for i in range(mel.shape[0]):
        wavs.append(np.asarray(griffin_lim_from_logmel(mel[i])))
    n_samples = n * 160  # 10 ms hop
    return np.stack(wavs), n_samples


def translatotron2_loss(out, batch, label_smoothing: float = 0.1
                        ) -> Dict[str, jnp.ndarray]:
    """L1+L2 spectrogram losses (before+after postnet) + stop BCE + MT CE."""
    from streamspeech_tpu.train.criterion import label_smoothed_nll

    tgt = batch["target_spec"]                     # [B, T, mel]
    valid = batch["spec_valid"][..., None].astype(jnp.float32)
    n = jnp.maximum(jnp.sum(valid), 1.0)

    def spec_loss(pred):
        diff = (pred - tgt) * valid
        return (jnp.sum(jnp.abs(diff)) + jnp.sum(diff ** 2)) / n

    l_spec = spec_loss(out["spec_before"]) + spec_loss(out["spec_after"])
    eos_tgt = batch["eos_targets"].astype(jnp.float32)
    bce = optax_sigmoid_bce(out["eos_logits"], eos_tgt,
                            batch["spec_valid"].astype(jnp.float32))
    mt_valid = batch["mt_targets"] != PAD
    ce = label_smoothed_nll(out["mt_logits"], batch["mt_targets"], mt_valid,
                            label_smoothing)
    total = l_spec + bce + ce["loss"] / jnp.maximum(jnp.sum(mt_valid), 1)
    return {"loss": total, "spec_loss": l_spec, "eos_bce": bce,
            "mt_loss": ce["loss"], "sample_size": jnp.asarray(1.0)}


def optax_sigmoid_bce(logits, targets, valid):
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    loss = -(targets * log_p + (1 - targets) * log_not_p) * valid
    return jnp.sum(loss) / jnp.maximum(jnp.sum(valid), 1.0)
