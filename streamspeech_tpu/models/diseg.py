"""DiSeg: differentiable segmentation for simultaneous speech translation.

Behavioral reference: `researches/diseg/criterions/speech_to_text_multitask_with_seg.py:112-281`
and `researches/diseg/models/*_seg.py` (ACL'23). Mechanism:

- a segmentation head predicts per-frame boundary probabilities seg_prob [B, T];
- the *expected* frame→segment assignment is built by the differentiable
  recursion e_{t+1} = shift(e_t)·c_t + e_t·(1−c_t) (`:205-235`) — a distribution
  over segment ids per frame (lax.scan here);
- training: (a) segment-number loss pulling the expected segment count to the
  transcription word count (`calculate_seg_num_loss:174-203`), (b) a contrastive
  loss aligning expected segment representations with word representations
  (cosine/τ=0.1 InfoNCE on the diagonal, `calculate_expected_ctr_loss:237-281`),
  plus the usual ST/ASR/MT multitask CE;
- inference: hard boundaries (seg_prob > 0.5) drive the read/write policy
  (translate after each detected segment).

The reference builds on convtransformer/wav2vec2 encoders; here the head sits on
the chunk-Conformer S2T backbone (`models/s2t.py`) — the segmentation machinery
is encoder-agnostic.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from streamspeech_tpu.config import DecoderConfig, EncoderConfig
from streamspeech_tpu.models.s2t import S2TConformerModel
from streamspeech_tpu.ops.masks import lengths_to_mask


class DiSegModel(nn.Module):
    encoder_cfg: EncoderConfig
    decoder_cfg: DecoderConfig
    ctc_vocab: int = 0
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = S2TConformerModel(self.encoder_cfg, self.decoder_cfg,
                                          self.ctc_vocab, dtype=self.dtype,
                                          name="backbone")
        self.seg_head = nn.Dense(1, dtype=self.dtype, name="seg_head")

    def __call__(self, src_tokens, src_lengths, prev_output_tokens,
                 chunk_size=None, conv_chunk_size=None, deterministic=True,
                 use_running_stats=True) -> Dict[str, jnp.ndarray]:
        out = self.backbone(src_tokens, src_lengths, prev_output_tokens,
                            chunk_size, conv_chunk_size, deterministic,
                            use_running_stats)
        seg_logits = self.seg_head(out["encoder_out"])[..., 0]
        seg_prob = jax.nn.sigmoid(seg_logits.astype(jnp.float32))
        seg_prob = seg_prob * out["encoder_valid"].astype(seg_prob.dtype)
        out["seg_prob"] = seg_prob
        return out


def expected_speech_seg(seg_prob: jnp.ndarray, seg_num: int) -> jnp.ndarray:
    """[B, T] boundary probs → [B, K=seg_num, T] expected frame→segment soft
    assignment, normalized per segment (`expected_speech_seg:205-235`)."""
    b, t = seg_prob.shape
    e0 = jnp.zeros((b, seg_num)).at[:, 0].set(1.0)

    def body(e, c):
        shifted = jnp.pad(e[:, :-1], ((0, 0), (1, 0)))
        e_next = jnp.clip(shifted * c[:, None] + e * (1 - c[:, None]),
                          1e-4, 1.0)
        return e_next, e_next

    _, rest = jax.lax.scan(body, e0, seg_prob[:, :-1].T)
    cols = jnp.concatenate([e0[None], rest], axis=0)      # [T, B, K]
    m = cols.transpose(1, 2, 0)                            # [B, K, T]
    return m / (jnp.sum(m, axis=-1, keepdims=True) + 1e-4)


def seg_num_loss(seg_prob: jnp.ndarray, word_counts: jnp.ndarray) -> jnp.ndarray:
    """Expected segment count → word count (`calculate_seg_num_loss:174-203`).
    The max-pooled term uses per-sample windows of kernel = floor(T/number)."""
    b, t = seg_prob.shape
    number = jnp.clip(word_counts.astype(jnp.float32) - 1.0, 1.0, 9999.0)
    global_term = jnp.sqrt(
        jnp.sum((jnp.sum(seg_prob, axis=-1) - number) ** 2) + 1e-6)

    idx = jnp.arange(t, dtype=jnp.float32)[None, :]
    kernel = jnp.maximum(jnp.floor(t / number), 1.0)[:, None]
    win = jnp.floor(idx / kernel)                           # [B, T] window id
    win_ids = jnp.arange(t, dtype=jnp.float32)
    onehot = win[:, None, :] == win_ids[None, :, None]      # [B, T_win, T]
    pooled = jnp.max(jnp.where(onehot, seg_prob[:, None, :], -jnp.inf), axis=-1)
    pooled_sum = jnp.sum(jnp.where(jnp.isfinite(pooled), pooled, 0.0), axis=-1)
    pooled_term = jnp.sum(jnp.sqrt(
        (pooled_sum - number) ** 2 * (t / number) + 1e-6))
    return global_term + pooled_term


def segment_word_contrastive_loss(seg_prob: jnp.ndarray,
                                  speech_hidden: jnp.ndarray,
                                  word_hidden: jnp.ndarray,
                                  word_counts: jnp.ndarray,
                                  temperature: float = 0.1) -> jnp.ndarray:
    """InfoNCE between expected segment representations and word representations
    (`calculate_expected_ctr_loss:237-281`): segment k should match word k.

    speech_hidden: [B, T, C] encoder states; word_hidden: [B, K, C] word-level
    text representations (subwords already mean-pooled per word); word_counts [B].
    """
    k = word_hidden.shape[1]
    assign = expected_speech_seg(seg_prob, k)               # [B, K, T]
    seg_repr = jnp.einsum("bkt,btc->bkc", assign.astype(speech_hidden.dtype),
                          speech_hidden)

    def cos(a, bm):
        a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-6)
        bm = bm / (jnp.linalg.norm(bm, axis=-1, keepdims=True) + 1e-6)
        return jnp.einsum("bkc,bwc->bkw", a, bm)

    logits = cos(seg_repr.astype(jnp.float32),
                 word_hidden.astype(jnp.float32)) / temperature
    valid = jnp.arange(k)[None, :] < word_counts[:, None]   # [B, K]
    logits = jnp.where(valid[:, None, :], logits, -1e9)
    lsm = jax.nn.log_softmax(logits, axis=2)
    diag = jnp.diagonal(lsm, axis1=1, axis2=2)              # [B, K]
    return -jnp.sum(jnp.where(valid, diag, 0.0))


def diseg_loss(out: Dict[str, jnp.ndarray], targets: jnp.ndarray,
               word_hidden: jnp.ndarray, word_counts: jnp.ndarray,
               label_smoothing: float = 0.1,
               seg_weight: float = 1.0, ctr_weight: float = 1.0
               ) -> Dict[str, jnp.ndarray]:
    from streamspeech_tpu.models.s2t import s2t_loss

    base = s2t_loss(out, targets, label_smoothing)
    sn = seg_num_loss(out["seg_prob"], word_counts)
    ctr = segment_word_contrastive_loss(out["seg_prob"], out["encoder_out"],
                                        word_hidden, word_counts)
    total = base["loss"] + seg_weight * sn + ctr_weight * ctr
    return dict(base, loss=total, seg_num_loss=sn, contrastive_loss=ctr)


def hard_boundaries(seg_prob: jnp.ndarray, threshold: float = 0.5) -> jnp.ndarray:
    """Inference-time segmentation: frame t ends a segment iff p_t > threshold."""
    return seg_prob > threshold


class DiSegWav2Vec2Model(nn.Module):
    """DiSeg on a raw-audio wav2vec2/HuBERT backbone — the reference's
    convtransformer_wav2vec_seg
    (`researches/diseg/models/convtransformer_wav2vec_seg.py:54`): wav →
    HubertModel features (×320 downsample) → proj → transformer text decoder;
    segmentation head on the encoder states."""

    decoder_cfg: DecoderConfig
    w2v_embed_dim: int = 768
    w2v_ffn_dim: int = 3072
    w2v_heads: int = 12
    w2v_layers: int = 12
    dtype: Any = jnp.float32

    def setup(self):
        from streamspeech_tpu.models.hubert import HubertModel
        from streamspeech_tpu.models.transformer import TransformerDecoder

        self.w2v = HubertModel(self.w2v_embed_dim, self.w2v_ffn_dim,
                               self.w2v_heads, self.w2v_layers,
                               dtype=self.dtype, name="w2v")
        self.proj = nn.Dense(self.decoder_cfg.embed_dim, dtype=self.dtype,
                             name="proj")
        self.decoder = TransformerDecoder(self.decoder_cfg, dtype=self.dtype,
                                          name="decoder")
        self.seg_head = nn.Dense(1, dtype=self.dtype, name="seg_head")

    def __call__(self, wav, wav_lengths, prev_output_tokens,
                 deterministic=True) -> Dict[str, jnp.ndarray]:
        feats = self.w2v.extract_features(wav, output_layer=self.w2v_layers)
        enc = self.proj(feats)
        out_len = jnp.minimum(wav_lengths // 320, enc.shape[1])
        enc_valid = lengths_to_mask(out_len, enc.shape[1])
        logits, _ = self.decoder(prev_output_tokens, enc, enc_valid, None,
                                 deterministic)
        seg_logits = self.seg_head(enc)[..., 0]
        seg_prob = jax.nn.sigmoid(seg_logits.astype(jnp.float32))
        seg_prob = seg_prob * enc_valid.astype(seg_prob.dtype)
        return {"logits": logits, "encoder_out": enc,
                "encoder_valid": enc_valid, "encoder_lengths": out_len,
                "seg_prob": seg_prob}


from streamspeech_tpu.registry import AGENTS


@AGENTS.register("diseg_s2tt")
class DiSegAgent:
    """Boundary-driven simultaneous S2T agent: translate one target token per
    DETECTED segment (seg_prob > threshold), everything at finish — the
    inference policy of `researches/diseg` (segment-synchronous read/write).
    Re-encodes the (bucketed) prefix each policy call like the reference."""

    source_type = "speech"
    target_type = "text"

    def __init__(self, model: DiSegModel, variables, tgt_dict,
                 threshold: float = 0.5, max_len: int = 64, gcmvn=None):
        from streamspeech_tpu.agents.base import AgentStates

        self.model = model
        self.variables = variables
        self.tgt_dict = tgt_dict
        self.threshold = threshold
        self.max_len = max_len
        self.gcmvn = gcmvn
        self.states = AgentStates()

        import functools

        @functools.partial(jax.jit, static_argnames=())
        def forward(variables, feats, n_frames, prev, thr):
            out = model.apply(variables, feats, n_frames, prev,
                              use_running_stats=True)
            n_seg = jnp.sum((out["seg_prob"] > thr)[0].astype(jnp.int32))
            last = out["logits"][0]
            return n_seg, jnp.argmax(last, axis=-1)

        self._forward = forward
        self.reset()

    def reset(self):
        self.states.reset()
        self.hyp: list = []
        self.emitted = 0

    @staticmethod
    def _bucketed(arr, mult, pad_val=0.0):
        import numpy as _np

        n = max(len(arr), 1)
        m = -(-n // mult) * mult
        out = _np.full((m,) + _np.shape(arr)[1:], pad_val,
                       _np.asarray(arr).dtype if len(arr) else _np.float32)
        if len(arr):
            out[:n] = arr
        return out, n

    def policy(self):
        from streamspeech_tpu.agents.base import (ReadAction, TextSegment,
                                                  WriteAction)
        from streamspeech_tpu.ops.fbank import logmelfbank

        finished = self.states.source_finished
        samples = np.asarray(list(self.states.source), np.float32)
        if samples.shape[0] < 400:
            if not finished:
                return ReadAction()
            self.states.target_finished = True
            return WriteAction(TextSegment(content="", finished=True),
                               finished=True)
        feats = np.asarray(logmelfbank(samples))
        if self.gcmvn is not None:
            feats = np.asarray(self.gcmvn(feats))
        padded, n = self._bucketed(feats, 32)
        # decode budget = number of detected segments (all at finish)
        budget = self.max_len if finished else None
        new_text = []
        while True:
            prev = [2] + self.hyp
            pm = -(-len(prev) // 8) * 8
            prev_arr = np.full((1, pm), 1, np.int32)
            prev_arr[0, : len(prev)] = prev
            n_seg, nxt_all = jax.device_get(self._forward(
                self.variables, padded[None], np.asarray([n], np.int32),
                prev_arr, np.float32(self.threshold)))
            allowed = int(n_seg) if not finished else self.max_len
            if len(self.hyp) >= allowed or len(self.hyp) >= self.max_len:
                break
            nxt = int(nxt_all[len(prev) - 1])
            if nxt == 2:  # eos
                break
            self.hyp.append(nxt)
            new_text.append(self.tgt_dict[nxt])
            if not finished:
                break  # one token per newly detected segment per call
        if not new_text and not finished:
            return ReadAction()
        text = " ".join(new_text).replace("▁", " ").strip()
        if finished:
            self.states.target_finished = True
        return WriteAction(TextSegment(content=text, finished=finished),
                           finished=finished)

    def push(self, segment):
        self.states.update_source(segment)

    def pop(self):
        from streamspeech_tpu.agents.base import EmptySegment

        action = self.policy()
        if action.is_read():
            return EmptySegment(finished=self.states.target_finished)
        seg = action.content
        self.states.update_target(seg)
        return seg

    def pushpop(self, segment):
        self.push(segment)
        return self.pop()
