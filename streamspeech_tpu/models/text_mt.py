"""Simultaneous text-to-text MT family: transformer MT with wait-k training.

Role parity with the reference's text-MT baselines (`researches/hmt/`, SURVEY
§2.5): the reference ships the Hidden Markov Transformer (ICLR'23) plus wait-k
sequence generators (`agent/mt/hmt_sequence_generator.py`). This module provides
the transformer text-MT backbone with wait-k cross-attention training
(`hmt` arch `hmt_transformer` shares this backbone; the HMT latent-alignment
forward-algorithm criterion itself is roadmap — see README).

Model: token transformer encoder (bidirectional or unidirectional) + the same
TransformerDecoder used elsewhere, with a wait-k cross-attention mask at train
time and an incremental wait-k agent at inference.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from streamspeech_tpu.config import DecoderConfig
from streamspeech_tpu.models.transformer import (
    PAD,
    TransformerDecoder,
    UniTransformerEncoderWithEmb,
)
from streamspeech_tpu.ops.masks import waitk_allowed


class TextMTModel(nn.Module):
    """Wait-k capable text MT transformer."""

    src_vocab: int
    decoder_cfg: DecoderConfig
    encoder_layers: int = 6
    unidirectional_encoder: bool = True  # required for honest simultaneous MT
    dtype: Any = jnp.float32

    def setup(self):
        d = self.decoder_cfg
        self.encoder = UniTransformerEncoderWithEmb(
            d.embed_dim, d.ffn_embed_dim, d.attention_heads,
            self.encoder_layers, self.src_vocab, d.dropout,
            unidirectional=self.unidirectional_encoder, dtype=self.dtype,
            name="encoder")
        self.decoder = TransformerDecoder(self.decoder_cfg, dtype=self.dtype,
                                          name="decoder")

    def __call__(self, src_tokens, prev_output_tokens, waitk: Optional[int] = None,
                 deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        enc = self.encoder(src_tokens, deterministic)
        enc_valid = src_tokens != PAD
        allowed_cross = None
        if waitk is not None and waitk > 0:
            allowed_cross = waitk_allowed(prev_output_tokens.shape[1],
                                          src_tokens.shape[1],
                                          src_wait=waitk, src_step=1, tgt_step=1)
        logits, feats = self.decoder(prev_output_tokens, enc, enc_valid,
                                     allowed_cross, deterministic)
        return {"logits": logits, "encoder_out": enc}


def text_mt_loss(out, targets, label_smoothing: float = 0.1):
    from streamspeech_tpu.train.criterion import label_smoothed_nll

    valid = targets != PAD
    ce = label_smoothed_nll(out["logits"], targets, valid, label_smoothing)
    return {"loss": ce["loss"], "nll_loss": ce["nll_loss"],
            "sample_size": jnp.maximum(jnp.sum(valid), 1)}


from streamspeech_tpu.registry import AGENTS


@AGENTS.register("waitk_text")
class WaitkTextAgent:
    """Wait-k simultaneous text-MT policy (`agent/mt/*_sequence_generator.py`
    role): after k source tokens, emit one target token per new source token.
    Re-encodes the (short) source prefix each call — exact with a unidirectional
    encoder and trivially cheap for text."""

    source_type = "text"
    target_type = "text"

    def __init__(self, model: TextMTModel, variables, src_dict, tgt_dict,
                 waitk: int = 3, max_len: int = 200):
        from streamspeech_tpu.agents.base import AgentStates

        self.model = model
        self.variables = variables
        self.src_dict = src_dict
        self.tgt_dict = tgt_dict
        self.waitk = waitk
        self.max_len = max_len
        self.states = AgentStates()

        import functools

        @functools.partial(jax.jit, static_argnames=())
        def step(variables, src, prev, prev_len):
            out = model.apply(variables, src, prev)
            last = out["logits"][0, prev_len - 1]
            return jnp.argmax(last, axis=-1)

        self._step = step
        self.reset()

    @staticmethod
    def _pad_bucket(ids, pad=PAD, mult=8):
        import numpy as _np

        n = max(len(ids), 1)
        m = -(-n // mult) * mult
        arr = _np.full((1, m), pad, _np.int32)
        arr[0, :len(ids)] = ids
        return jnp.asarray(arr), n

    def reset(self):
        self.states.reset()
        self.hyp = []

    def policy(self):
        from streamspeech_tpu.agents.base import ReadAction, TextSegment, \
            WriteAction

        src_words = list(self.states.source)
        finished = self.states.source_finished
        n_src = len(src_words)
        if not finished and n_src < self.waitk + len(self.hyp):
            return ReadAction()
        src_ids = [self.src_dict.index(w) for w in src_words] or \
            [self.src_dict.eos()]
        src, _ = self._pad_bucket(src_ids)
        budget = self.max_len if finished else \
            n_src - self.waitk + 1 - len(self.hyp)
        emitted = []
        while budget > 0 and len(self.hyp) < self.max_len:
            prev, n_prev = self._pad_bucket([self.tgt_dict.eos()] + self.hyp)
            nxt = int(self._step(self.variables, src, prev,
                                 jnp.asarray(n_prev, jnp.int32)))
            if nxt == self.tgt_dict.eos():
                break
            self.hyp.append(nxt)
            emitted.append(nxt)
            budget -= 1
            if not finished:
                break  # one token per new source token mid-stream
        text = " ".join(self.tgt_dict[t] for t in emitted)
        done = finished and (budget <= 0 or not emitted or
                             len(self.hyp) >= self.max_len)
        if not emitted and not finished:
            return ReadAction()
        if done:
            self.states.target_finished = True
        return WriteAction(TextSegment(content=text, finished=done),
                           finished=done)

    # GenericAgent protocol
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
