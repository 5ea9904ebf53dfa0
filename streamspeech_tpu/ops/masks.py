"""Attention mask builders (static-shape, XLA-friendly).

Convention: every helper returns a boolean ``allowed`` array where ``True`` means the
query MAY attend to the key. Attention converts to an additive -inf bias. The reference
builds equivalent masks with torch.arange + -inf fills:
- chunk mask: `researches/chunk_unity/models/s2t_conformer.py:195-213`
- causal (future) mask: `researches/ctc_unity/modules/transformer_encoder.py:80-91`
- wait-k streaming mask: `researches/ctc_unity/modules/transformer_decoder.py:405-411`
- CTC-derived training mask: `researches/ctc_unity/models/streamspeech_model.py:398-415`
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def _iota(n: int) -> jnp.ndarray:
    return jnp.arange(n, dtype=jnp.int32)


def causal_allowed(t: int) -> jnp.ndarray:
    """[t, t] bool; query i may attend keys j <= i."""
    i = _iota(t)[:, None]
    j = _iota(t)[None, :]
    return j <= i


def chunk_allowed(t: int, chunk_size: int) -> jnp.ndarray:
    """[t, t] bool; frame i attends all frames in chunks <= its own.

    Reference (`s2t_conformer.py:195-213`): idx_i = clamp((i//chunk + 1)*chunk, 1, t);
    masked where j >= idx_i.
    """
    chunk_size = max(int(chunk_size), 1)
    i = _iota(t)[:, None]
    j = _iota(t)[None, :]
    idx = jnp.clip((i // chunk_size + 1) * chunk_size, 1, t)
    return j < idx


def waitk_allowed(
    tgt_len: int, src_len: int, src_wait: int, src_step: int, tgt_step: int
) -> jnp.ndarray:
    """[tgt_len, src_len] bool wait-k cross-attention mask.

    Reference (`transformer_decoder.py:405-411`): idx_i = clamp((i//tgt_step + 1) *
    src_step + src_wait, 1, src_len); masked where j >= idx_i. A src_step < 0 means
    "no restriction" (the reference passes n2=-1 → mask allows everything because
    idx goes negative ... clamped to [1, src_len]; we special-case it to all-True).
    """
    concrete = all(isinstance(v, (int,)) for v in (src_wait, src_step, tgt_step))
    if concrete and (src_step < 0 or tgt_step <= 0):
        return jnp.ones((tgt_len, src_len), dtype=bool)
    # src_step/tgt_step may be traced scalars (training samples n2 per batch,
    # `speech_to_speech_ctc_asr_st_criterion.py:136-147`); they are >= 1 there.
    i = _iota(tgt_len)[:, None]
    j = _iota(src_len)[None, :]
    idx = jnp.clip((i // tgt_step + 1) * src_step + src_wait, 1, src_len)
    return j < idx


def streaming_allowed_from_ctc(
    asr_not_blank: jnp.ndarray,
    st_not_blank: jnp.ndarray,
    tgt_len: int,
    src_wait: int,
    src_step: int,
    tgt_step: int,
    chunk_size: Optional[int],
) -> jnp.ndarray:
    """Training-time streaming mask derived from CTC posteriors.

    Reimplements `StreamSpeechModel.build_streaming_mask`
    (`researches/ctc_unity/models/streamspeech_model.py:398-415`): for target position i,
    find the source frame where the cumulative count of ST-CTC non-blank emissions
    reaches (i//tgt_step + 1)*src_step + src_wait, snap to the last ASR-token frame at or
    after it, then round up to the encoder chunk boundary. Returns [B, tgt_len, src_len]
    bool ``allowed`` (True = may attend).

    Args:
      asr_not_blank: [B, src_len] prob the ASR CTC emits a new token at each frame.
      st_not_blank:  [B, src_len] same for the target-text CTC head.
    """
    bsz, src_len = st_not_blank.shape
    i = _iota(tgt_len)[None, :, None]  # [1, tgt, 1]
    idx = (i // tgt_step + 1) * src_step + src_wait
    idx = jnp.clip(idx, 1, src_len)
    cum = jnp.cumsum(st_not_blank, axis=-1)[:, None, :]  # [B, 1, src]
    mask = cum >= idx  # [B, tgt, src]
    tmp2 = mask.astype(jnp.int32) * jnp.round(asr_not_blank)[:, None, :].astype(
        jnp.int32
    )
    tmp2 = tmp2.at[:, :, -1].set(1)
    idx2 = jnp.clip(jnp.argmax(tmp2, axis=-1)[..., None], 1, src_len)
    # NOTE(reference quirk): torch .max returns the FIRST maximal index; with 0/1
    # values argmax gives the first frame where the ST cumsum threshold is met AND
    # the ASR head emits a token. jnp.argmax matches.
    if chunk_size is not None:
        idx2 = jnp.clip((idx2 // chunk_size + 1) * chunk_size, 1, src_len)
    j = _iota(src_len)[None, None, :]
    return j < idx2


def lengths_to_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """[B, max_len] bool; True where the position is VALID (inverse of fairseq's
    lengths_to_padding_mask)."""
    return _iota(max_len)[None, :] < lengths[:, None]


def allowed_to_bias(allowed: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Convert a boolean allowed-mask into an additive attention bias."""
    return jnp.where(allowed, jnp.zeros((), dtype), jnp.full((), -jnp.inf, dtype))
