"""CTC loss + greedy decoding utilities.

Loss: optax.ctc_loss (per-sequence negative log-likelihood) with fairseq semantics
(`researches/ctc_unity/criterions/speech_to_speech_ctc_asr_st_criterion.py:223-232`:
reduction='sum', zero_infinity=True — infinite losses from too-short inputs zeroed).

Greedy decode + collapse (`agent/ctc_decoder.py:30-111`): argmax per frame, remove
repeats then blanks; also returns the frame index of each surviving token (the
streaming policy keys off those indices).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
import optax


def ctc_loss_sum(
    logits: jnp.ndarray,        # [B, T, V]
    logit_lengths: jnp.ndarray, # [B]
    labels: jnp.ndarray,        # [B, N] (0-padded per optax convention)
    label_lengths: jnp.ndarray, # [B]
    blank_id: int,
) -> jnp.ndarray:
    t = logits.shape[1]
    n = labels.shape[1]
    logit_pad = (jnp.arange(t)[None, :] >= logit_lengths[:, None]).astype(jnp.float32)
    label_pad = (jnp.arange(n)[None, :] >= label_lengths[:, None]).astype(jnp.float32)
    per_seq = optax.ctc_loss(logits.astype(jnp.float32), logit_pad, labels,
                             label_pad, blank_id=blank_id)
    # zero_infinity=True
    per_seq = jnp.where(jnp.isfinite(per_seq), per_seq, 0.0)
    return jnp.sum(per_seq)


def ctc_greedy(logits: jnp.ndarray) -> jnp.ndarray:
    """[.., T, V] → argmax token ids [.., T] (device-side)."""
    return jnp.argmax(logits, axis=-1)


def ctc_collapse(
    ids: np.ndarray, blank: int, pad: Optional[int] = None
) -> Tuple[List[int], List[int]]:
    """Host-side collapse of a greedy CTC path.

    Returns (tokens, frame_indices): repeats removed (keeping the FIRST frame of a
    run, matching `agent/ctc_decoder.py:67-89`), then blanks removed.
    """
    tokens: List[int] = []
    index: List[int] = []
    prev = None
    for t, i in enumerate(np.asarray(ids).tolist()):
        if i != prev:
            prev = i
            if i != blank and (pad is None or i != pad):
                tokens.append(i)
                index.append(t)
    return tokens, index


def ctc_collapse_device(ids: jnp.ndarray, blank: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device-side collapse with static shapes: returns (tokens [T], count).

    tokens is left-packed with trailing `blank` fill; count = number of valid
    tokens. Useful inside jitted policy steps to avoid host sync.
    """
    t = ids.shape[-1]
    prev = jnp.concatenate([jnp.full(ids.shape[:-1] + (1,), -1, ids.dtype),
                            ids[..., :-1]], axis=-1)
    keep = (ids != prev) & (ids != blank)
    # left-pack via sort over (position of kept, large otherwise)
    order = jnp.where(keep, jnp.arange(t), t + jnp.arange(t))
    perm = jnp.argsort(order, axis=-1)
    packed = jnp.take_along_axis(ids, perm, axis=-1)
    count = jnp.sum(keep, axis=-1)
    packed = jnp.where(jnp.arange(t) < count[..., None] if packed.ndim > 1
                       else jnp.arange(t) < count, packed, blank)
    return packed, count
