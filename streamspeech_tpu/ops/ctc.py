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

import jax
import jax.numpy as jnp
import numpy as np
import optax


def gather_extended_logprobs(lp: jnp.ndarray, labels: jnp.ndarray,
                             blank_id: int) -> jnp.ndarray:
    """lp_ext[b, t, s] over the blank-interleaved extended label sequence
    [blank, l0, blank, l1, ..., blank], built with a one-hot MATMUL instead
    of ``take_along_axis``: the gather's transpose is a scatter-add whose
    index vector repeats ``blank_id`` N+1 times per row, which XLA lowers to
    a serialized scatter (measured ~150 ms of the B=8 train step's backward
    on the v5e); the einsum form makes both directions MXU matmuls
    (~5 GFLOP at the unit-CTC shapes — microseconds)."""
    b, t, _ = lp.shape
    n = labels.shape[1]
    onehot = jax.nn.one_hot(labels, lp.shape[-1], dtype=lp.dtype)  # [B, N, V]
    lp_lab = jnp.einsum("btv,bnv->btn", lp, onehot)                # [B, T, N]
    lp_blank = lp[:, :, blank_id][..., None]                       # [B, T, 1]
    inter = jnp.stack(
        [jnp.broadcast_to(lp_blank, (b, t, n)), lp_lab],
        axis=-1).reshape(b, t, 2 * n)
    return jnp.concatenate(
        [inter, jnp.broadcast_to(lp_blank, (b, t, 1))], axis=-1)


def gather_extended_logprobs_from_logits(
        logits: jnp.ndarray, labels: jnp.ndarray,
        blank_id: int) -> jnp.ndarray:
    """``gather_extended_logprobs(log_softmax(logits), ...)`` WITHOUT
    materializing the [B, T, V] fp32 log-softmax: the gather selects exactly
    one vocab entry per extended state and ``log_softmax(x) = x -
    logsumexp(x)``, so gather the RAW logits with the same one-hot matmul
    (fp32 MXU accumulation — a 0/1 selection is exact in any float dtype)
    and subtract a fused [B, T] logsumexp afterwards. Saves writing and
    re-reading a 49 MB fp32 buffer per aux head (38.6 MB for the unit head)
    every train step (scripts/analyze_hlo.py); numerically identical to the
    two-step form (same max-subtracted reduction, same subtraction)."""
    b, t, _ = logits.shape
    n = labels.shape[1]
    onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=logits.dtype)
    g_lab = jnp.einsum("btv,bnv->btn", logits, onehot,
                       preferred_element_type=jnp.float32)  # [B, T, N]
    g_blank = logits[:, :, blank_id].astype(jnp.float32)[..., None]
    inter = jnp.stack(
        [jnp.broadcast_to(g_blank, (b, t, n)), g_lab],
        axis=-1).reshape(b, t, 2 * n)
    ext = jnp.concatenate(
        [inter, jnp.broadcast_to(g_blank, (b, t, 1))], axis=-1)
    lse = jax.scipy.special.logsumexp(logits.astype(jnp.float32), axis=-1)
    return ext - lse[:, :, None]


def ctc_neg_log_likelihood(
    logits: jnp.ndarray,        # [B, T, V]
    logit_lengths: jnp.ndarray, # [B]
    labels: jnp.ndarray,        # [B, N]
    label_lengths: jnp.ndarray, # [B]
    blank_id: int,
    unroll: int = 16,
) -> jnp.ndarray:
    """Per-sequence CTC -log p(labels | logits), TPU-tuned.

    Same semantics as ``optax.ctc_loss`` (alpha recursion over the
    blank-interleaved extended label sequence), restructured for the TPU:
    the per-state log-probs for ALL frames are gathered once up front
    ([B, T, 2N+1], one big take_along_axis the MXU-era memory system likes),
    so the sequential scan body is pure elementwise work on [B, 2N+1], and
    the scan is UNROLLED — ``optax.ctc_loss``'s un-unrolled scan runs
    T tiny loop iterations (T=1200 for the x25-upsampled unit CTC).
    Interleaved A/B on the v5e measured the two within noise of each other
    at the full-train-step level (the step is tunnel-upload-bound in this
    dev environment), so the value here is independence from optax's
    internals + the big up-front gather, not a measured step win.
    """
    nneg = -1e30  # effective -inf that survives arithmetic
    b, t, _ = logits.shape
    n = labels.shape[1]
    s = 2 * n + 1

    # states 2i+1 (label i) may skip from 2i-1 (label i-1) iff labels differ
    lbl_prev = jnp.concatenate([jnp.full((b, 1), -1, labels.dtype),
                                labels[:, :-1]], axis=1)
    skip = jnp.zeros((b, s), bool).at[:, 1::2].set(labels != lbl_prev)

    # one matmul-gather for every (frame, state) pair; the scan body then
    # never touches the [B, T, V] tensor (and the full log-softmax is never
    # materialized — see gather_extended_logprobs_from_logits)
    lp_ext = gather_extended_logprobs_from_logits(logits, labels, blank_id)
    frame_valid = jnp.arange(t)[None, :] < logit_lengths[:, None]  # [B, T]

    def lse3(a0, a1, a2):
        m = jnp.maximum(jnp.maximum(a0, a1), a2)
        out = m + jnp.log(jnp.exp(a0 - m) + jnp.exp(a1 - m) +
                          jnp.exp(a2 - m))
        return jnp.where(m <= nneg / 2, nneg, out)

    alpha0 = jnp.full((b, s), nneg).at[:, 0].set(lp_ext[:, 0, 0])
    has_label = label_lengths > 0
    alpha0 = alpha0.at[:, 1].set(
        jnp.where(has_label, lp_ext[:, 0, 1], nneg))

    def step(alpha, xs):
        lp_t, valid_t = xs
        sh1 = jnp.concatenate([jnp.full((b, 1), nneg), alpha[:, :-1]], 1)
        sh2 = jnp.concatenate([jnp.full((b, 2), nneg), alpha[:, :-2]], 1)
        sh2 = jnp.where(skip, sh2, nneg)
        new = lse3(alpha, sh1, sh2) + lp_t
        new = jnp.where(valid_t[:, None], new, alpha)  # padded frame: hold
        return new, None

    alpha, _ = jax.lax.scan(
        step, alpha0,
        (jnp.swapaxes(lp_ext[:, 1:], 0, 1),
         jnp.swapaxes(frame_valid[:, 1:], 0, 1)),
        unroll=min(unroll, max(t - 1, 1)))

    end = 2 * label_lengths  # final blank state
    a_end = jnp.take_along_axis(alpha, end[:, None], axis=1)[:, 0]
    a_last = jnp.take_along_axis(
        alpha, jnp.maximum(end - 1, 0)[:, None], axis=1)[:, 0]
    a_last = jnp.where(has_label, a_last, nneg)
    m = jnp.maximum(a_end, a_last)
    total = m + jnp.log(jnp.exp(a_end - m) + jnp.exp(a_last - m))
    return -total


def ctc_loss_sum(
    logits: jnp.ndarray,        # [B, T, V]
    logit_lengths: jnp.ndarray, # [B]
    labels: jnp.ndarray,        # [B, N] (0-padded per optax convention)
    label_lengths: jnp.ndarray, # [B]
    blank_id: int,
) -> jnp.ndarray:
    import os

    if os.environ.get("STREAMSPEECH_OPTAX_CTC"):
        t = logits.shape[1]
        n = labels.shape[1]
        logit_pad = (jnp.arange(t)[None, :]
                     >= logit_lengths[:, None]).astype(jnp.float32)
        label_pad = (jnp.arange(n)[None, :]
                     >= label_lengths[:, None]).astype(jnp.float32)
        per_seq = optax.ctc_loss(logits.astype(jnp.float32), logit_pad,
                                 labels, label_pad, blank_id=blank_id)
    else:
        from streamspeech_tpu.ops.pallas_ctc import (
            ctc_neg_log_likelihood_pallas,
            pallas_ctc_available,
        )

        if pallas_ctc_available():
            # in-kernel T-loop: the lax.scan DP's per-iteration overhead was
            # ~2/3 of the measured train step (see ops/pallas_ctc.py)
            per_seq = ctc_neg_log_likelihood_pallas(
                logits, logit_lengths, labels, label_lengths, blank_id)
        else:
            per_seq = ctc_neg_log_likelihood(logits, logit_lengths, labels,
                                             label_lengths, blank_id)
    # zero_infinity=True
    per_seq = jnp.where(
        jnp.isfinite(per_seq) & (per_seq < 1e29), per_seq, 0.0)
    return jnp.sum(per_seq)


def ctc_loss_sum_pair(
    logits_a: jnp.ndarray, lengths_a: jnp.ndarray,
    labels_a: jnp.ndarray, label_lengths_a: jnp.ndarray,
    logits_b: jnp.ndarray, lengths_b: jnp.ndarray,
    labels_b: jnp.ndarray, label_lengths_b: jnp.ndarray,
    blank_id: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two CTC sums over the SAME frame axis in ONE DP pass (Pallas path).

    The criterion's aux heads (ASR + ST) both run T=encoder-frames with
    blank=0; batch-concatenating their extended-state tensors halves the
    number of sequential T-loop kernel sweeps. Per-head numerics identical
    to two ``ctc_loss_sum`` calls (rows are independent). Off-TPU (and
    under STREAMSPEECH_OPTAX_CTC) falls back to the separate calls.
    """
    import os

    from streamspeech_tpu.ops.pallas_ctc import (
        ctc_neg_log_likelihood_pallas_multi,
        pallas_ctc_available,
    )

    if pallas_ctc_available() and not os.environ.get("STREAMSPEECH_OPTAX_CTC"):
        nll_a, nll_b = ctc_neg_log_likelihood_pallas_multi(
            [(logits_a, lengths_a, labels_a, label_lengths_a),
             (logits_b, lengths_b, labels_b, label_lengths_b)], blank_id)
        zi = lambda x: jnp.sum(  # noqa: E731  (zero_infinity=True)
            jnp.where(jnp.isfinite(x) & (x < 1e29), x, 0.0))
        return zi(nll_a), zi(nll_b)
    return (ctc_loss_sum(logits_a, lengths_a, labels_a, label_lengths_a,
                         blank_id),
            ctc_loss_sum(logits_b, lengths_b, labels_b, label_lengths_b,
                         blank_id))


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
