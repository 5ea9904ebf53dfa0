"""Training criterion: unit CTC + multitask (CE + aux CTC) losses.

Behavioral reference `researches/ctc_unity/criterions/speech_to_speech_ctc_asr_st_criterion.py:70-232`
+ `fairseq/fairseq/criterions/speech_to_speech_criterion.py:29-110`:

  total = unit_ctc(unit logits, target units; blank = last, zero_infinity, sum)
        + 8.0 * label-smoothed CE (MT decoder ↔ target_unigram)
        + 4.0 * CTC (ASR head ↔ source_unigram transcript; blank = 0)
        + 4.0 * CTC (ST head ↔ ctc_target_unigram text; blank = 0)

Weights come from the multitask YAML (`configs/fr-en/config_mtl_asr_st_ctcst.yaml`).
The loss is a pure jittable function of (params, batch, rngs) — the reference's
mutable criterion-object protocol collapses into this plus host-side sampling of
the multichunk/chunk/n2 randomization (which arrive as step arguments).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from streamspeech_tpu.ops.ctc import ctc_loss_sum, ctc_loss_sum_pair


def label_smoothed_nll(
    logits: jnp.ndarray,   # [B, S, V]
    targets: jnp.ndarray,  # [B, S]
    valid: jnp.ndarray,    # [B, S] bool
    epsilon: float,
) -> Dict[str, jnp.ndarray]:
    """fairseq label_smoothed_nll_loss semantics (sum reduction over valid)."""
    lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(lprobs, targets[..., None], axis=-1)[..., 0]
    smooth = -jnp.sum(lprobs, axis=-1)
    v = valid.astype(jnp.float32)
    eps_i = epsilon / (logits.shape[-1] - 1)
    loss = (1.0 - epsilon - eps_i) * nll + eps_i * smooth
    return {"loss": jnp.sum(loss * v), "nll_loss": jnp.sum(nll * v)}


@dataclass(frozen=True)
class CriterionWeights:
    target_unigram: float = 8.0
    source_unigram: float = 4.0
    ctc_target_unigram: float = 4.0
    label_smoothing: float = 0.1
    # main-pass unit CTC weight; the reference has no knob for it (always on,
    # `speech_to_speech_ctc_asr_st_criterion.py:223-232`). Kept here so a
    # weight of exactly 0.0 STATICALLY drops the term from the traced program
    # (XLA cannot DCE `0.0 * ctc` under IEEE semantics because 0*inf=nan) —
    # used by scripts/profile_train.py's per-component ablation.
    unit_ctc: float = 1.0
    # profiling-only: keep the unit decoder branch live but replace the CTC
    # DP with a trivial surrogate (mean |logit|) — isolates the DP kernel's
    # cost from the decoder stack's in scripts/profile_train.py. Never set
    # in training.
    unit_surrogate: bool = False


def streamspeech_loss(
    out: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    unit_blank: int,
    weights: CriterionWeights = CriterionWeights(),
) -> Dict[str, jnp.ndarray]:
    """out = StreamSpeechModel forward dict; batch carries:
    target_units [B, N] / target_unit_lengths [B]
    mt_targets [B, S] / (valid from != PAD)
    src_text [B, Ns] / src_text_lengths (source_unigram transcript)
    tgt_text [B, Nt] / tgt_text_lengths (ctc_target_unigram text)
    """
    zero = jnp.zeros((), jnp.float32)

    # main second-pass loss: CTC over upsampled unit logits
    if weights.unit_ctc != 0.0:
        unit_logits = out["unit_logits"]
        up_valid = jnp.repeat(
            out["mt_valid"],
            unit_logits.shape[1] // out["mt_valid"].shape[1], axis=1)
        unit_input_lengths = jnp.sum(up_valid, axis=-1)
        # NB: ctc_loss_sum applies log_softmax internally (all three backends
        # — scan, Pallas, optax — take raw logits); passing logits straight
        # through avoids a duplicated [B, T, V] log_softmax fwd+bwd per head
        # (idempotent, so numerics are unchanged)
        if weights.unit_surrogate:
            unit_loss = jnp.sum(jnp.abs(unit_logits.astype(jnp.float32))) * 1e-6
        else:
            unit_loss = ctc_loss_sum(
                unit_logits, unit_input_lengths, batch["target_units"],
                batch["target_unit_lengths"], blank_id=unit_blank)
    else:
        unit_loss = zero

    # first-pass MT CE (label-smoothed)
    mt_valid = batch["mt_targets"] != 1
    if weights.target_unigram != 0.0:
        ce = label_smoothed_nll(out["mt_logits"], batch["mt_targets"],
                                mt_valid, weights.label_smoothing)
    else:
        ce = {"loss": zero, "nll_loss": zero}

    # aux CTC heads over encoder frames (blank = 0)
    if weights.source_unigram != 0.0 or weights.ctc_target_unigram != 0.0:
        enc_lengths = out["encoder_lengths"]
        # fused on the Pallas path: one DP kernel sweep over both heads (they
        # share the encoder frame axis and blank=0)
        asr_loss, st_loss = ctc_loss_sum_pair(
            out["asr_logits"], enc_lengths, batch["src_text"],
            batch["src_text_lengths"],
            out["st_logits"], enc_lengths, batch["tgt_text"],
            batch["tgt_text_lengths"], blank_id=0)
    else:
        asr_loss, st_loss = zero, zero

    total = (weights.unit_ctc * unit_loss
             + weights.target_unigram * ce["loss"]
             + weights.source_unigram * asr_loss
             + weights.ctc_target_unigram * st_loss)
    sample_size = jnp.maximum(jnp.sum(batch["target_unit_lengths"]), 1)
    return {
        "loss": total,
        "unit_ctc_loss": unit_loss,
        "mt_loss": ce["loss"],
        "mt_nll_loss": ce["nll_loss"],
        "asr_ctc_loss": asr_loss,
        "st_ctc_loss": st_loss,
        "sample_size": sample_size,
        "mt_ntokens": jnp.sum(mt_valid),
    }
