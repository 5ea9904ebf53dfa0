"""Parity of the TPU-tuned unrolled CTC loss against optax and torch.

The train criterion's CTC follows the reference's `F.ctc_loss(...,
reduction='sum', zero_infinity=True)` semantics
(`researches/ctc_unity/criterions/speech_to_speech_ctc_asr_st_criterion.py:223-232`).
The custom implementation exists because optax.ctc_loss's un-unrolled scan
dispatches T tiny kernels (T=1200 for the x25-upsampled unit CTC) and
dominated the measured train step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from streamspeech_tpu.ops.ctc import ctc_loss_sum, ctc_neg_log_likelihood


def random_case(seed, b=3, t=20, v=7, n=6, blank=6):
    rng = np.random.RandomState(seed)
    logits = rng.randn(b, t, v).astype(np.float32) * 2.0
    logit_lengths = rng.randint(t // 2, t + 1, size=(b,)).astype(np.int32)
    labels = rng.randint(0, v - 1, size=(b, n)).astype(np.int32)
    label_lengths = rng.randint(1, n + 1, size=(b,)).astype(np.int32)
    return logits, logit_lengths, labels, label_lengths, blank


def optax_per_seq(logits, logit_lengths, labels, label_lengths, blank):
    t, n = logits.shape[1], labels.shape[1]
    logit_pad = (np.arange(t)[None] >= logit_lengths[:, None]).astype(
        np.float32)
    label_pad = (np.arange(n)[None] >= label_lengths[:, None]).astype(
        np.float32)
    return optax.ctc_loss(jnp.asarray(logits), jnp.asarray(logit_pad),
                          jnp.asarray(labels), jnp.asarray(label_pad),
                          blank_id=blank)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_matches_optax(seed):
    case = random_case(seed)
    ours = ctc_neg_log_likelihood(*map(jnp.asarray, case[:-1]),
                                  blank_id=case[-1])
    ref = optax_per_seq(*case)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_matches_torch_values_and_grads():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    logits, logit_lengths, labels, label_lengths, blank = random_case(
        11, b=4, t=24, v=9, n=7, blank=8)

    # torch wants [T, B, V] log-probs and flat targets
    lt = torch.tensor(logits, requires_grad=True)
    logp = F.log_softmax(lt, dim=-1).transpose(0, 1)
    tgt = torch.tensor(
        np.concatenate([labels[i, :label_lengths[i]]
                        for i in range(len(labels))]).astype(np.int64))
    t_loss = F.ctc_loss(logp, tgt, torch.tensor(logit_lengths),
                        torch.tensor(label_lengths), blank=blank,
                        reduction="sum", zero_infinity=True)
    t_loss.backward()

    f = jax.jit(lambda lg: ctc_loss_sum(
        lg, jnp.asarray(logit_lengths), jnp.asarray(labels),
        jnp.asarray(label_lengths), blank))
    ours, ours_grad = jax.value_and_grad(f)(jnp.asarray(logits))

    np.testing.assert_allclose(float(ours), float(t_loss), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ours_grad), lt.grad.numpy(),
                               rtol=2e-3, atol=2e-4)


def test_repeated_labels_and_unit_length():
    """Repeated labels force the no-skip transition; label_length=1 and
    full-length labels exercise the final-state gather edges."""
    blank = 4
    logits = np.random.RandomState(5).randn(2, 12, 5).astype(np.float32)
    labels = np.array([[2, 2, 2], [1, 3, 1]], np.int32)
    for ll in ([3, 3], [1, 2], [2, 1]):
        case = (logits, np.array([12, 9], np.int32), labels,
                np.array(ll, np.int32))
        ours = ctc_neg_log_likelihood(*map(jnp.asarray, case), blank_id=blank)
        ref = optax_per_seq(*case, blank)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_impossible_alignment_zeroed_in_sum():
    """Labels longer than frames allow no alignment: per-seq loss is inf and
    the fairseq zero_infinity semantics zero it inside ctc_loss_sum."""
    blank = 4
    rng = np.random.RandomState(3)
    logits = jnp.asarray(rng.randn(1, 4, 5).astype(np.float32))
    labels = jnp.asarray([[1, 1, 1, 1]], jnp.int32)  # needs >= 2*4-1 frames
    total = ctc_loss_sum(logits, jnp.asarray([4], jnp.int32), labels,
                         jnp.asarray([4], jnp.int32), blank)
    assert float(total) == 0.0


def test_grad_matches_optax():
    case = random_case(21, b=2, t=16, v=6, n=5, blank=5)
    logits, logit_lengths, labels, label_lengths, blank = case

    g_ours = jax.grad(lambda lg: jnp.sum(ctc_neg_log_likelihood(
        lg, jnp.asarray(logit_lengths), jnp.asarray(labels),
        jnp.asarray(label_lengths), blank)))(jnp.asarray(logits))
    g_ref = jax.grad(lambda lg: jnp.sum(optax.ctc_loss(
        lg,
        jnp.asarray((np.arange(16)[None] >= logit_lengths[:, None])
                    .astype(np.float32)),
        jnp.asarray(labels),
        jnp.asarray((np.arange(5)[None] >= label_lengths[:, None])
                    .astype(np.float32)),
        blank_id=blank)))(jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-5)


def test_logits_space_gather_matches_two_step_form():
    """gather_extended_logprobs_from_logits (raw-logits gather + fused
    logsumexp; avoids materializing the [B,T,V] fp32 log-softmax) must match
    gather_extended_logprobs(log_softmax(logits)) in VALUE and GRADIENT to
    float-associativity tolerance, for fp32 and bf16 logits. The two forms
    differ only by (x - max) - L vs x - (max + L) grouping — ~1 ulp — which
    is enough to decohere a 2000-step training trajectory (the learnability
    golden's healthy-run spread, docs/golden_learnability.md) but must never
    be a bias."""
    from streamspeech_tpu.ops.ctc import (
        gather_extended_logprobs,
        gather_extended_logprobs_from_logits,
    )

    rng = np.random.RandomState(0)
    b, t, v, n, blank = 3, 12, 17, 5, 0
    labels = jnp.asarray(rng.randint(1, v, size=(b, n)).astype(np.int32))
    for dtype in (jnp.float32, jnp.bfloat16):
        logits = jnp.asarray(rng.randn(b, t, v).astype(np.float32) * 3.0,
                             dtype=dtype)

        def two_step(lg):
            lp = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
            return gather_extended_logprobs(lp, labels, blank)

        def fused(lg):
            return gather_extended_logprobs_from_logits(lg, labels, blank)

        va = two_step(logits)
        vb = fused(logits)
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                                   rtol=0, atol=1e-5)
        ga = jax.grad(lambda lg: jnp.sum(two_step(lg)).astype(jnp.float32))(
            logits)
        gb = jax.grad(lambda lg: jnp.sum(fused(lg)).astype(jnp.float32))(
            logits)
        # grads w.r.t. bf16 logits are themselves bf16 (eps ~ 7.8e-3): the
        # two forms round intermediate products differently, so the bound is
        # a few bf16 ulps, not fp32-tight
        tol = 1e-5 if dtype == jnp.float32 else 3e-2
        np.testing.assert_allclose(np.asarray(ga, np.float32),
                                   np.asarray(gb, np.float32),
                                   rtol=tol, atol=tol)
