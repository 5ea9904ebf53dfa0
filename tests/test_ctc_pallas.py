"""Pallas CTC kernel parity (interpret mode on CPU) vs the scan path and
optax — values and gradients, incl. padded frames, repeated labels, empty
labels, impossible alignments, and non-tile shapes (pad orchestration)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from streamspeech_tpu.ops.ctc import ctc_neg_log_likelihood
from streamspeech_tpu.ops.pallas_ctc import ctc_neg_log_likelihood_pallas


def random_case(seed, b=3, t=20, v=7, n=6, blank=6):
    rng = np.random.RandomState(seed)
    logits = rng.randn(b, t, v).astype(np.float32) * 2.0
    logit_lengths = rng.randint(t // 2, t + 1, size=(b,)).astype(np.int32)
    labels = rng.randint(0, v - 1, size=(b, n)).astype(np.int32)
    label_lengths = rng.randint(1, n + 1, size=(b,)).astype(np.int32)
    return logits, logit_lengths, labels, label_lengths, blank


@pytest.mark.parametrize("seed,shape", [
    (0, dict()),                                    # defaults, b=3 (pads to 8)
    (1, dict(b=8, t=40, v=11, n=9, blank=10)),
    (2, dict(b=2, t=130, v=5, n=3, blank=4)),       # t > one 8-row block
    (3, dict(b=9, t=16, v=6, n=4, blank=0)),        # blank=0, b pads to 16
])
def test_pallas_matches_scan(seed, shape):
    case = random_case(seed, **shape)
    args = [*map(jnp.asarray, case[:-1])]
    ours = ctc_neg_log_likelihood_pallas(*args, blank_id=case[-1],
                                         interpret=True)
    ref = ctc_neg_log_likelihood(*args, blank_id=case[-1])
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pallas_grad_matches_scan():
    logits, logit_lengths, labels, label_lengths, blank = random_case(
        7, b=4, t=24, v=9, n=7, blank=8)

    def f(path):
        def loss(lg):
            nll = path(lg, jnp.asarray(logit_lengths), jnp.asarray(labels),
                       jnp.asarray(label_lengths), blank)
            return jnp.sum(nll)
        return jax.value_and_grad(loss)(jnp.asarray(logits))

    v_ref, g_ref = f(lambda *a, **k: ctc_neg_log_likelihood(*a, **k))
    v_pl, g_pl = f(lambda *a, **k: ctc_neg_log_likelihood_pallas(
        *a, interpret=True, **k))
    np.testing.assert_allclose(float(v_pl), float(v_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-5)


def test_pallas_repeated_and_empty_labels():
    blank = 4
    logits = np.random.RandomState(5).randn(2, 12, 5).astype(np.float32)
    labels = np.array([[2, 2, 2], [1, 3, 1]], np.int32)
    for ll in ([3, 3], [0, 2], [1, 0]):
        case = (jnp.asarray(logits), jnp.asarray([12, 9], np.int32),
                jnp.asarray(labels), jnp.asarray(ll, np.int32))
        ours = ctc_neg_log_likelihood_pallas(*case, blank_id=blank,
                                             interpret=True)
        ref = ctc_neg_log_likelihood(*case, blank_id=blank)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_pallas_impossible_alignment_zero_grad():
    """More labels than frames: nll is ~inf (NNEG magnitude) and the grad is
    exactly zero (zero_infinity semantics live one level up in ctc_loss_sum)."""
    blank = 4
    rng = np.random.RandomState(3)
    logits = jnp.asarray(rng.randn(1, 4, 5).astype(np.float32))
    labels = jnp.asarray([[1, 1, 1, 1]], jnp.int32)

    def loss(lg):
        return jnp.sum(ctc_neg_log_likelihood_pallas(
            lg, jnp.asarray([4], jnp.int32), labels,
            jnp.asarray([4], jnp.int32), blank, interpret=True))

    v, g = jax.value_and_grad(loss)(logits)
    assert float(v) > 1e29
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=0.0)


def test_pallas_multi_head_matches_separate():
    """Batch-concatenated two-head DP (the criterion's fused ASR+ST aux
    CTCs) must match per-head separate calls — values AND grads — with
    different vocab/label sizes per head and a shared frame axis."""
    from streamspeech_tpu.ops.pallas_ctc import (
        ctc_neg_log_likelihood_pallas_multi,
    )

    a = random_case(21, b=3, t=20, v=9, n=7, blank=0)
    bcase = random_case(22, b=3, t=20, v=5, n=3, blank=0)

    def heads(lg_a, lg_b):
        return [(lg_a, jnp.asarray(a[1]), jnp.asarray(a[2]),
                 jnp.asarray(a[3])),
                (lg_b, jnp.asarray(bcase[1]), jnp.asarray(bcase[2]),
                 jnp.asarray(bcase[3]))]

    def merged(lg_a, lg_b):
        na, nb = ctc_neg_log_likelihood_pallas_multi(
            heads(lg_a, lg_b), blank_id=0, interpret=True)
        return jnp.sum(na) + 2.0 * jnp.sum(nb)

    def separate(lg_a, lg_b):
        na = ctc_neg_log_likelihood_pallas(
            lg_a, jnp.asarray(a[1]), jnp.asarray(a[2]), jnp.asarray(a[3]),
            0, interpret=True)
        nb = ctc_neg_log_likelihood_pallas(
            lg_b, jnp.asarray(bcase[1]), jnp.asarray(bcase[2]),
            jnp.asarray(bcase[3]), 0, interpret=True)
        return jnp.sum(na) + 2.0 * jnp.sum(nb)

    lg_a, lg_b = jnp.asarray(a[0]), jnp.asarray(bcase[0])
    v_m, (ga_m, gb_m) = jax.value_and_grad(merged, argnums=(0, 1))(lg_a, lg_b)
    v_s, (ga_s, gb_s) = jax.value_and_grad(separate, argnums=(0, 1))(lg_a,
                                                                     lg_b)
    np.testing.assert_allclose(float(v_m), float(v_s), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ga_m), np.asarray(ga_s),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gb_m), np.asarray(gb_s),
                               rtol=2e-4, atol=2e-5)


def test_pallas_multi_head_rejects_mismatched_frames():
    from streamspeech_tpu.ops.pallas_ctc import (
        ctc_neg_log_likelihood_pallas_multi,
    )

    a = random_case(30, b=2, t=16, v=5, n=3, blank=0)
    bcase = random_case(31, b=2, t=24, v=5, n=3, blank=0)
    with pytest.raises(ValueError):
        ctc_neg_log_likelihood_pallas_multi(
            [tuple(map(jnp.asarray, a[:-1])),
             tuple(map(jnp.asarray, bcase[:-1]))], blank_id=0,
            interpret=True)


def test_pallas_grad_matches_torch_occupancy():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    logits, logit_lengths, labels, label_lengths, blank = random_case(
        11, b=4, t=24, v=9, n=7, blank=8)
    lt = torch.tensor(logits, requires_grad=True)
    logp = F.log_softmax(lt, dim=-1).transpose(0, 1)
    tgt = torch.tensor(np.concatenate(
        [labels[i, :label_lengths[i]] for i in range(len(labels))]
    ).astype(np.int64))
    t_loss = F.ctc_loss(logp, tgt, torch.tensor(logit_lengths),
                        torch.tensor(label_lengths), blank=blank,
                        reduction="sum", zero_infinity=True)
    t_loss.backward()

    def loss(lg):
        return jnp.sum(ctc_neg_log_likelihood_pallas(
            lg, jnp.asarray(logit_lengths), jnp.asarray(labels),
            jnp.asarray(label_lengths), blank, interpret=True))

    v, g = jax.value_and_grad(loss)(jnp.asarray(logits))
    np.testing.assert_allclose(float(v), float(t_loss.detach()), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g), lt.grad.numpy(),
                               rtol=2e-3, atol=2e-4)
