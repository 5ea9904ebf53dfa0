"""Monotonic expected-alignment op vs a direct numpy port of the reference C++.

Reference: fairseq/examples/operators/alignment_train_cpu.cpp:80-153.
"""

import numpy as np

import jax
import jax.numpy as jnp

from streamspeech_tpu.ops.monotonic import (
    expected_alignment_from_p_choose,
    expected_soft_attention,
    exclusive_cumprod,
)


def _alignment_numpy(p_choose, eps):
    """Line-faithful port of alignmentTrainCPUImpl (alignment_train_cpu.cpp)."""
    B, T, S = p_choose.shape
    cumprod_1mp = np.ones_like(p_choose)
    for b in range(B):
        for t in range(T):
            prod = 1.0
            for s in range(S):
                cumprod_1mp[b, t, s] = prod
                prod *= 1.0 - p_choose[b, t, s]
    clamp = np.clip(cumprod_1mp, eps, 1.0)
    alpha = np.zeros_like(p_choose)
    init = np.zeros((B, S), p_choose.dtype)
    init[:, 0] = 1.0
    for t in range(T):
        prev = init if t == 0 else alpha[:, t - 1]
        for b in range(B):
            scan = 0.0
            for s in range(S):
                scan += prev[b, s] / clamp[b, t, s]
                alpha[b, t, s] = min(max(
                    scan * p_choose[b, t, s] * cumprod_1mp[b, t, s], 0.0), 1.0)
    return alpha


def test_exclusive_cumprod():
    x = jnp.asarray([[2.0, 3.0, 4.0]])
    np.testing.assert_allclose(np.asarray(exclusive_cumprod(x)),
                               [[1.0, 2.0, 6.0]])


def test_alignment_matches_reference_loop():
    rng = np.random.RandomState(0)
    p = rng.uniform(0.05, 0.95, (3, 6, 9)).astype(np.float32)
    want = _alignment_numpy(p, 1e-6)
    got = np.asarray(expected_alignment_from_p_choose(jnp.asarray(p)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_alignment_hard_p_choose_is_monotonic_path():
    # deterministic p_choose (0/1) -> alpha is a monotonic one-hot path
    p = np.zeros((1, 3, 5), np.float32)
    p[0, 0, 1] = 1.0  # first target reads src 0,1 then selects 1
    p[0, 1, 3] = 1.0
    p[0, 2, 3] = 1.0  # stays on src 3
    alpha = np.asarray(expected_alignment_from_p_choose(jnp.asarray(p)))
    assert alpha[0, 0].argmax() == 1 and alpha[0, 0].sum() == 1.0
    assert alpha[0, 1].argmax() == 3 and alpha[0, 1].sum() == 1.0
    assert alpha[0, 2].argmax() == 3


def test_alignment_rows_are_subprobability():
    rng = np.random.RandomState(1)
    p = rng.uniform(0.0, 1.0, (4, 8, 12)).astype(np.float32)
    alpha = np.asarray(expected_alignment_from_p_choose(jnp.asarray(p)))
    sums = alpha.sum(-1)
    assert (sums <= 1.0 + 1e-5).all() and (alpha >= 0).all()


def test_alignment_differentiable():
    rng = np.random.RandomState(2)
    p = jnp.asarray(rng.uniform(0.1, 0.9, (2, 4, 6)), jnp.float32)

    def loss(p):
        return expected_alignment_from_p_choose(p).sum()

    g = jax.grad(loss)(p)
    assert bool(jnp.isfinite(g).all())
    # finite-difference check one coordinate
    e = 1e-3
    bump = p.at[0, 1, 2].add(e)
    fd = (loss(bump) - loss(p)) / e
    np.testing.assert_allclose(float(g[0, 1, 2]), float(fd), atol=5e-2)


def test_soft_attention_normalized_rows():
    rng = np.random.RandomState(3)
    p = jnp.asarray(rng.uniform(0.05, 0.95, (2, 5, 7)), jnp.float32)
    u = jnp.asarray(rng.randn(2, 5, 7), jnp.float32)
    alpha = expected_alignment_from_p_choose(p)
    beta = np.asarray(expected_soft_attention(alpha, u))
    # beta rows carry (approximately) the same mass as alpha rows
    np.testing.assert_allclose(beta.sum(-1), np.asarray(alpha).sum(-1),
                               atol=1e-4)
    assert (beta >= 0).all()
