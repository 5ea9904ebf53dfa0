"""Pallas fused rel-pos attention kernel vs the XLA reference (interpret mode —
the compiled kernel is additionally validated on TPU; see the numbers in the
module docstring of ops/pallas_attention.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from streamspeech_tpu.ops.masks import chunk_allowed, lengths_to_mask
from streamspeech_tpu.ops.pallas_attention import (
    relpos_attention,
    relpos_attention_reference,
)


def make_inputs(b=2, h=4, t=64, d=16, seed=0):
    rng = np.random.RandomState(seed)
    qu, qv, k, v = (jnp.asarray(rng.randn(b, h, t, d), jnp.float32)
                    for _ in range(4))
    p = jnp.asarray(rng.randn(h, 2 * t - 1, d), jnp.float32)
    return qu, qv, k, v, p


def test_kernel_matches_reference_chunk_mask():
    qu, qv, k, v, p = make_inputs()
    t = qu.shape[2]
    bias = jnp.where(chunk_allowed(t, 8), 0.0, -1e9)[None, None]
    bias = jnp.broadcast_to(bias.astype(jnp.float32), (2, 1, t, t))
    ref = relpos_attention_reference(qu, qv, k, v, p, bias, scale=0.25)
    got = relpos_attention(qu, qv, k, v, p, bias, scale=0.25, block_q=16,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_kernel_matches_reference_padding_mask():
    qu, qv, k, v, p = make_inputs(seed=1)
    b, h, t, d = qu.shape
    key_valid = lengths_to_mask(jnp.array([40, 64]), t)
    bias = jnp.where(key_valid[:, None, None, :], 0.0, -1e9).astype(jnp.float32)
    bias = jnp.broadcast_to(bias, (b, 1, t, t))
    ref = relpos_attention_reference(qu, qv, k, v, p, bias, scale=0.25)
    got = relpos_attention(qu, qv, k, v, p, bias, scale=0.25, block_q=32,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_kernel_block_sizes_agree():
    qu, qv, k, v, p = make_inputs(seed=2, t=48)
    t = 48
    bias = jnp.zeros((2, 1, t, t), jnp.float32)
    a = relpos_attention(qu, qv, k, v, p, bias, scale=0.25, block_q=16,
                         interpret=True)
    b = relpos_attention(qu, qv, k, v, p, bias, scale=0.25, block_q=48,
                         interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
