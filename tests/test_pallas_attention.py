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


def test_dropout_gradients_tpu():
    """Fused attention-prob dropout: forward is deterministic per seed, and
    the Pallas backward regenerates EXACTLY the forward's mask — validated by
    extracting the in-kernel mask with a probe kernel and comparing every
    gradient against XLA autodiff of a reference that applies that same mask.
    TPU-only — Mosaic's PRNG has no interpret lowering."""
    import functools

    import pytest

    if jax.default_backend() != "tpu":
        pytest.skip("in-kernel dropout needs the TPU PRNG")
    from jax.experimental import pallas as pl

    from streamspeech_tpu.ops import pallas_attention as pa

    qu, qv, k, v, p = make_inputs(t=256, d=16, seed=3)
    b, h, t, d = qu.shape
    bq, rate = 128, 0.1
    nq = t // bq
    bias = jnp.zeros((b, 1, t, t), jnp.float32)
    w_pad = -(-(t + bq - 1) // 128) * 128
    p_pad = jnp.pad(p, ((0, 0), (0, (t - bq) + w_pad - p.shape[1]), (0, 0)))
    seed = jnp.array([[1234]], jnp.int32)

    def f(qu_):
        return pa.relpos_attention_trainable(qu_, qv, k, v, p_pad, bias, seed,
                                             0.25, bq, rate)

    o1, o2 = f(qu), f(qu)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    o3 = pa.relpos_attention_trainable(qu, qv, k, v, p_pad, bias,
                                       jnp.array([[99]], jnp.int32), 0.25, bq,
                                       rate)
    assert not np.allclose(np.asarray(o1), np.asarray(o3))
    # rate=0 equals the no-dropout kernel
    o0 = pa.relpos_attention_trainable(qu, qv, k, v, p_pad, bias, seed, 0.25,
                                       bq, 0.0)
    on = pa.relpos_attention_trainable(qu, qv, k, v, p_pad, bias, None, 0.25,
                                       bq)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(on), atol=1e-6)

    # extract the kernel's realized mask with a probe kernel
    def mask_kernel(seed_ref, o_ref):
        keep = pa._dropout_keep(seed_ref[0, 0], pl.program_id(0),
                                pl.program_id(1), pl.program_id(2), (bq, t),
                                rate)
        o_ref[0, 0] = keep.astype(jnp.float32)

    mask = pl.pallas_call(
        mask_kernel, grid=(b, h, nq),
        in_specs=[pl.BlockSpec((1, 1), lambda bb, hh, qq: (0, 0))],
        out_specs=pl.BlockSpec((1, 1, bq, t),
                               lambda bb, hh, qq: (bb, hh, qq, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, t, t), jnp.float32),
    )(seed)
    assert abs(float(mask.mean()) - (1 - rate)) < 0.01

    def ref_f(qu_, qv_, k_, v_, p_):
        ac = jnp.einsum("bhsd,bhtd->bhst", qu_, k_)
        bd_full = jnp.einsum("bhsd,hrd->bhsr", qv_, p_)
        i = jnp.arange(t)[:, None]
        j = jnp.arange(t)[None, :]
        u = (t - 1) - (i - j)
        bd = jnp.take_along_axis(bd_full, u[None, None].repeat(h, 1), axis=-1)
        probs = jax.nn.softmax((ac + bd) * 0.25 + bias, axis=-1)
        return jnp.einsum("bhst,bhtd->bhsd", mask * probs / (1 - rate), v_)

    np.testing.assert_allclose(np.asarray(o1), np.asarray(ref_f(qu, qv, k, v,
                                                                p)), atol=5e-4)
    g = jnp.asarray(np.random.RandomState(0).randn(b, h, t, d), jnp.float32)
    gp = jax.grad(
        lambda *a: jnp.vdot(g, pa.relpos_attention_trainable(
            *a, bias, seed, 0.25, bq, rate)),
        argnums=(0, 1, 2, 3))(qu, qv, k, v, p_pad)
    gr = jax.grad(lambda *a: jnp.vdot(g, ref_f(*a)),
                  argnums=(0, 1, 2, 3))(qu, qv, k, v, p)
    for name, a_, b_ in zip(("dqu", "dqv", "dk", "dv"), gp, gr):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_), atol=5e-4,
                                   err_msg=name)


# ---------------------------------------------------------------------------
# causal masked-attention kernel (the unit decoder's training shape)
# ---------------------------------------------------------------------------


def _masked_inputs(b=2, h=3, t=96, d=16, seed=0, valid_lens=None):
    from streamspeech_tpu.ops.masks import lengths_to_mask

    rng = np.random.RandomState(seed)
    q, k, v = (jnp.asarray(rng.randn(b, h, t, d), jnp.float32)
               for _ in range(3))
    if valid_lens is None:
        valid_lens = [t] * b
    kv = lengths_to_mask(jnp.asarray(valid_lens), t)
    kvb = jnp.where(kv, 0.0, -1e9).astype(jnp.float32)[:, None, :]  # [B,1,T]
    return q, k, v, kvb


def test_masked_kernel_matches_reference_causal():
    from streamspeech_tpu.ops import pallas_attention as pa

    q, k, v, kvb = _masked_inputs(valid_lens=[70, 96])
    ref = pa.masked_attention_reference(q, k, v, kvb, scale=0.25, causal=True)
    got = pa.masked_attention(q, k, v, kvb, scale=0.25, causal=True,
                              block_q=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    # non-causal variant too
    ref2 = pa.masked_attention_reference(q, k, v, kvb, scale=0.25,
                                         causal=False)
    got2 = pa.masked_attention(q, k, v, kvb, scale=0.25, causal=False,
                               block_q=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2), atol=1e-5)


def test_masked_kernel_gradients():
    from streamspeech_tpu.ops import pallas_attention as pa

    old = pa._relpos_bwd.interpret
    pa._relpos_bwd.interpret = True
    try:
        q, k, v, kvb = _masked_inputs(seed=1, valid_lens=[60, 96])
        seed = jnp.zeros((1, 1), jnp.int32)
        g = jnp.asarray(np.random.RandomState(2).randn(*q.shape), jnp.float32)
        gp = jax.grad(
            lambda *a: jnp.vdot(g, pa.masked_attention_trainable(
                *a, kvb, seed, 0.25, True, 32, 0.0)),
            argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(
            lambda *a: jnp.vdot(g, pa.masked_attention_reference(
                *a, kvb, 0.25, causal=True)),
            argnums=(0, 1, 2))(q, k, v)
        for name, a_, b_ in zip("qkv", gp, gr):
            np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                       atol=5e-5, err_msg=name)
    finally:
        pa._relpos_bwd.interpret = old


def test_mha_causal_flag_matches_explicit_mask():
    """MultiHeadAttention(causal=True) on the fallback (CPU) path must equal
    the legacy explicit causal_allowed mask path bit-for-bit — the decoders
    now pass the flag instead of the materialized mask."""
    from streamspeech_tpu.models.layers import MultiHeadAttention
    from streamspeech_tpu.ops.masks import causal_allowed, lengths_to_mask

    rng = np.random.RandomState(3)
    b, s, c = 2, 12, 16
    x = jnp.asarray(rng.randn(b, s, c), jnp.float32)
    key_valid = lengths_to_mask(jnp.array([9, 12]), s)
    mha = MultiHeadAttention(embed_dim=c, num_heads=4)
    vs = mha.init(jax.random.PRNGKey(0), x)
    old, _ = mha.apply(vs, x, None, causal_allowed(s), key_valid)
    new, _ = mha.apply(vs, x, None, None, key_valid, causal=True)
    np.testing.assert_array_equal(np.asarray(old), np.asarray(new))


# ---------------------------------------------------------------------------
# arbitrary-bias cross-attention kernel (the unit decoder's CTC-streaming-mask
# cross-attention at S=1200; VERDICT r4 weak #2 — previously untested)
# ---------------------------------------------------------------------------


def _bias_inputs(b=2, h=3, tq=96, tk=64, d=16, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(b, h, tq, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, tk, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, tk, d), jnp.float32)
    # streaming-like monotone step mask + per-example key-length padding
    allowed = rng.rand(b, tq, tk) < 0.7
    allowed[:, :, 0] = True  # no fully-masked query rows
    allowed[0, :, 48:] = False  # example 0 only sees 48 keys (padding)
    bias = jnp.where(jnp.asarray(allowed), 0.0, -1e9).astype(jnp.float32)
    return q, k, v, bias


def test_bias_kernel_matches_reference():
    from streamspeech_tpu.ops import pallas_attention as pa

    q, k, v, bias = _bias_inputs()
    ref = pa.bias_attention_reference(q, k, v, bias, scale=0.25)
    got = pa.bias_attention(q, k, v, bias, scale=0.25, block_q=32,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_bias_kernel_block_sizes_agree():
    from streamspeech_tpu.ops import pallas_attention as pa

    q, k, v, bias = _bias_inputs(seed=1)
    a = pa.bias_attention(q, k, v, bias, scale=0.25, block_q=16,
                          interpret=True)
    b_ = pa.bias_attention(q, k, v, bias, scale=0.25, block_q=96,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


def test_bias_kernel_gradients():
    """Custom-vjp backward (dq/dk/dv; bias is a constant) vs XLA autodiff of
    the reference — interpret mode, multiple q-blocks so dk/dv accumulation
    across the grid is exercised."""
    from streamspeech_tpu.ops import pallas_attention as pa

    old = pa._relpos_bwd.interpret
    pa._relpos_bwd.interpret = True
    try:
        q, k, v, bias = _bias_inputs(seed=2)
        seed = jnp.zeros((1, 1), jnp.int32)
        g = jnp.asarray(np.random.RandomState(3).randn(*q.shape), jnp.float32)
        gp = jax.grad(
            lambda *a: jnp.vdot(g, pa.bias_attention_trainable(
                *a, bias, seed, 0.25, 32, 0.0)),
            argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(
            lambda *a: jnp.vdot(g, pa.bias_attention_reference(
                *a, bias, 0.25)),
            argnums=(0, 1, 2))(q, k, v)
        for name, a_, b_ in zip("qkv", gp, gr):
            np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                       atol=5e-5, err_msg=name)
    finally:
        pa._relpos_bwd.interpret = old


def test_bias_dropout_tpu():
    """Fused dropout in the bias kernel: deterministic per seed, different
    across seeds, rate=0 == no-dropout. TPU-only (Mosaic PRNG)."""
    import pytest

    if jax.default_backend() != "tpu":
        pytest.skip("in-kernel dropout needs the TPU PRNG")
    from streamspeech_tpu.ops import pallas_attention as pa

    q, k, v, bias = _bias_inputs(tq=256, tk=128, seed=4)
    seed = jnp.array([[77]], jnp.int32)
    f = lambda sd, r: pa.bias_attention_trainable(q, k, v, bias, sd, 0.25,
                                                  128, r)
    o1, o2 = f(seed, 0.1), f(seed, 0.1)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    assert not np.allclose(np.asarray(o1),
                           np.asarray(f(jnp.array([[5]], jnp.int32), 0.1)))
    np.testing.assert_allclose(
        np.asarray(f(seed, 0.0)),
        np.asarray(pa.bias_attention(q, k, v, bias, scale=0.25)), atol=1e-6)


def test_mha_bias_pallas_matches_xla():
    """MultiHeadAttention._bias_pallas (the r4 crash site, layers.py:277) vs
    the explicit XLA _attend path: gates forced on, kernels in interpret mode,
    odd S/T to exercise the 128-tile padding, per-example [B,S,T] streaming
    mask + key_valid, and a batch-1 shared [S,T] mask (broadcast leg)."""
    from streamspeech_tpu.models import layers
    from streamspeech_tpu.ops import pallas_attention as pa
    from streamspeech_tpu.ops.masks import lengths_to_mask

    rng = np.random.RandomState(5)
    b, s, t, c = 2, 37, 20, 16
    xq = jnp.asarray(rng.randn(b, s, c), jnp.float32)
    xkv = jnp.asarray(rng.randn(b, t, c), jnp.float32)
    allowed = rng.rand(b, s, t) < 0.6
    allowed[:, :, 0] = True
    allowed = jnp.asarray(allowed)
    key_valid = lengths_to_mask(jnp.array([15, 20]), t)
    mha = layers.MultiHeadAttention(embed_dim=c, num_heads=4)
    vs = mha.init(jax.random.PRNGKey(0), xq, xkv)
    ref, _ = mha.apply(vs, xq, xkv, allowed, key_valid)

    calls = []
    orig = pa.bias_attention_trainable
    old_ok, old_interp = layers._bias_pallas_ok, pa._relpos_bwd.interpret
    layers._bias_pallas_ok = lambda s_, dh: True
    pa._relpos_bwd.interpret = True
    pa.bias_attention_trainable = lambda *a, **kw: (calls.append(1),
                                                    orig(*a, **kw))[1]
    try:
        got, _ = mha.apply(vs, xq, xkv, allowed, key_valid)
        # shared [S,T] mask (bias batch dim 1 → broadcast inside _bias_pallas)
        shared = jnp.asarray(rng.rand(s, t) < 0.6).at[:, 0].set(True)
        got2, _ = mha.apply(vs, xq, xkv, shared, None)
    finally:
        layers._bias_pallas_ok = old_ok
        pa._relpos_bwd.interpret = old_interp
        pa.bias_attention_trainable = orig
    ref2, _ = mha.apply(vs, xq, xkv, shared, None)
    assert len(calls) == 2, "bias kernel route not taken (vacuous test)"
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2), atol=2e-5)


def test_mha_keyvalid_only_bias_not_routed():
    """A key-valid-only [B,1,1,T] bias must NOT route to the bias kernel
    (ADVICE r4 medium: the S=1 bias would mis-broadcast; XLA materializes no
    [S,T] mask there anyway) — gate requires bias.shape[-2] == s."""
    from streamspeech_tpu.models import layers
    from streamspeech_tpu.ops.masks import lengths_to_mask

    rng = np.random.RandomState(6)
    b, s, t, c = 2, 24, 20, 16
    xq = jnp.asarray(rng.randn(b, s, c), jnp.float32)
    xkv = jnp.asarray(rng.randn(b, t, c), jnp.float32)
    key_valid = lengths_to_mask(jnp.array([15, 20]), t)
    mha = layers.MultiHeadAttention(embed_dim=c, num_heads=4)
    vs = mha.init(jax.random.PRNGKey(0), xq, xkv)
    ref, _ = mha.apply(vs, xq, xkv, None, key_valid)

    old_ok = layers._bias_pallas_ok
    layers._bias_pallas_ok = lambda s_, dh: True
    boom = lambda *a, **kw: (_ for _ in ()).throw(
        AssertionError("key-valid-only bias must not reach _bias_pallas"))
    old_bp = layers.MultiHeadAttention._bias_pallas
    layers.MultiHeadAttention._bias_pallas = boom
    try:
        got, _ = mha.apply(vs, xq, xkv, None, key_valid)
    finally:
        layers._bias_pallas_ok = old_ok
        layers.MultiHeadAttention._bias_pallas = old_bp
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_masked_dropout_tpu():
    """Fused dropout in the masked kernel: deterministic per seed, different
    across seeds, rate=0 == no-dropout. TPU-only (Mosaic PRNG)."""
    import pytest

    if jax.default_backend() != "tpu":
        pytest.skip("in-kernel dropout needs the TPU PRNG")
    from streamspeech_tpu.ops import pallas_attention as pa

    q, k, v, kvb = _masked_inputs(t=256, seed=4)
    seed = jnp.array([[77]], jnp.int32)
    f = lambda sd, r: pa.masked_attention_trainable(q, k, v, kvb, sd, 0.25,
                                                    True, 128, r)
    o1, o2 = f(seed, 0.1), f(seed, 0.1)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    assert not np.allclose(np.asarray(o1),
                           np.asarray(f(jnp.array([[5]], jnp.int32), 0.1)))
    np.testing.assert_allclose(
        np.asarray(f(seed, 0.0)),
        np.asarray(pa.masked_attention(q, k, v, kvb, scale=0.25)), atol=1e-6)
