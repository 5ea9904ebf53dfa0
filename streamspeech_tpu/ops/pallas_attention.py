"""Pallas TPU kernel: fused relative-position (Transformer-XL/espnet) attention.

Motivation: the XLA path of RelPosMultiHeadAttention materializes the position
score tensor bd_full [B, H, T, 2T-1] in HBM before the band gather — at the
training shapes (T≈1500, 12 layers) that is hundreds of MB of HBM traffic per
step. This kernel keeps everything in VMEM per (batch, head, q-block):

  ac   = (q + u) @ K^T                       [BQ, T]     (MXU)
  band = (q + v) @ P_slice^T                 [BQ, T+BQ-1](MXU)
  bd   = band-shift(band)                    [BQ, T]     (pure reshapes)
  out  = softmax((ac + bd) * scale + bias) @ V           (MXU)

The band shift is a diagonal shear done with tpu.dynamic_rotate (pltpu.roll
with a per-row stride).

Numerics match ops/..RelPosMultiHeadAttention to fp32 rounding (tested in
interpret mode on CPU and compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _dropout_keep(seed_val, bb, hh, qi, shape, rate: float):
    """Deterministic in-kernel dropout mask: seeding from (seed, b, h, q-block)
    makes forward and backward regenerate the SAME mask without saving a
    [B,H,T,T] residual (the whole point of the fused kernel). The coordinates
    are folded into one scalar with odd 32-bit mixing constants (this Mosaic
    version rejects multi-operand prng_seed; int32 products wrap). TPU-only —
    the PRNG has no interpret-mode lowering."""
    mix = (seed_val + bb * (-1640531527)        # 0x9E3779B9
           + hh * (-2045698063)                 # 0x860DF7F1
           + qi * (-1028477379))                # 0xC2B2AE3D
    pltpu.prng_seed(mix)
    bits = pltpu.prng_random_bits(shape)
    u = jax.lax.shift_right_logical(bits, 8).astype(jnp.float32) * (
        1.0 / (1 << 24))
    return u >= rate


def _kernel(qu_ref, qv_ref, k_ref, v_ref, p_ref, bias_ref, seed_ref, out_ref,
            *, scale: float, bq: int, t: int, dropout_rate: float):
    qi = pl.program_id(2)
    qu = qu_ref[0, 0]            # [BQ, D]
    qv = qv_ref[0, 0]
    k = k_ref[0, 0]              # [T, D]
    v = v_ref[0, 0]

    ac = jnp.dot(qu, k.T, preferred_element_type=jnp.float32)  # [BQ, T]

    # p covers relative positions r = (t-1) ... -(t-1) (zero-padded on the right
    # to a lane-aligned width); the block's queries are absolute rows qi*BQ + a,
    # so the needed band starts at table index (t-1) - (qi*BQ + BQ - 1) and
    # spans a lane-aligned W_pad >= T + BQ - 1 entries.
    w_pad = _round_up(t + bq - 1, 128)
    start = t - bq - qi * bq  # == (t-1) - (qi*bq + bq - 1)
    p_slice = p_ref[0, pl.ds(start, w_pad), :]                 # [W_pad, D]
    band = jnp.dot(qv, p_slice.T, preferred_element_type=jnp.float32)

    # band shift: bd[a, b] = band[a, (BQ-1) - a + b] — a diagonal shear via
    # tpu.dynamic_rotate (pltpu.roll with per-row stride): row a rotates left by
    # (BQ-1-a) == right by (W_pad - BQ + 1) + a. No wraparound reaches the kept
    # [:, :t] region (b + BQ-1-a <= t+bq-2 < W_pad for b < t).
    sheared = pltpu.roll(band, shift=w_pad - bq + 1, axis=1, stride=1,
                         stride_axis=0)
    bd = sheared[:, :t]

    scores = (ac + bd) * scale + bias_ref[0, 0]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    if dropout_rate > 0.0:
        keep = _dropout_keep(seed_ref[0, 0], pl.program_id(0), pl.program_id(1),
                             qi, (bq, t), dropout_rate)
        probs = jnp.where(keep, probs * (1.0 / (1.0 - dropout_rate)), 0.0)
    out = jnp.dot(probs.astype(v.dtype), v,
                  preferred_element_type=jnp.float32)
    out_ref[0, 0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "interpret",
                                              "dropout_rate"))
def relpos_attention(q_u, q_v, k, v, p, bias, scale: float,
                     block_q: int = 128, interpret: bool = False,
                     dropout_rate: float = 0.0, seed=None):
    """q_u/q_v/k/v: [B, H, T, D]; p: [H, 2T-1, D] (per-head projected rel-pos
    table, index 0 ↔ r = T-1); bias: [B, 1 or H, T, T] additive f32 (chunk mask
    + key validity). dropout_rate > 0 applies attention-prob dropout in-kernel
    (seed: int32 [1,1]; TPU-compiled only). Returns [B, H, T, D] (fp32
    accumulation)."""
    b, h, t, d = q_u.shape
    bq = min(block_q, t)
    while t % bq != 0:
        bq //= 2
    bq = max(bq, 1)
    grid = (b, h, t // bq)

    # pad the rel-pos table so every block's [start, start + W_pad) slice is in
    # range (max start = t - bq)
    w_pad = -(-(t + bq - 1) // 128) * 128
    r_pad = (t - bq) + w_pad
    if p.shape[1] < r_pad:
        p = jnp.pad(p, ((0, 0), (0, r_pad - p.shape[1]), (0, 0)))

    bias_h = bias.shape[1]
    if seed is None:
        seed = jnp.zeros((1, 1), jnp.int32)
    assert not (dropout_rate > 0.0 and interpret), \
        "in-kernel dropout needs the TPU PRNG (no interpret-mode lowering)"

    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, bq=bq, t=t,
                          dropout_rate=dropout_rate),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda bb, hh, qq: (bb, hh, qq, 0)),
            pl.BlockSpec((1, 1, bq, d), lambda bb, hh, qq: (bb, hh, qq, 0)),
            pl.BlockSpec((1, 1, t, d), lambda bb, hh, qq: (bb, hh, 0, 0)),
            pl.BlockSpec((1, 1, t, d), lambda bb, hh, qq: (bb, hh, 0, 0)),
            pl.BlockSpec((1, p.shape[1], d), lambda bb, hh, qq: (hh, 0, 0)),
            pl.BlockSpec((1, 1, bq, t),
                         lambda bb, hh, qq: (bb, hh if bias_h > 1 else 0, qq, 0)),
            pl.BlockSpec((1, 1), lambda bb, hh, qq: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda bb, hh, qq: (bb, hh, qq, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, t, d), jnp.float32),
        interpret=interpret,
    )(q_u, q_v, k, v, p, bias, seed)


# ---------------------------------------------------------------------------
# backward kernels (custom_vjp) — same block structure; gradients recompute the
# block's probs instead of saving [B,H,T,T] residuals.
# dscores = probs * (g @ V^T - rowsum(g @ V^T * probs)) * scale
# dq_u = dscores @ K;  dK += dscores^T @ q_u;  dv += probs^T @ g
# dband = unshear(dscores);  dq_v = dband @ P_slice;  dP_slice += dband^T @ q_v
# ---------------------------------------------------------------------------


def _recompute_probs_and_dscores(qu, qv, k, v, p_slice, bias, g, *, scale, bq,
                                 t, w_pad, dropout_rate=0.0, seed_ids=None):
    """Returns (probs_for_dv, dscores). With dropout, the SAME mask as the
    forward is regenerated from (seed, b, h, q-block):
      o = (m ∘ p)/(1-r) @ v  ⇒  dp = (g vᵀ) ∘ m/(1-r),  dv = ((m ∘ p)/(1-r))ᵀ g
    and the softmax backward is unchanged in form."""
    ac = jnp.dot(qu, k.T, preferred_element_type=jnp.float32)
    band = jnp.dot(qv, p_slice.T, preferred_element_type=jnp.float32)
    sheared = pltpu.roll(band, shift=w_pad - bq + 1, axis=1, stride=1,
                         stride_axis=0)
    scores = (ac + sheared[:, :t]) * scale + bias
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    dprobs = jnp.dot(g, v.T, preferred_element_type=jnp.float32)
    if dropout_rate > 0.0:
        seed_val, bb, hh, qi = seed_ids
        keep = _dropout_keep(seed_val, bb, hh, qi, (bq, t), dropout_rate)
        inv = jnp.where(keep, 1.0 / (1.0 - dropout_rate), 0.0)
        dprobs = dprobs * inv
        probs_for_dv = probs * inv
    else:
        probs_for_dv = probs
    dscores = probs * (dprobs - jnp.sum(dprobs * probs, axis=-1,
                                        keepdims=True)) * scale
    return probs_for_dv, dscores


def _unshear(dscores, *, bq, t, w_pad):
    """Inverse of the forward shear: dband[a, w] = dscores[a, w - (BQ-1-a)].
    Row-flip → per-row right-rotate by the row index → row-flip. Mosaic has no
    `rev`, so the flips are exchange-matrix matmuls (one tiny MXU op each)."""
    padded = jnp.pad(dscores, ((0, 0), (0, w_pad - t)))
    i = jax.lax.broadcasted_iota(jnp.int32, (bq, bq), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (bq, bq), 1)
    exch = jnp.where(i + j == bq - 1, 1.0, 0.0).astype(jnp.float32)
    flipped = jnp.dot(exch, padded, preferred_element_type=jnp.float32)
    rolled = pltpu.roll(flipped, shift=0, axis=1, stride=1, stride_axis=0)
    return jnp.dot(exch, rolled, preferred_element_type=jnp.float32)


def _bwd_kernel_a(qu_ref, qv_ref, k_ref, v_ref, p_ref, bias_ref, g_ref,
                  seed_ref, dqu_ref, dqv_ref, dk_ref, dv_ref, *, scale, bq, t,
                  dropout_rate):
    qi = pl.program_id(2)
    w_pad = _round_up(t + bq - 1, 128)
    start = t - bq - qi * bq
    qu, qv = qu_ref[0, 0], qv_ref[0, 0]
    k, v, g = k_ref[0, 0], v_ref[0, 0], g_ref[0, 0]
    p_slice = p_ref[0, pl.ds(start, w_pad), :]
    probs, dscores = _recompute_probs_and_dscores(
        qu, qv, k, v, p_slice, bias_ref[0, 0], g, scale=scale, bq=bq, t=t,
        w_pad=w_pad, dropout_rate=dropout_rate,
        seed_ids=(seed_ref[0, 0], pl.program_id(0), pl.program_id(1), qi))
    dband = _unshear(dscores, bq=bq, t=t, w_pad=w_pad)
    dqu_ref[0, 0] = jnp.dot(dscores, k, preferred_element_type=jnp.float32)
    dqv_ref[0, 0] = jnp.dot(dband, p_slice,
                            preferred_element_type=jnp.float32)

    @pl.when(qi == 0)
    def _():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    dk_ref[0, 0] += jnp.dot(dscores.T, qu, preferred_element_type=jnp.float32)
    dv_ref[0, 0] += jnp.dot(probs.T, g, preferred_element_type=jnp.float32)


def _bwd_kernel_p(qu_ref, qv_ref, k_ref, v_ref, p_ref, bias_ref, g_ref,
                  seed_ref, dp_ref, *, scale, bq, t, dropout_rate):
    bb = pl.program_id(2)
    qi = pl.program_id(1)
    hh = pl.program_id(0)
    w_pad = _round_up(t + bq - 1, 128)
    start = t - bq - qi * bq
    qu, qv = qu_ref[0, 0], qv_ref[0, 0]
    k, v, g = k_ref[0, 0], v_ref[0, 0], g_ref[0, 0]
    p_slice = p_ref[0, pl.ds(start, w_pad), :]
    _, dscores = _recompute_probs_and_dscores(
        qu, qv, k, v, p_slice, bias_ref[0, 0], g, scale=scale, bq=bq, t=t,
        w_pad=w_pad, dropout_rate=dropout_rate,
        seed_ids=(seed_ref[0, 0], bb, hh, qi))
    dband = _unshear(dscores, bq=bq, t=t, w_pad=w_pad)

    @pl.when(bb == 0)
    def _():
        dp_ref[0, 0] = jnp.zeros_like(dp_ref[0, 0])

    dp_ref[0, 0] += jnp.dot(dband.T, qv, preferred_element_type=jnp.float32)


def _relpos_bwd(block_q, dropout_rate, res, g):
    q_u, q_v, k, v, p_padded, bias, seed, scale = res
    b, h, t, d = q_u.shape
    bq = min(block_q, t)
    while t % bq != 0:
        bq //= 2
    bq = max(bq, 1)
    nq = t // bq
    w_pad = _round_up(t + bq - 1, 128)
    bias_h = bias.shape[1]
    g = g.astype(jnp.float32)

    kern_a = functools.partial(_bwd_kernel_a, scale=scale, bq=bq, t=t,
                               dropout_rate=dropout_rate)
    dqu, dqv, dk, dv = pl.pallas_call(
        kern_a,
        grid=(b, h, nq),  # qi fastest → dk/dv blocks accumulate over q
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda bb, hh, qq: (bb, hh, qq, 0)),
            pl.BlockSpec((1, 1, bq, d), lambda bb, hh, qq: (bb, hh, qq, 0)),
            pl.BlockSpec((1, 1, t, d), lambda bb, hh, qq: (bb, hh, 0, 0)),
            pl.BlockSpec((1, 1, t, d), lambda bb, hh, qq: (bb, hh, 0, 0)),
            pl.BlockSpec((1, p_padded.shape[1], d),
                         lambda bb, hh, qq: (hh, 0, 0)),
            pl.BlockSpec((1, 1, bq, t),
                         lambda bb, hh, qq: (bb, hh if bias_h > 1 else 0, qq, 0)),
            pl.BlockSpec((1, 1, bq, d), lambda bb, hh, qq: (bb, hh, qq, 0)),
            pl.BlockSpec((1, 1), lambda bb, hh, qq: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda bb, hh, qq: (bb, hh, qq, 0)),
            pl.BlockSpec((1, 1, bq, d), lambda bb, hh, qq: (bb, hh, qq, 0)),
            pl.BlockSpec((1, 1, t, d), lambda bb, hh, qq: (bb, hh, 0, 0)),
            pl.BlockSpec((1, 1, t, d), lambda bb, hh, qq: (bb, hh, 0, 0)),
        ],
        out_shape=[jax.ShapeDtypeStruct((b, h, t, d), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((b, h, t, d), jnp.float32)] * 2,
        interpret=_relpos_bwd.interpret,
    )(q_u, q_v, k, v, p_padded, bias, g, seed)

    kern_p = functools.partial(_bwd_kernel_p, scale=scale, bq=bq, t=t,
                               dropout_rate=dropout_rate)
    dp_blocks = pl.pallas_call(
        kern_p,
        grid=(h, nq, b),  # b fastest → dp blocks accumulate over batch
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda hh, qq, bb: (bb, hh, qq, 0)),
            pl.BlockSpec((1, 1, bq, d), lambda hh, qq, bb: (bb, hh, qq, 0)),
            pl.BlockSpec((1, 1, t, d), lambda hh, qq, bb: (bb, hh, 0, 0)),
            pl.BlockSpec((1, 1, t, d), lambda hh, qq, bb: (bb, hh, 0, 0)),
            pl.BlockSpec((1, p_padded.shape[1], d),
                         lambda hh, qq, bb: (hh, 0, 0)),
            pl.BlockSpec((1, 1, bq, t),
                         lambda hh, qq, bb: (bb, hh if bias_h > 1 else 0, qq, 0)),
            pl.BlockSpec((1, 1, bq, d), lambda hh, qq, bb: (bb, hh, qq, 0)),
            pl.BlockSpec((1, 1), lambda hh, qq, bb: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, w_pad, d),
                               lambda hh, qq, bb: (hh, qq, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((h, nq, w_pad, d), jnp.float32),
        interpret=_relpos_bwd.interpret,
    )(q_u, q_v, k, v, p_padded, bias, g, seed)

    # scatter-add the per-q-block dP_slice windows back into the table
    dp = jnp.zeros_like(p_padded)
    for qq in range(nq):
        start = t - bq - qq * bq
        seg = jax.lax.dynamic_slice(dp, (0, start, 0), (h, w_pad, d))
        dp = jax.lax.dynamic_update_slice(dp, seg + dp_blocks[:, qq],
                                          (0, start, 0))
    return dqu, dqv, dk, dv, dp, None, None


_relpos_bwd.interpret = False


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def relpos_attention_trainable(q_u, q_v, k, v, p_padded, bias, seed, scale,
                               block_q, dropout_rate=0.0):
    """Differentiable fused rel-pos attention: Pallas forward AND backward.
    p_padded must already be padded to (t - bq) + W_pad rows (see
    relpos_attention's padding); gradients flow to q_u, q_v, k, v, p_padded.
    dropout_rate > 0 fuses attention-prob dropout into both passes (the mask
    is regenerated in the backward from (seed [1,1] int32, block ids) — no
    [B,H,T,T] residual). seed may be None when dropout_rate == 0."""
    return _relpos_fwd_impl(q_u, q_v, k, v, p_padded, bias, seed, scale,
                            block_q, dropout_rate)


def _relpos_fwd_impl(q_u, q_v, k, v, p_padded, bias, seed, scale, block_q,
                     dropout_rate):
    return relpos_attention(q_u, q_v, k, v, p_padded, bias, scale=scale,
                            block_q=block_q,
                            interpret=_relpos_bwd.interpret,
                            dropout_rate=dropout_rate, seed=seed)


def _relpos_fwd_rule(q_u, q_v, k, v, p_padded, bias, seed, scale, block_q,
                     dropout_rate):
    out = _relpos_fwd_impl(q_u, q_v, k, v, p_padded, bias, seed, scale,
                           block_q, dropout_rate)
    seed_arr = jnp.zeros((1, 1), jnp.int32) if seed is None else seed
    return out, (q_u, q_v, k, v, p_padded, bias, seed_arr, scale)


def _relpos_bwd_rule(scale_unused, block_q, dropout_rate, res, g):
    return _relpos_bwd(block_q, dropout_rate, res, g)


relpos_attention_trainable.defvjp(_relpos_fwd_rule, _relpos_bwd_rule)


def relpos_attention_reference(q_u, q_v, k, v, p, bias, scale: float):
    """Direct XLA computation (the path the kernel replaces), for testing."""
    b, h, t, d = q_u.shape
    ac = jnp.einsum("bhsd,bhtd->bhst", q_u, k,
                    preferred_element_type=jnp.float32)
    bd_full = jnp.einsum("bhsd,hrd->bhsr", q_v, p,
                         preferred_element_type=jnp.float32)
    i = jnp.arange(t)[:, None]
    j = jnp.arange(t)[None, :]
    u = (t - 1) - (i - j)
    bd = jnp.take_along_axis(bd_full, u[None, None].repeat(h, 1), axis=-1)
    scores = (ac + bd) * scale + bias
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhst,bhtd->bhsd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Fused causal masked attention (no rel-pos) — for the NAR unit decoder.
#
# The XLA path of MultiHeadAttention at the unit decoder's training shape
# (T = mt_len x 25 = 1200, B=8, H=8) materializes [B,H,T,T] score, prob and
# dropout-mask tensors in HBM (~368 MB each in f32) for forward AND saves
# probs for the backward — measured at ~56% of the whole train step
# (docs/training.md ablations). This kernel keeps everything in VMEM per
# (batch, head, q-block); the causal structure and key-validity are computed
# IN-KERNEL from iota + a [B,T] row bias, so no [T,T] mask ever exists in HBM.
# Same design as the rel-pos kernel above: full-row softmax per q-block
# (K/V fit VMEM comfortably at these T), fused attention-prob dropout
# (mask regenerated in the backward from (seed, b, h, q-block)), custom_vjp
# with dK/dV accumulated across q-blocks purely through grid ordering.
# Replaces reference behavior fairseq/modules/multihead_attention.py:747
# (attn_probs = dropout(attn_weights)) for the causal self-attention case.
# ---------------------------------------------------------------------------


def _causal_block_bias(qi: int, bq: int, t: int):
    """Additive f32 [BQ, T] causal bias for q-block qi (absolute rows
    qi*bq .. qi*bq+bq-1): 0 where col <= row else NEG_INF."""
    row = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, t), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, t), 1)
    return jnp.where(col <= row, 0.0, NEG_INF).astype(jnp.float32)


def _causal_kernel(q_ref, k_ref, v_ref, kvb_ref, seed_ref, out_ref, *,
                   scale: float, bq: int, t: int, causal: bool,
                   dropout_rate: float):
    qi = pl.program_id(2)
    q = q_ref[0, 0]              # [BQ, D]
    k = k_ref[0, 0]              # [T, D]
    v = v_ref[0, 0]

    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    scores = scores + kvb_ref[0, 0][None, :]        # key-valid bias [T]
    if causal:
        scores = scores + _causal_block_bias(qi, bq, t)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    if dropout_rate > 0.0:
        keep = _dropout_keep(seed_ref[0, 0], pl.program_id(0),
                             pl.program_id(1), qi, (bq, t), dropout_rate)
        probs = jnp.where(keep, probs * (1.0 / (1.0 - dropout_rate)), 0.0)
    out = jnp.dot(probs.astype(v.dtype), v,
                  preferred_element_type=jnp.float32)
    out_ref[0, 0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "causal", "block_q",
                                             "interpret", "dropout_rate"))
def masked_attention(q, k, v, kv_bias, scale: float, causal: bool = True,
                     block_q: int = 128, interpret: bool = False,
                     dropout_rate: float = 0.0, seed=None):
    """q/k/v: [B, H, T, D] (T pre-padded to a multiple of 128 by the caller /
    masked_attention_trainable); kv_bias: [B, 1, T] additive f32 key-validity
    bias (0 valid, NEG_INF masked — padding columns included; the singleton
    middle axis satisfies the TPU block-tiling rule for the [1, 1, T] block). Returns
    [B, H, T, D] f32. dropout_rate > 0 applies attention-prob dropout
    in-kernel (TPU-compiled only; the TPU PRNG has no interpret lowering)."""
    b, h, t, d = q.shape
    bq = min(block_q, t)
    while t % bq != 0:
        bq //= 2
    bq = max(bq, 1)
    grid = (b, h, t // bq)
    if seed is None:
        seed = jnp.zeros((1, 1), jnp.int32)
    assert not (dropout_rate > 0.0 and interpret), \
        "in-kernel dropout needs the TPU PRNG (no interpret-mode lowering)"

    return pl.pallas_call(
        functools.partial(_causal_kernel, scale=scale, bq=bq, t=t,
                          causal=causal, dropout_rate=dropout_rate),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda bb, hh, qq: (bb, hh, qq, 0)),
            pl.BlockSpec((1, 1, t, d), lambda bb, hh, qq: (bb, hh, 0, 0)),
            pl.BlockSpec((1, 1, t, d), lambda bb, hh, qq: (bb, hh, 0, 0)),
            pl.BlockSpec((1, 1, t), lambda bb, hh, qq: (bb, 0, 0)),
            pl.BlockSpec((1, 1), lambda bb, hh, qq: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d),
                               lambda bb, hh, qq: (bb, hh, qq, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, t, d), jnp.float32),
        interpret=interpret,
    )(q, k, v, kv_bias, seed)


def _causal_recompute(q, k, v, kvb, g, *, scale, bq, t, causal, qi,
                      dropout_rate, seed_ids):
    """Recompute the block's probs and dscores (softmax backward), applying
    the SAME dropout mask as the forward (regenerated from seed_ids)."""
    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    scores = scores + kvb[None, :]
    if causal:
        scores = scores + _causal_block_bias(qi, bq, t)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    dprobs = jnp.dot(g, v.T, preferred_element_type=jnp.float32)
    if dropout_rate > 0.0:
        seed_val, bb, hh = seed_ids
        keep = _dropout_keep(seed_val, bb, hh, qi, (bq, t), dropout_rate)
        inv = jnp.where(keep, 1.0 / (1.0 - dropout_rate), 0.0)
        dprobs = dprobs * inv
        probs_for_dv = probs * inv
    else:
        probs_for_dv = probs
    dscores = probs * (dprobs - jnp.sum(dprobs * probs, axis=-1,
                                        keepdims=True)) * scale
    return probs_for_dv, dscores


def _causal_bwd_kernel(q_ref, k_ref, v_ref, kvb_ref, g_ref, seed_ref,
                       dq_ref, dk_ref, dv_ref, *, scale, bq, t, causal,
                       dropout_rate):
    qi = pl.program_id(2)
    q, k, v, g = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], g_ref[0, 0]
    probs, dscores = _causal_recompute(
        q, k, v, kvb_ref[0, 0], g, scale=scale, bq=bq, t=t, causal=causal,
        qi=qi, dropout_rate=dropout_rate,
        seed_ids=(seed_ref[0, 0], pl.program_id(0), pl.program_id(1)))
    dq_ref[0, 0] = jnp.dot(dscores, k, preferred_element_type=jnp.float32)

    @pl.when(qi == 0)
    def _():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    dk_ref[0, 0] += jnp.dot(dscores.T, q, preferred_element_type=jnp.float32)
    dv_ref[0, 0] += jnp.dot(probs.T, g, preferred_element_type=jnp.float32)


def _masked_bwd(causal, block_q, dropout_rate, res, g):
    q, k, v, kv_bias, seed, scale = res
    b, h, t, d = q.shape
    bq = min(block_q, t)
    while t % bq != 0:
        bq //= 2
    bq = max(bq, 1)
    g = g.astype(jnp.float32)

    kern = functools.partial(_causal_bwd_kernel, scale=scale, bq=bq, t=t,
                             causal=causal, dropout_rate=dropout_rate)
    dq, dk, dv = pl.pallas_call(
        kern,
        grid=(b, h, t // bq),  # qi fastest -> dk/dv accumulate over q-blocks
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda bb, hh, qq: (bb, hh, qq, 0)),
            pl.BlockSpec((1, 1, t, d), lambda bb, hh, qq: (bb, hh, 0, 0)),
            pl.BlockSpec((1, 1, t, d), lambda bb, hh, qq: (bb, hh, 0, 0)),
            pl.BlockSpec((1, 1, t), lambda bb, hh, qq: (bb, 0, 0)),
            pl.BlockSpec((1, 1, bq, d), lambda bb, hh, qq: (bb, hh, qq, 0)),
            pl.BlockSpec((1, 1), lambda bb, hh, qq: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda bb, hh, qq: (bb, hh, qq, 0)),
            pl.BlockSpec((1, 1, t, d), lambda bb, hh, qq: (bb, hh, 0, 0)),
            pl.BlockSpec((1, 1, t, d), lambda bb, hh, qq: (bb, hh, 0, 0)),
        ],
        out_shape=[jax.ShapeDtypeStruct((b, h, t, d), jnp.float32)] * 3,
        interpret=_relpos_bwd.interpret,
    )(q, k, v, kv_bias, g, seed)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            None, None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def masked_attention_trainable(q, k, v, kv_bias, seed, scale, causal=True,
                               block_q=128, dropout_rate=0.0):
    """Differentiable fused causal attention: Pallas forward AND backward.
    Gradients flow to q, k, v; kv_bias is a constant mask. dropout_rate > 0
    fuses attention-prob dropout into both passes (mask regenerated in the
    backward from (seed [1,1] int32, block ids) — no [B,H,T,T] residual)."""
    return masked_attention(q, k, v, kv_bias, scale=scale, causal=causal,
                            block_q=block_q, interpret=_relpos_bwd.interpret,
                            dropout_rate=dropout_rate, seed=seed)


def _masked_fwd_rule(q, k, v, kv_bias, seed, scale, causal, block_q,
                     dropout_rate):
    out = masked_attention(q, k, v, kv_bias, scale=scale, causal=causal,
                           block_q=block_q, interpret=_relpos_bwd.interpret,
                           dropout_rate=dropout_rate, seed=seed)
    seed_arr = jnp.zeros((1, 1), jnp.int32) if seed is None else seed
    return out, (q, k, v, kv_bias, seed_arr, scale)


def _masked_bwd_rule(scale_unused, causal, block_q, dropout_rate, res, g):
    return _masked_bwd(causal, block_q, dropout_rate, res, g)


masked_attention_trainable.defvjp(_masked_fwd_rule, _masked_bwd_rule)


def masked_attention_reference(q, k, v, kv_bias, scale: float,
                               causal: bool = True):
    """Direct XLA computation (the path the kernel replaces), for testing."""
    b, h, t, d = q.shape
    scores = jnp.einsum("bhsd,bhtd->bhst", q, k,
                        preferred_element_type=jnp.float32) * scale
    scores = scores + kv_bias[:, :, None, :]
    if causal:
        i = jnp.arange(t)
        scores = scores + jnp.where(i[:, None] >= i[None, :], 0.0,
                                    NEG_INF).astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhst,bhtd->bhsd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Fused arbitrary-bias cross-attention — for the unit decoder's streaming
# cross-attention (queries T_q = mt_len x 25 = 1200, keys T_k = encoder
# frames = 256) whose mask is the DATA-DEPENDENT CTC streaming mask
# (models/streamspeech.py build_streaming_mask, reference
# researches/ctc_unity/modules/transformer_decoder.py) — not recomputable
# from iota in-kernel, so it rides in as an additive [B, Tq, Tk] f32 bias
# (a ~10 MB read at the hot shape, vs the [B,H,Tq,Tk] score/prob/dropout
# tensors (~79 MB each, x fwd+bwd round trips) the XLA path materializes).
# Same contract as the masked/rel-pos kernels: full-row softmax per q-block,
# fused attention-prob dropout regenerated in the backward from
# (seed, b, h, q-block), custom_vjp with dK/dV accumulated across q-blocks
# through grid ordering. The bias is a constant (no dbias).
# ---------------------------------------------------------------------------


def _bias_kernel(q_ref, k_ref, v_ref, bias_ref, seed_ref, out_ref, *,
                 scale: float, dropout_rate: float):
    qi = pl.program_id(2)
    q = q_ref[0, 0]              # [BQ, D]
    k = k_ref[0, 0]              # [TK, D]
    v = v_ref[0, 0]

    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    scores = scores + bias_ref[0]                   # [BQ, TK]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    if dropout_rate > 0.0:
        keep = _dropout_keep(seed_ref[0, 0], pl.program_id(0),
                             pl.program_id(1), qi, scores.shape, dropout_rate)
        probs = jnp.where(keep, probs * (1.0 / (1.0 - dropout_rate)), 0.0)
    out = jnp.dot(probs.astype(v.dtype), v,
                  preferred_element_type=jnp.float32)
    out_ref[0, 0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "interpret",
                                             "dropout_rate"))
def bias_attention(q, k, v, bias, scale: float, block_q: int = 128,
                   interpret: bool = False, dropout_rate: float = 0.0,
                   seed=None):
    """q: [B, H, TQ, D]; k/v: [B, H, TK, D]; bias: [B, TQ, TK] additive f32
    (carries EVERYTHING: streaming mask, key validity, padding — the kernel
    adds no structure of its own). TQ/TK pre-padded by the caller (padding
    columns masked in bias). Returns [B, H, TQ, D] f32."""
    b, h, tq, d = q.shape
    tk = k.shape[2]
    bq = min(block_q, tq)
    while tq % bq != 0:
        bq //= 2
    bq = max(bq, 1)
    grid = (b, h, tq // bq)
    if seed is None:
        seed = jnp.zeros((1, 1), jnp.int32)
    assert not (dropout_rate > 0.0 and interpret), \
        "in-kernel dropout needs the TPU PRNG (no interpret-mode lowering)"

    return pl.pallas_call(
        functools.partial(_bias_kernel, scale=scale,
                          dropout_rate=dropout_rate),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda bb, hh, qq: (bb, hh, qq, 0)),
            pl.BlockSpec((1, 1, tk, d), lambda bb, hh, qq: (bb, hh, 0, 0)),
            pl.BlockSpec((1, 1, tk, d), lambda bb, hh, qq: (bb, hh, 0, 0)),
            pl.BlockSpec((1, bq, tk), lambda bb, hh, qq: (bb, qq, 0)),
            pl.BlockSpec((1, 1), lambda bb, hh, qq: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d),
                               lambda bb, hh, qq: (bb, hh, qq, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, tq, d), jnp.float32),
        interpret=interpret,
    )(q, k, v, bias, seed)


def _bias_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, g_ref, seed_ref,
                     dq_ref, dk_ref, dv_ref, *, scale, dropout_rate):
    qi = pl.program_id(2)
    q, k, v, g = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], g_ref[0, 0]
    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    scores = scores + bias_ref[0]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=-1, keepdims=True)
    dprobs = jnp.dot(g, v.T, preferred_element_type=jnp.float32)
    if dropout_rate > 0.0:
        keep = _dropout_keep(seed_ref[0, 0], pl.program_id(0),
                             pl.program_id(1), qi, scores.shape, dropout_rate)
        inv = jnp.where(keep, 1.0 / (1.0 - dropout_rate), 0.0)
        dprobs = dprobs * inv
        probs_for_dv = probs * inv
    else:
        probs_for_dv = probs
    dscores = probs * (dprobs - jnp.sum(dprobs * probs, axis=-1,
                                        keepdims=True)) * scale
    dq_ref[0, 0] = jnp.dot(dscores, k, preferred_element_type=jnp.float32)

    @pl.when(qi == 0)
    def _():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    dk_ref[0, 0] += jnp.dot(dscores.T, q, preferred_element_type=jnp.float32)
    dv_ref[0, 0] += jnp.dot(probs_for_dv.T, g,
                            preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def bias_attention_trainable(q, k, v, bias, seed, scale, block_q=128,
                             dropout_rate=0.0):
    """Differentiable fused bias-attention: Pallas forward AND backward.
    Gradients flow to q, k, v; bias is a constant mask."""
    return bias_attention(q, k, v, bias, scale=scale, block_q=block_q,
                          interpret=_relpos_bwd.interpret,
                          dropout_rate=dropout_rate, seed=seed)


def _bias_fwd_rule(q, k, v, bias, seed, scale, block_q, dropout_rate):
    out = bias_attention(q, k, v, bias, scale=scale, block_q=block_q,
                         interpret=_relpos_bwd.interpret,
                         dropout_rate=dropout_rate, seed=seed)
    seed_arr = jnp.zeros((1, 1), jnp.int32) if seed is None else seed
    return out, (q, k, v, bias, seed_arr)


def _bias_bwd_rule(scale, block_q, dropout_rate, res, g):
    q, k, v, bias, seed = res
    b, h, tq, d = q.shape
    tk = k.shape[2]
    bq = min(block_q, tq)
    while tq % bq != 0:
        bq //= 2
    bq = max(bq, 1)
    g = g.astype(jnp.float32)

    kern = functools.partial(_bias_bwd_kernel, scale=scale,
                             dropout_rate=dropout_rate)
    dq, dk, dv = pl.pallas_call(
        kern,
        grid=(b, h, tq // bq),  # qi fastest -> dk/dv accumulate over q-blocks
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda bb, hh, qq: (bb, hh, qq, 0)),
            pl.BlockSpec((1, 1, tk, d), lambda bb, hh, qq: (bb, hh, 0, 0)),
            pl.BlockSpec((1, 1, tk, d), lambda bb, hh, qq: (bb, hh, 0, 0)),
            pl.BlockSpec((1, bq, tk), lambda bb, hh, qq: (bb, qq, 0)),
            pl.BlockSpec((1, 1, bq, d), lambda bb, hh, qq: (bb, hh, qq, 0)),
            pl.BlockSpec((1, 1), lambda bb, hh, qq: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda bb, hh, qq: (bb, hh, qq, 0)),
            pl.BlockSpec((1, 1, tk, d), lambda bb, hh, qq: (bb, hh, 0, 0)),
            pl.BlockSpec((1, 1, tk, d), lambda bb, hh, qq: (bb, hh, 0, 0)),
        ],
        out_shape=[jax.ShapeDtypeStruct((b, h, tq, d), jnp.float32),
                   jax.ShapeDtypeStruct((b, h, tk, d), jnp.float32),
                   jax.ShapeDtypeStruct((b, h, tk, d), jnp.float32)],
        interpret=_relpos_bwd.interpret,
    )(q, k, v, bias, g, seed)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            None, None)


bias_attention_trainable.defvjp(_bias_fwd_rule, _bias_bwd_rule)


# ---------------------------------------------------------------------------
# Analytic FLOP counts. XLA's cost analysis reports tpu_custom_call as ZERO
# flops, so a step that routes attention through these kernels under-counts
# its work and the naive MFU = xla_flops/time/peak falls as the kernels get
# better (BENCH_r04→r05 regression artifact). These count 2·M·K·N per jnp.dot
# actually executed by the kernels above — grid cells × the dots in each
# kernel body — so benchmarks can report MFU over the true executed matmul
# FLOPs. Keep in sync with the kernel bodies (each term is annotated).
# ---------------------------------------------------------------------------


def _eff_block_q(t: int, block_q: int) -> int:
    bq = min(block_q, t)
    while t % bq != 0:
        bq //= 2
    return max(bq, 1)


def relpos_flops(b: int, h: int, t: int, d: int, block_q: int = 128,
                 train: bool = True) -> float:
    """Executed matmul FLOPs of relpos_attention (+ its backward kernels when
    train=True) at q/k/v [B,H,T,D]."""
    bq = _eff_block_q(t, block_q)
    nq = t // bq
    w = _round_up(t + bq - 1, 128)
    mm = lambda m, k_, n: 2.0 * m * k_ * n
    fwd = mm(bq, d, t) + mm(bq, d, w) + mm(bq, t, d)   # ac, band, probs@v
    total = fwd
    if train:
        recompute = mm(bq, d, t) + mm(bq, d, w) + mm(bq, d, t)  # ac, band, dprobs
        unshear = 2 * mm(bq, bq, w)                             # two exch dots
        bwd_a = recompute + unshear + mm(bq, t, d) * 3 + mm(bq, w, d)
        # dqu, dk, dv are t-shaped; dqv is w-shaped
        bwd_p = recompute + unshear + mm(bq, w, d)              # dp
        total += bwd_a + bwd_p
    return float(b * h * nq) * total


def masked_flops(b: int, h: int, t_padded: int, d: int, block_q: int = 128,
                 train: bool = True) -> float:
    """Executed matmul FLOPs of masked_attention (+ backward) at the PADDED
    T (masked_attention_trainable's caller pads T to the 128 tile)."""
    bq = _eff_block_q(t_padded, block_q)
    nq = t_padded // bq
    mm = 2.0 * bq * t_padded * d
    fwd = 2 * mm                       # scores, probs@v
    total = fwd
    if train:
        total += 5 * mm                # recompute, dprobs, dq, dk, dv
    return float(b * h * nq) * total


def bias_flops(b: int, h: int, tq_padded: int, tk_padded: int, d: int,
               block_q: int = 128, train: bool = True) -> float:
    """Executed matmul FLOPs of bias_attention (+ backward) at the PADDED
    query/key lengths (MultiHeadAttention._bias_pallas pads both to 128)."""
    bq = _eff_block_q(tq_padded, block_q)
    nq = tq_padded // bq
    mm = 2.0 * bq * tk_padded * d
    fwd = 2 * mm                       # scores, probs@v
    total = fwd
    if train:
        total += 5 * mm                # recompute, dprobs, dq, dk, dv
    return float(b * h * nq) * total


def bias_attention_reference(q, k, v, bias, scale: float):
    """Direct XLA computation (the path the kernel replaces), for testing."""
    scores = jnp.einsum("bhsd,bhtd->bhst", q, k,
                        preferred_element_type=jnp.float32) * scale
    scores = scores + bias[:, None]
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhst,bhtd->bhsd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32)
