"""Pallas TPU kernel for the CTC streaming-policy posterior.

`models/streamspeech.py:ctc_not_blank_probs` (reference behavior
`researches/ctc_unity/models/streamspeech_model.py:288-314`) turns each aux
CTC head's logits into P(new token at frame t) = 1 - P(blank_t)
- P(repeat of frame t-1), where the repeat term is the dot product of
consecutive frames' posterior rows minus the blank-blank product. The XLA
path must materialize the fp32 softmax posteriors [B, T, V] and their
shifted slices in HBM — at the train shape [8, 256, 6000] x two aux heads
those buffers were among the largest remaining HBM writes of the whole step
(scripts/analyze_hlo.py) for an output that is only [B, T].

This kernel streams the logits through VMEM once (bf16 or fp32, read-only),
computes the row softmax on the VPU, and carries ONE posterior row per batch
lane ([bb, Vp] scratch) across time blocks so consecutive-row dots never
touch HBM. The function is used under ``stop_gradient`` (it builds the
streaming attention mask, reference detaches it too), so there is no
backward kernel — the wrapper re-applies ``stop_gradient``.

Block layout (Mosaic constraint: the last two dims of every block must be
divisible by (8, 128) or equal the full array dims — a flat [B, T] output
blocked (1, tc) is rejected by the real lowering even though interpret mode
accepts it): batch is processed in blocks of 8 rows held whole in VMEM
(the pallas_ctc.py pattern), and the output is emitted as
[B/8, Tp, 8] with block (1, tc, 8) whose last dim EQUALS the array dim,
then transposed back to [B, T] outside (a [B, T] fp32 reshuffle, ~8 KB).

Numerics: softmax is computed in fp32 with max-subtraction, the same formula
XLA lowers `jax.nn.softmax(x.astype(f32))` to; outputs match the XLA path to
~1e-6 (tests/test_pallas_policy.py runs the kernel in interpret mode against
the reference formula; the forced-gate full-model test covers the routing).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NNEG = -1e30
BB = 8    # batch rows per block (sublane tile)
TC = 8    # time rows per invocation: keeps fp32 temps ~1.5 MB at V=6000


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def nb_pallas_ok(t: int, v: int) -> bool:
    """Routing gate: real TPU backend and shapes where the HBM saving pays.

    STREAMSPEECH_DISABLE_PALLAS_NOTBLANK ablates just this kernel;
    STREAMSPEECH_DISABLE_PALLAS is the global kill switch (CLAUDE.md)."""
    if os.environ.get("STREAMSPEECH_DISABLE_PALLAS"):
        return False
    if os.environ.get("STREAMSPEECH_DISABLE_PALLAS_NOTBLANK"):
        return False
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover
        return False
    return backend == "tpu" and t >= 64 and v >= 512


def _nb_kernel(x_ref, o_ref, prev_ref, *, blank: int, v_real: int):
    """One (batch block, time block): softmax rows in fp32, dot each row
    with the previous row (carried across time blocks in `prev_ref`), emit
    the not-blank posterior as [tc, bb]. Time block 0 of each batch block
    starts from a zero previous row — dot 0, matching the XLA path's
    zero-padded frame -1."""
    i = pl.program_id(1)
    x = x_ref[...].astype(jnp.float32)                      # [bb, tc, vp]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 2)
    x = jnp.where(lane < v_real, x, NNEG)                   # mask pad lanes
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)              # [bb, tc, vp]

    carry = jnp.where(i == 0, jnp.zeros_like(prev_ref[...]), prev_ref[...])
    # static lax.slice only: integer/negative indexing lowers to
    # dynamic_slice, which Mosaic does not implement
    p_head = jax.lax.slice_in_dim(p, 0, p.shape[1] - 1, axis=1)
    prev = jnp.concatenate([carry[:, None, :], p_head], axis=1)
    dot = jnp.sum(p * prev, axis=-1)                        # [bb, tc]
    blank_p = jnp.squeeze(
        jax.lax.slice_in_dim(p, blank, blank + 1, axis=2), axis=2)
    prev_blank = jnp.squeeze(
        jax.lax.slice_in_dim(prev, blank, blank + 1, axis=2), axis=2)
    repeat = dot - blank_p * prev_blank
    o_ref[0] = jnp.transpose(1.0 - (repeat + blank_p))      # [tc, bb]
    prev_ref[...] = jnp.squeeze(
        jax.lax.slice_in_dim(p, p.shape[1] - 1, p.shape[1], axis=1), axis=1)


def not_blank_probs_pallas(logits: jnp.ndarray, blank: int = 0,
                           interpret: bool = False) -> jnp.ndarray:
    """[B, T, V] logits (any float dtype) -> stop-gradient fp32 [B, T]."""
    b, t, v = logits.shape
    vp = _round_up(v, 128)
    bp = _round_up(b, BB)
    tp = _round_up(t, TC)
    # stop the gradient at the INPUT: the kernel has no jvp rule, and the
    # function's contract is stop-gradient anyway (the reference detaches)
    x = jnp.pad(jax.lax.stop_gradient(logits),
                ((0, bp - b), (0, tp - t), (0, vp - v)))
    out = pl.pallas_call(
        functools.partial(_nb_kernel, blank=blank, v_real=v),
        grid=(bp // BB, tp // TC),
        in_specs=[pl.BlockSpec((BB, TC, vp),
                               lambda bb, ii: (bb, ii, 0))],
        out_specs=pl.BlockSpec((1, TC, BB), lambda bb, ii: (bb, ii, 0)),
        out_shape=jax.ShapeDtypeStruct((bp // BB, tp, BB), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BB, vp), jnp.float32)],
        interpret=interpret,
    )(x)
    # [Bblocks, Tp, BB] -> [Bblocks, BB, Tp] -> [Bp, Tp] -> [B, T]
    flat = jnp.transpose(out, (0, 2, 1)).reshape(bp, tp)
    return jax.lax.stop_gradient(flat[:b, :t])
