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
computes the row softmax on the VPU, and carries ONE posterior row ([1, Vp]
scratch) across time blocks so consecutive-row dots never touch HBM. The
function is used under ``stop_gradient`` (it builds the streaming attention
mask, reference detaches it too), so there is no backward kernel — the
wrapper re-applies ``stop_gradient``.

Numerics: softmax is computed in fp32 with max-subtraction, the same formula
XLA lowers `jax.nn.softmax(x.astype(f32))` to; outputs match the XLA path to
~1e-6 (tests/test_pallas_policy.py runs the kernel in interpret mode against
the reference formula).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NNEG = -1e30


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
    """One (batch row, time block): softmax rows in fp32, dot each row with
    the previous row (carried across blocks in `prev_ref`), emit the
    not-blank posterior. Block 0 of each batch row starts from a zero
    previous row — dot 0, matching the XLA path's zero-padded frame -1."""
    i = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)                        # [tc, vp]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    x = jnp.where(lane < v_real, x, NNEG)                   # mask pad lanes
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)              # [tc, vp]

    carry = jnp.where(i == 0, jnp.zeros_like(prev_ref[...]), prev_ref[...])
    prev = jnp.concatenate([carry, p[:-1]], axis=0)         # [tc, vp]
    dot = jnp.sum(p * prev, axis=-1)                        # [tc]
    blank_p = p[:, blank]
    repeat = dot - blank_p * prev[:, blank]
    o_ref[0, :] = 1.0 - (repeat + blank_p)
    prev_ref[...] = p[-1:]


def not_blank_probs_pallas(logits: jnp.ndarray, blank: int = 0,
                           interpret: bool = False) -> jnp.ndarray:
    """[B, T, V] logits (any float dtype) -> stop-gradient fp32 [B, T]."""
    b, t, v = logits.shape
    vp = _round_up(v, 128)
    tc = min(128, _round_up(t, 8))
    tp = _round_up(t, tc)
    # stop the gradient at the INPUT: the kernel has no jvp rule, and the
    # function's contract is stop-gradient anyway (the reference detaches)
    x = jnp.pad(jax.lax.stop_gradient(logits),
                ((0, 0), (0, tp - t), (0, vp - v)))
    out = pl.pallas_call(
        functools.partial(_nb_kernel, blank=blank, v_real=v),
        grid=(b, tp // tc),
        in_specs=[pl.BlockSpec((1, tc, vp), lambda bb, ii: (bb, ii, 0))],
        out_specs=pl.BlockSpec((1, tc), lambda bb, ii: (bb, ii)),
        out_shape=jax.ShapeDtypeStruct((b, tp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, vp), jnp.float32)],
        interpret=interpret,
    )(x)
    return jax.lax.stop_gradient(out[:, :t])
