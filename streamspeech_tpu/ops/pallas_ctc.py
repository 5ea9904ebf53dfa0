"""Pallas TPU kernel for the CTC alpha/beta dynamic program.

Why a kernel: the CTC recursion is sequential in T, and at the shapes the
StreamSpeech criterion runs it (unit CTC: T=1200 x25-upsampled frames,
S=2N+1=513 states; plus two aux CTCs at T=256), an XLA `lax.scan` pays a
per-iteration loop overhead that dwarfs the arithmetic — the measured v5e
train-step decomposition put the three CTC losses at ~15.7 ms of a ~24 ms
step (~2/3), while the DP itself is ~100 MFLOP of elementwise work. Moving
the T-loop inside one Pallas program keeps alpha ([B, S]) resident in VMEM
with zero per-step dispatch, and the BlockSpec grid double-buffers the
[B, TC, S] log-prob blocks HBM->VMEM while the VPU runs the recursion.

Semantics match `ctc_neg_log_likelihood` in ops/ctc.py (itself matching
``optax.ctc_loss`` / torch ``F.ctc_loss``; reference behavior
`researches/ctc_unity/criterions/speech_to_speech_ctc_asr_st_criterion.py:223-232`):
alpha recursion over the blank-interleaved extended label sequence, padded
frames hold state, per-sequence -log p(labels | logits).

The backward pass is a custom_vjp running the beta recursion in a second
kernel over a REVERSED block grid (index_map serves blocks last-to-first),
emitting the occupancy gradient d nll / d lp_ext[t, s] =
-exp(alpha[t,s] + beta[t,s] - logZ) fused in the same sweep — no autodiff
residuals beyond the forward alphas.

Everything is expressed through additive fp32 masks (0 or NNEG) so the
kernels never index with integers:
  skipmask[b, s]  : 0 where state s may skip from s-2 (label change), NNEG else
  initmask[b, s]  : 0 at state 0 (and 1 when the label is non-empty), NNEG else
  endmask[b, s]   : 0 at state 2*len (and 2*len-1 when non-empty), NNEG else
  validmask[b, t] : 1.0 for real frames, 0.0 for padding (state holds)
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NNEG = -1e30  # effective -inf that survives arithmetic


def _shift_right(a: jnp.ndarray, k: int) -> jnp.ndarray:
    """Shift along the state (lane) axis with NNEG fill: out[:, s] = a[:, s-k]."""
    r = jnp.roll(a, k, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    return jnp.where(lane < k, NNEG, r)


def _shift_left(a: jnp.ndarray, k: int) -> jnp.ndarray:
    """out[:, s] = a[:, s+k] (NNEG fill at the top)."""
    r = jnp.roll(a, -k, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    return jnp.where(lane >= a.shape[1] - k, NNEG, r)


def _lse3(a0, a1, a2):
    m = jnp.maximum(jnp.maximum(a0, a1), a2)
    out = m + jnp.log(jnp.exp(a0 - m) + jnp.exp(a1 - m) + jnp.exp(a2 - m))
    return jnp.where(m <= NNEG / 2, NNEG, out)


def _alpha_kernel(init_ref, skip_ref, valid_ref, lp_ref, out_ref, acc, *, tc):
    # the row loop is PYTHON-unrolled: Mosaic requires statically-provable
    # sublane offsets, and the per-row work is a handful of [B, S] vector ops
    g = pl.program_id(0)
    for r in range(tc):
        lp_t = lp_ref[:, r, :]
        a = acc[...]
        new = _lse3(a, _shift_right(a, 1),
                    _shift_right(a, 2) + skip_ref[...]) + lp_t
        first = (g * tc + r) == 0
        v = valid_ref[:, r, :]  # [B, S] broadcast of the frame validity
        a2 = jnp.where(first, init_ref[...] + lp_t,
                       jnp.where(v > 0, new, a))
        acc[...] = a2
        out_ref[:, r, :] = a2


def _beta_kernel(endmask_ref, skip_ref, zbias_ref, valid_ref, lp_ref,
                 alpha_ref, out_ref, beta, *, tc):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        beta[...] = endmask_ref[...]

    for r in range(tc - 1, -1, -1):
        b_t = beta[...]
        v = valid_ref[:, r, :]
        # occupancy gradient at t (min(.,0) also guards the NNEG-logZ case:
        # impossible alignments produce exactly-zero grads, matching the
        # criterion's zero_infinity)
        gamma = jnp.exp(jnp.minimum(
            alpha_ref[:, r, :] + b_t + zbias_ref[...], 0.0))
        out_ref[:, r, :] = jnp.where(v > 0, -gamma, 0.0)
        # beta_{t-1}[s] = lse over successors {s, s+1, s+2 if skip[s+2]} of
        # beta_t[s'] + lp_t[s']; padded frames hold
        q = b_t + lp_ref[:, r, :]
        newbeta = _lse3(q, _shift_left(q, 1),
                        _shift_left(q + skip_ref[...], 2))
        beta[...] = jnp.where(v > 0, newbeta, b_t)


def _run_alpha(lp_ext, aux, tc, interpret):
    b, t, s = lp_ext.shape
    grid = (t // tc,)
    return pl.pallas_call(
        functools.partial(_alpha_kernel, tc=tc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, s), lambda g: (0, 0)),
            pl.BlockSpec((b, s), lambda g: (0, 0)),
            pl.BlockSpec((b, tc, s), lambda g: (0, g, 0)),
            pl.BlockSpec((b, tc, s), lambda g: (0, g, 0)),
        ],
        out_specs=pl.BlockSpec((b, tc, s), lambda g: (0, g, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, s), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, s), jnp.float32)],
        interpret=interpret,
    )(aux["initmask"], aux["skipmask"], aux["validmask"], lp_ext)


def _run_beta_grad(lp_ext, aux, alpha_full, zbias, tc, interpret):
    b, t, s = lp_ext.shape
    nblk = t // tc
    rev3 = lambda g: (0, nblk - 1 - g, 0)  # noqa: E731
    return pl.pallas_call(
        functools.partial(_beta_kernel, tc=tc),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((b, s), lambda g: (0, 0)),
            pl.BlockSpec((b, s), lambda g: (0, 0)),
            pl.BlockSpec((b, s), lambda g: (0, 0)),
            pl.BlockSpec((b, tc, s), rev3),
            pl.BlockSpec((b, tc, s), rev3),
            pl.BlockSpec((b, tc, s), rev3),
        ],
        out_specs=pl.BlockSpec((b, tc, s), rev3),
        out_shape=jax.ShapeDtypeStruct((b, t, s), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, s), jnp.float32)],
        interpret=interpret,
    )(aux["endmask"], aux["skipmask"], zbias, aux["validmask"], lp_ext,
      alpha_full)


def _nll_from_alpha(alpha_full, endmask):
    last = alpha_full[:, -1, :] + endmask
    m = jnp.max(last, axis=-1)
    logz = m + jnp.log(jnp.sum(jnp.exp(last - m[:, None]), axis=-1))
    logz = jnp.where(m <= NNEG / 2, NNEG, logz)
    return -logz, logz


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def ctc_nll_pallas(lp_ext, aux, tc: int, interpret: bool):
    """Per-sequence CTC nll from pre-gathered extended-state log-probs.

    lp_ext: [B, T, S] fp32 (B mult of 8, T mult of tc, S mult of 128, pads
    filled with NNEG / validmask 0). aux: dict of fp32 masks (see module
    docstring). Differentiable in lp_ext only.
    """
    alpha_full = _run_alpha(lp_ext, aux, tc, interpret)
    nll, _ = _nll_from_alpha(alpha_full, aux["endmask"])
    return nll


def _fwd(lp_ext, aux, tc, interpret):
    alpha_full = _run_alpha(lp_ext, aux, tc, interpret)
    nll, logz = _nll_from_alpha(alpha_full, aux["endmask"])
    return nll, (lp_ext, aux, alpha_full, logz)


def _bwd(tc, interpret, res, ct):
    lp_ext, aux, alpha_full, logz = res
    b, _, s = lp_ext.shape
    zbias = jnp.where(logz > NNEG / 2, -logz, NNEG)
    zbias = jnp.broadcast_to(zbias[:, None], (b, s))
    ndlp = _run_beta_grad(lp_ext, aux, alpha_full, zbias, tc, interpret)
    d_lp = ndlp * ct[:, None, None]
    d_aux = jax.tree.map(jnp.zeros_like, aux)
    return d_lp, d_aux


ctc_nll_pallas.defvjp(_fwd, _bwd)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pallas_ctc_available() -> bool:
    if os.environ.get("STREAMSPEECH_DISABLE_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _ext_and_masks(logits, logit_lengths, labels, label_lengths, blank_id):
    """Unpadded per-head DP inputs: lp_ext [B, T, S] + the additive masks
    ([B, S]) + frame validity [B, T]."""
    from streamspeech_tpu.ops.ctc import gather_extended_logprobs_from_logits

    b, t, _ = logits.shape
    n = labels.shape[1]
    s = 2 * n + 1

    lbl_prev = jnp.concatenate([jnp.full((b, 1), -1, labels.dtype),
                                labels[:, :-1]], axis=1)
    skip = jnp.zeros((b, s), bool).at[:, 1::2].set(labels != lbl_prev)

    # one-hot matmul, NOT take_along_axis (the gather's transpose is a
    # serialized duplicate-index scatter), on RAW logits with a fused
    # [B, T] logsumexp — the [B, T, V] fp32 log-softmax never materializes
    lp_ext = gather_extended_logprobs_from_logits(logits, labels, blank_id)

    has_label = label_lengths > 0
    sidx = jnp.arange(s)[None, :]
    initmask = jnp.where(
        (sidx == 0) | ((sidx == 1) & has_label[:, None]), 0.0, NNEG)
    end = 2 * label_lengths
    endmask = jnp.where(
        (sidx == end[:, None])
        | ((sidx == end[:, None] - 1) & has_label[:, None]), 0.0, NNEG)
    skipmask = jnp.where(skip, 0.0, NNEG)
    validmask = (jnp.arange(t)[None, :]
                 < logit_lengths[:, None]).astype(jnp.float32)
    return {"lp_ext": lp_ext, "initmask": initmask, "endmask": endmask,
            "skipmask": skipmask, "validmask": validmask}


def _run_padded(parts, tc_cap: int, interpret: bool) -> jnp.ndarray:
    """Pad a head's DP inputs to tile boundaries and run the kernels.

    parts: dict from _ext_and_masks, possibly batch-concatenated across
    heads (state axes pre-padded to a common S by the caller). Returns the
    per-row nll for the REAL rows (padding rows sliced off by the caller).
    """
    lp_ext = parts["lp_ext"]
    b, t, s = lp_ext.shape
    # pad to tile boundaries: B->8, S->128 lanes, T->the time-block size (the
    # in-kernel row loop is python-unrolled, so keep blocks modest)
    bp = _round_up(b, 8)
    sp = _round_up(s, 128)
    # VMEM budget: the beta kernel holds ~4 [bp, tc, sp] f32 blocks (3 inputs
    # + grad out), double-buffered by the grid pipeline -> ~8 live copies.
    # Cap tc so that fits the ~16 MB scoped-VMEM limit with headroom (a fixed
    # tc=32 OOMed the compile at B=32: 8 x 32*32*640*4B = 21 MB > 16 MB).
    vmem_budget = 8 * 1024 * 1024
    tc_fit = max(8, (vmem_budget // (8 * bp * sp * 4)) // 8 * 8)
    tc = min(tc_cap, tc_fit, _round_up(t, 8))
    tp = _round_up(t, tc)
    lp_ext = jnp.pad(lp_ext, ((0, bp - b), (0, tp - t), (0, sp - s)),
                     constant_values=NNEG)
    valid3 = jnp.broadcast_to(
        jnp.pad(parts["validmask"], ((0, bp - b), (0, tp - t)))[:, :, None],
        (bp, tp, sp))
    pad2 = lambda a: jnp.pad(  # noqa: E731
        a, ((0, bp - b), (0, sp - s)),
        constant_values=NNEG).astype(jnp.float32)
    aux = {
        "initmask": pad2(parts["initmask"]),
        "endmask": pad2(parts["endmask"]),
        "skipmask": pad2(parts["skipmask"]),
        "validmask": valid3,
    }
    return ctc_nll_pallas(lp_ext, aux, tc, interpret)


def ctc_neg_log_likelihood_pallas(
    logits: jnp.ndarray,        # [B, T, V]
    logit_lengths: jnp.ndarray, # [B]
    labels: jnp.ndarray,        # [B, N]
    label_lengths: jnp.ndarray, # [B]
    blank_id: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for ops.ctc.ctc_neg_log_likelihood on the Pallas path: builds
    lp_ext + the additive masks, pads to tile boundaries, runs the kernels."""
    parts = _ext_and_masks(logits, logit_lengths, labels, label_lengths,
                           blank_id)
    b = logits.shape[0]
    return _run_padded(parts, 32, interpret)[:b]


def ctc_neg_log_likelihood_pallas_multi(
    heads, blank_id: int, interpret: bool = False,
):
    """ONE DP kernel pass over several CTC heads that share the frame axis.

    heads: sequence of (logits [B, T, Vh], logit_lengths, labels [B, Nh],
    label_lengths). The per-head extended-state tensors are padded to a
    common S and concatenated along batch, so the sequential T-loop — whose
    per-iteration vector work is tiny and launch/loop overhead dominated —
    runs ONCE over sum(B) rows instead of once per head. Numerics per head
    are identical to separate calls (rows are independent; padded states
    carry NNEG). Used by the criterion to fuse the ASR + ST aux CTCs
    (same encoder frames, blank=0,
    `researches/ctc_unity/criterions/speech_to_speech_ctc_asr_st_criterion.py:70-232`).

    Returns a list of per-sequence nll arrays, one per head.
    """
    parts = [_ext_and_masks(lo, ll, la, ln, blank_id)
             for (lo, ll, la, ln) in heads]
    t = parts[0]["lp_ext"].shape[1]
    for p in parts[1:]:
        if p["lp_ext"].shape[1] != t:
            raise ValueError("multi-head CTC requires a shared frame axis")
    s_common = max(p["lp_ext"].shape[2] for p in parts)

    def pad_s(a, axis):
        pad = [(0, 0)] * a.ndim
        pad[axis] = (0, s_common - a.shape[axis])
        return jnp.pad(a, pad, constant_values=NNEG)

    merged = {
        "lp_ext": jnp.concatenate([pad_s(p["lp_ext"], 2) for p in parts], 0),
        "initmask": jnp.concatenate([pad_s(p["initmask"], 1) for p in parts], 0),
        "endmask": jnp.concatenate([pad_s(p["endmask"], 1) for p in parts], 0),
        "skipmask": jnp.concatenate([pad_s(p["skipmask"], 1) for p in parts], 0),
        "validmask": jnp.concatenate([p["validmask"] for p in parts], 0),
    }
    nll = _run_padded(merged, 32, interpret)
    out, off = [], 0
    for (lo, _, _, _) in heads:
        out.append(nll[off:off + lo.shape[0]])
        off += lo.shape[0]
    return out
