"""Monotonic-attention expected alignment (MMA / simultaneous-MT training op).

TPU-native rebuild of the reference's native extension
`fairseq/examples/operators/alignment_train_cpu.cpp:80-153` (and its CUDA twin
`alignment_train_kernel.cu`), exposed there as
`alignment_train_cpu(p_choose, alpha, eps)`.

The recurrence (Raffel et al. 2017 monotonic attention, computed in parallel):

    cumprod_1mp[i, j]  = prod_{k<j} (1 - p_choose[i, k])     (exclusive)
    alpha[i]           = p_choose[i] * cumprod_1mp[i]
                         * cumsum_j( alpha[i-1] / clamp(cumprod_1mp[i], eps, 1) )
    alpha[-1]          = one-hot at source position 0

Each target row is one vectorized cumsum over source — a `lax.scan` over
target steps carries only the previous row, so the whole op compiles to one
fused loop with [B, S]-wide VPU work per step (no per-element host loop like
the C++ reference). Per-element clamp of the output to [0, 1] matches
`alignment_train_cpu.cpp:125` (the clamped value feeds the next row; the
in-row cumsum accumulator stays unclamped).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def exclusive_cumprod(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """[x1, x2, ...] -> [1, x1, x1*x2, ...] (alignment_train_cpu.cpp:14-52)."""
    c = jnp.cumprod(x, axis=axis)
    one = jnp.ones_like(lax.slice_in_dim(c, 0, 1, axis=axis))
    return jnp.concatenate(
        [one, lax.slice_in_dim(c, 0, c.shape[axis] - 1, axis=axis)],
        axis=axis)


def expected_alignment_from_p_choose(p_choose: jnp.ndarray,
                                     eps: float = 1e-6) -> jnp.ndarray:
    """p_choose: [B, T_tgt, S_src] selection probabilities in [0, 1].

    Returns alpha [B, T_tgt, S_src], the expected monotonic alignment.
    Differentiable end to end (the reference's extension exists because torch
    lacks an exclusive cumprod + row recurrence; XLA scans/cumsums express it
    directly, and autodiff flows through for free — no custom backward).
    """
    B, T, S = p_choose.shape
    cumprod_1mp = exclusive_cumprod(1.0 - p_choose, axis=-1)  # [B, T, S]
    denom = jnp.clip(cumprod_1mp, eps, 1.0)

    alpha_init = jnp.zeros((B, S), p_choose.dtype).at[:, 0].set(1.0)

    def row(alpha_prev, inputs):
        p_row, c_row, d_row = inputs  # each [B, S]
        scan = jnp.cumsum(alpha_prev / d_row, axis=-1)
        out = jnp.clip(scan * p_row * c_row, 0.0, 1.0)
        return out, out

    # scan over target dimension; inputs time-major [T, B, S]
    _, alpha = lax.scan(
        row, alpha_init,
        (jnp.swapaxes(p_choose, 0, 1), jnp.swapaxes(cumprod_1mp, 0, 1),
         jnp.swapaxes(denom, 0, 1)))
    return jnp.swapaxes(alpha, 0, 1)


def expected_soft_attention(alpha: jnp.ndarray, soft_energy: jnp.ndarray,
                            eps: float = 1e-6) -> jnp.ndarray:
    """MMA-style expected soft attention beta from alignment alpha.

    beta[i, j] = sum_{k >= j} alpha[i, k] * exp(u[i, j]) / cumsum_{l<=k} exp(u)
    (monotonic infinite-lookback attention; the reference computes this in
    python around the native alpha op). soft_energy: [B, T, S].
    """
    exp_u = jnp.exp(soft_energy
                    - jnp.max(soft_energy, axis=-1, keepdims=True))
    inner = jnp.cumsum(exp_u, axis=-1)
    # reverse-cumsum over k of alpha / inner
    ratio = alpha / jnp.maximum(inner, eps)
    rev = jnp.flip(jnp.cumsum(jnp.flip(ratio, axis=-1), axis=-1), axis=-1)
    return exp_u * rev
