"""Plain 1-D convolution helpers (batch-first [B, T, C]) with torch-compatible
padding semantics, used by the vocoder stack. XLA lowers these onto the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DN = ("NWC", "WIO", "NWC")


def conv1d(x: jnp.ndarray, w: jnp.ndarray, b=None, stride: int = 1,
           dilation: int = 1, padding: int = 0, groups: int = 1) -> jnp.ndarray:
    """x [B, T, Cin], w [K, Cin/groups, Cout] (torch Conv1d semantics with
    symmetric integer padding)."""
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(padding, padding)],
        rhs_dilation=(dilation,), dimension_numbers=DN,
        feature_group_count=groups)
    if b is not None:
        y = y + b
    return y


def conv_transpose1d(x: jnp.ndarray, w: jnp.ndarray, b=None, stride: int = 1,
                     padding: int = 0) -> jnp.ndarray:
    """torch ConvTranspose1d: out_len = (T-1)*stride - 2*padding + K.

    Implemented as an input-dilated convolution with the spatially-flipped kernel
    (the standard transpose-conv identity). w is [K, Cin, Cout] (NOTE: torch
    stores ConvTranspose1d weight as [Cin, Cout, K]; the converter transposes).
    """
    k = w.shape[0]
    y = jax.lax.conv_general_dilated(
        x, jnp.flip(w, axis=0), window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,), dimension_numbers=DN)
    if b is not None:
        y = y + b
    return y
