"""Lightweight and dynamic convolutions (Pay Less Attention, Wu et al. 2019).

TPU-native rebuild of the reference modules
`fairseq/fairseq/modules/lightweight_convolution.py:50-310` (LightweightConv1d
/ LightweightConv1dTBC) and `fairseq/fairseq/modules/dynamic_convolution.py:75-440`
(DynamicConv1dTBC), whose CUDA kernels live in
`fairseq/fairseq/modules/{lightconv,dynamicconv}_layer/` (fairseq/setup.py:60-130).

Design (TPU-first, no unfold/as_strided):

- LightweightConv is a depthwise convolution whose H per-head taps are shared
  across C/H channels — one `lax.conv_general_dilated` with
  `feature_group_count=C` (XLA tiles depthwise convs onto the VPU/MXU); the
  softmax-normalized kernel is broadcast head->channels at trace time.
- DynamicConv predicts a K-tap filter per (batch, time, head) with a Dense
  layer (an MXU matmul), builds the K-tap input window as a static stack of
  shifted slices (K is a compile-time constant), and contracts with one
  einsum — a batched matmul on the MXU, replacing the reference's
  `torch.bmm(x_unfold, weight)` (`dynamic_convolution.py:238`).
- Both take batch-first [B, T, C] (repo convention) instead of fairseq's TBC.
- `step` gives exact O(1)-per-frame causal inference with a [B, K-1, C] tail
  cache — the functional analogue of the reference's `incremental_state`
  input buffer (`dynamic_convolution.py:199-209`).

Weight shapes mirror fairseq's parameters so checkpoint mapping stays
mechanical: LightweightConv.weight is (H, 1, K); DynamicConv's filter
projection is a Dense(query_size -> H*K).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import lax


def _pad_time(x: jnp.ndarray, left: int, right: int) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (left, right), (0, 0)))


def _unfold_windows(x: jnp.ndarray, kernel_size: int,
                    padding_l: int) -> jnp.ndarray:
    """[B, T, C] -> [B, T, K, C]; window k holds x[t + k - padding_l].

    Matches `unfold1d` (fairseq/fairseq/modules/unfold.py:9-19) semantics with
    zero padding, but as K static slices of one padded buffer instead of an
    as_strided view — XLA fuses the stack into the consuming contraction.
    """
    K = kernel_size
    if K == 1:
        return x[:, :, None, :]
    T = x.shape[1]
    xp = _pad_time(x, padding_l, K - 1 - padding_l)
    return jnp.stack([xp[:, k:k + T] for k in range(K)], axis=2)


class LightweightConv(nn.Module):
    """Reference: LightweightConv1dTBC, lightweight_convolution.py:137-310."""

    input_size: int
    kernel_size: int = 1
    padding_l: Optional[int] = None
    num_heads: int = 1
    weight_softmax: bool = False
    weight_dropout: float = 0.0
    use_bias: bool = False

    def setup(self):
        if self.input_size % self.num_heads:
            raise ValueError("input_size must divide num_heads")
        # (H, 1, K) — same layout as the reference parameter
        self.weight = self.param(
            "weight", nn.initializers.xavier_uniform(),
            (self.num_heads, 1, self.kernel_size))
        if self.use_bias:
            self.bias = self.param("bias", nn.initializers.zeros,
                                   (self.input_size,))
        self.dropout_module = nn.Dropout(self.weight_dropout)

    def _kernel(self, deterministic: bool) -> jnp.ndarray:
        w = self.weight[:, 0, :]  # [H, K]
        if self.weight_softmax:
            w = nn.softmax(w, axis=-1)
        # DropConnect on the shared taps (lightweight_convolution.py:230)
        w = self.dropout_module(w, deterministic=deterministic)
        R = self.input_size // self.num_heads
        return jnp.repeat(w, R, axis=0)  # [C, K]

    def __call__(self, x: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        """x: [B, T, C] -> [B, T, C]."""
        K = self.kernel_size
        pad_l = self.padding_l if self.padding_l is not None else K - 1
        w = self._kernel(deterministic)  # [C, K]
        # depthwise conv: NWC input, kernel [K, 1, C], one group per channel
        out = lax.conv_general_dilated(
            x, w.T[:, None, :], window_strides=(1,),
            padding=[(pad_l, K - 1 - pad_l)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=self.input_size)
        if self.use_bias:
            out = out + self.bias
        return out

    def step(self, x_t: jnp.ndarray, cache: jnp.ndarray,
             deterministic: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One causal frame. x_t: [B, C]; cache: [B, K-1, C] previous frames
        (zeros initially). Requires padding_l == K-1 (causal). Returns
        (y_t [B, C], new_cache)."""
        w = self._kernel(deterministic)  # [C, K]
        window = jnp.concatenate([cache, x_t[:, None, :]], axis=1)  # [B,K,C]
        y = jnp.einsum("bkc,ck->bc", window, w)
        if self.use_bias:
            y = y + self.bias
        return y, window[:, 1:]


class DynamicConv(nn.Module):
    """Reference: DynamicConv1dTBC, dynamic_convolution.py:75-330."""

    input_size: int
    kernel_size: int = 1
    padding_l: Optional[int] = None
    num_heads: int = 1
    weight_softmax: bool = False
    weight_dropout: float = 0.0
    renorm_padding: bool = False
    use_bias: bool = False        # bias of the filter projection
    conv_bias: bool = False
    query_size: Optional[int] = None

    def setup(self):
        if self.input_size % self.num_heads:
            raise ValueError("input_size must divide num_heads")
        self.weight_linear = nn.Dense(
            self.num_heads * self.kernel_size, use_bias=self.use_bias,
            kernel_init=nn.initializers.xavier_uniform(),
            name="weight_linear")
        if self.conv_bias:
            self.conv_bias_param = self.param(
                "conv_bias", nn.initializers.zeros, (self.input_size,))
        self.dropout_module = nn.Dropout(self.weight_dropout)

    def _filters(self, query: jnp.ndarray, valid: Optional[jnp.ndarray],
                 deterministic: bool) -> jnp.ndarray:
        """[B, T, Cq] -> normalized per-position taps [B, T, H, K]."""
        B, T = query.shape[:2]
        w = self.weight_linear(query).reshape(
            B, T, self.num_heads, self.kernel_size)
        if self.weight_softmax:
            if self.renorm_padding and valid is not None:
                # only taps inside the sequence participate in the softmax
                # (dynamic_convolution.py:267-292 band-matrix renorm)
                w = jnp.where(valid[:, :, None, :], w, -jnp.inf)
                w = nn.softmax(w, axis=-1)
            else:
                w = nn.softmax(w, axis=-1)
        if self.renorm_padding and valid is not None:
            w = jnp.where(valid[:, :, None, :], w, 0.0)
        return self.dropout_module(w, deterministic=deterministic)

    def _tap_validity(self, T: int, pad_l: int) -> jnp.ndarray:
        """[T, K] True where tap k of output t lands inside [0, T)."""
        t = jnp.arange(T)[:, None]
        k = jnp.arange(self.kernel_size)[None, :]
        src = t + k - pad_l
        return (src >= 0) & (src < T)

    def __call__(self, x: jnp.ndarray, query: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        """x: [B, T, C] -> [B, T, C]; query defaults to x."""
        B, T, C = x.shape
        K, H = self.kernel_size, self.num_heads
        R = C // H
        pad_l = self.padding_l if self.padding_l is not None else K - 1
        valid = None
        if self.renorm_padding:
            valid = jnp.broadcast_to(self._tap_validity(T, pad_l)[None],
                                     (B, T, K))
        w = self._filters(x if query is None else query, valid, deterministic)
        xu = _unfold_windows(x, K, pad_l)            # [B, T, K, C]
        xu = xu.reshape(B, T, K, H, R)
        out = jnp.einsum("bthk,btkhr->bthr", w, xu).reshape(B, T, C)
        if self.conv_bias:
            out = out + self.conv_bias_param
        return out

    def step(self, x_t: jnp.ndarray, cache: jnp.ndarray,
             query_t: Optional[jnp.ndarray] = None,
             deterministic: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One causal frame. x_t: [B, C]; cache: [B, K-1, C] (zeros initially).
        Requires padding_l == K-1. Returns (y_t [B, C], new_cache)."""
        B, C = x_t.shape
        K, H = self.kernel_size, self.num_heads
        R = C // H
        q = (x_t if query_t is None else query_t)[:, None, :]
        w = self._filters(q, None, deterministic)[:, 0]  # [B, H, K]
        window = jnp.concatenate([cache, x_t[:, None, :]], axis=1)  # [B,K,C]
        y = jnp.einsum("bhk,bkhr->bhr", w,
                       window.reshape(B, K, H, R)).reshape(B, C)
        if self.conv_bias:
            y = y + self.conv_bias_param
        return y, window[:, 1:]
