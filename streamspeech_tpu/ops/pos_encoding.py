"""Sinusoidal positional encodings (absolute and relative/espnet), pure jnp.

- Absolute sinusoidal embedding matches fairseq's SinusoidalPositionalEmbedding
  (`fairseq/fairseq/modules/sinusoidal_positional_embedding.py`): half-dim sin|cos
  concatenation with padding_idx offset semantics.
- Relative encoding matches espnet's RelPositionalEncoding
  (`fairseq/fairseq/modules/positional_encoding.py:66-130`): table over relative
  positions [+T-1 ... -(T-1)] with pe(p)[2k] = sin(p·div_k), pe(p)[2k+1] = cos(p·div_k).
"""

from __future__ import annotations

import math

import numpy as np


def sinusoidal_embedding(num_positions: int, dim: int, padding_idx: int = 1) -> np.ndarray:
    """fairseq-style table [num_positions + padding_idx + 1, dim]; position ids are
    offset by padding_idx + 1 (`utils.make_positions`)."""
    half = dim // 2
    emb = math.log(10000.0) / (half - 1)
    freqs = np.exp(np.arange(half, dtype=np.float32) * -emb)
    n = num_positions + padding_idx + 1
    pos = np.arange(n, dtype=np.float32)[:, None] * freqs[None, :]
    table = np.concatenate([np.sin(pos), np.cos(pos)], axis=1)
    if dim % 2 == 1:
        table = np.concatenate([table, np.zeros((n, 1), dtype=np.float32)], axis=1)
    table[padding_idx, :] = 0.0
    return table.astype(np.float32)


def espnet_abs_encoding(max_len: int, dim: int) -> np.ndarray:
    """[max_len, dim]; pe[t, 2k] = sin(t·div_k), pe[t, 2k+1] = cos(t·div_k)."""
    pos = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, dim, 2, dtype=np.float32) * -(math.log(10000.0) / dim))
    pe = np.zeros((max_len, dim), dtype=np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


def rel_pos_encoding(max_len: int, dim: int) -> np.ndarray:
    """[2*max_len - 1, dim] table over relative positions r = max_len-1 ... -(max_len-1).

    Index u corresponds to relative position r = (max_len - 1) - u, with
    pe(r)[2k] = sin(r·div_k) and pe(r)[2k+1] = cos(r·div_k) for r >= 0, and the
    espnet "negative" half uses sin(-|r|·div) / cos(-|r|·div) — i.e. exactly
    sin(r·div), cos(|r|·div). Matches `positional_encoding.py:84-112`.
    """
    div = np.exp(np.arange(0, dim, 2, dtype=np.float32) * -(math.log(10000.0) / dim))
    r = (max_len - 1) - np.arange(2 * max_len - 1, dtype=np.float32)
    pe = np.zeros((2 * max_len - 1, dim), dtype=np.float32)
    pe[:, 0::2] = np.sin(r[:, None] * div[None, :])
    pe[:, 1::2] = np.cos(np.abs(r)[:, None] * div[None, :])
    return pe.astype(np.float32)
