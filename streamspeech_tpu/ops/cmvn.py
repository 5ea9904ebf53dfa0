"""Cepstral mean/variance normalization transforms.

Global CMVN (`fairseq/fairseq/data/audio/feature_transforms/global_cmvn.py`): subtract a
precomputed mean and divide by std loaded from gcmvn.npz (keys "mean", "std").
Utterance CMVN (`.../utterance_cmvn.py`): per-utterance mean/var normalization.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class GlobalCMVN:
    """Pure numpy on purpose: the streaming agents apply this per 320 ms chunk
    on the host — eager jnp elementwise ops here would each be a ~30 ms RPC
    through a remote-accelerator tunnel (CLAUDE.md RPC cost model)."""

    def __init__(self, mean: np.ndarray, std: np.ndarray):
        self.mean = np.asarray(mean, dtype=np.float32)
        self.std = np.asarray(std, dtype=np.float32)

    @classmethod
    def from_npz(cls, path: str) -> "GlobalCMVN":
        stats = np.load(path)
        return cls(stats["mean"], stats["std"])

    def __call__(self, x) -> np.ndarray:
        return (np.asarray(x) - self.mean) / self.std


def utterance_cmvn(x: jnp.ndarray, norm_means: bool = True, norm_vars: bool = True,
                   eps: float = 1e-10) -> jnp.ndarray:
    mean = jnp.mean(x, axis=0, keepdims=True)
    if norm_means:
        x = x - mean
    if norm_vars:
        var = jnp.mean(jnp.square(x), axis=0, keepdims=True) if norm_means else \
            jnp.var(x, axis=0, keepdims=True)
        x = x / jnp.sqrt(var + eps)
    return x
