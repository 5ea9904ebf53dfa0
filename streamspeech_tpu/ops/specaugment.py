"""SpecAugment (train-time feature transform), jittable with static shapes.

Reference (`fairseq/fairseq/data/audio/feature_transforms/specaugment.py` with
config_gcmvn.yaml values: freq_mask_N=1 F=27, time_mask_N=1 T=100 p=1.0, no warp).
Masked regions are replaced with the per-utterance feature mean (the reference uses
``mask_value = spectrogram.mean()``? — it fills with zeros after global CMVN; we match
its default fill of 0.0).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("freq_mask_n", "freq_mask_f", "time_mask_n",
                                   "time_mask_t", "time_mask_p"))
def specaugment(
    rng: jax.Array,
    x: jnp.ndarray,  # [T, F]
    length: jnp.ndarray,  # scalar int: valid frames
    freq_mask_n: int = 1,
    freq_mask_f: int = 27,
    time_mask_n: int = 1,
    time_mask_t: int = 100,
    time_mask_p: float = 1.0,
) -> jnp.ndarray:
    t_max, f_dim = x.shape
    rngs = jax.random.split(rng, 2 * (freq_mask_n + time_mask_n))
    r = 0

    freq_idx = jnp.arange(f_dim)
    for _ in range(freq_mask_n):
        f = jax.random.randint(rngs[r], (), 0, freq_mask_f + 1)
        f0 = jax.random.randint(rngs[r + 1], (), 0, jnp.maximum(f_dim - f, 1))
        r += 2
        mask = (freq_idx >= f0) & (freq_idx < f0 + f)
        x = jnp.where(mask[None, :], 0.0, x)

    time_idx = jnp.arange(t_max)
    max_t = jnp.minimum(time_mask_t, (length * time_mask_p).astype(jnp.int32))
    for _ in range(time_mask_n):
        t = jax.random.randint(rngs[r], (), 0, jnp.maximum(max_t, 1) + 1)
        t0 = jax.random.randint(rngs[r + 1], (), 0, jnp.maximum(length - t, 1))
        r += 2
        mask = (time_idx >= t0) & (time_idx < t0 + t)
        x = jnp.where(mask[:, None], 0.0, x)
    return x
