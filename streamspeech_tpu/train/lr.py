"""LR schedules. inverse_sqrt matches
`fairseq/fairseq/optim/lr_scheduler/inverse_square_root_schedule.py`:
linear warmup from warmup_init_lr to lr over warmup_updates, then
lr * sqrt(warmup_updates) / sqrt(step)."""

from __future__ import annotations

import jax.numpy as jnp
import optax

from streamspeech_tpu.registry import LR_SCHEDULERS


@LR_SCHEDULERS.register("inverse_sqrt")
def inverse_sqrt(lr: float, warmup_updates: int, warmup_init_lr: float = 1e-7
                 ) -> optax.Schedule:
    decay_factor = lr * warmup_updates ** 0.5

    def schedule(step):
        step = jnp.maximum(step, 1)
        warm = warmup_init_lr + step * (lr - warmup_init_lr) / warmup_updates
        decay = decay_factor * (step.astype(jnp.float32) ** -0.5)
        return jnp.where(step < warmup_updates, warm, decay)

    return schedule


@LR_SCHEDULERS.register("fixed")
def fixed(lr: float, *_args, **_kw) -> optax.Schedule:
    return lambda step: jnp.asarray(lr)
