"""Blockwise Model-Update Filtering (BMUF) — TPU-native local-SGD variant.

Rebuild of `fairseq/fairseq/optim/bmuf.py:15-200` (FairseqBMUF, Chen & Huo
2016): each data-parallel worker takes LOCAL optimizer steps without gradient
sync; every `sync_iter` updates the workers reconcile with a block-momentum
filter over the *model-space* delta:

    grad(t)          = global(t-1) - local_params          (per worker)
    grad(t)          = mean over workers                   (all-reduce)
    smoothed(t)      = block_momentum * smoothed(t-1) + block_lr * grad(t)
    params           = global(t-1) - smoothed(t)
    params          -= block_momentum * smoothed(t)        (if use_nbm,
                                                            Nesterov)
    global(t)        = params

(`bmuf.py:173-200 _update_global_model`). With block_momentum == 0 the sync
degenerates to plain parameter averaging (`bmuf.py:166-170`).

Functional design: state is an explicit pytree (no optimizer wrapping); the
collective is one `lax.pmean` over the data mesh axis inside whatever
pjit/shard_map training step the caller runs. `bmuf_step` applies the sync
conditionally on the update counter with `lax.cond`, so the whole schedule
stays inside one compiled program — no host round trip to decide sync steps.
The warmup broadcast (`bmuf.py:110-122 _warmup_sync`) is worker-0's params
distributed via pmean of a masked tree (exact: all other contributions zero).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax


class BMUFConfig(NamedTuple):
    """Defaults mirror FairseqBMUFConfig (fairseq/fairseq/dataclass/configs.py)."""

    block_lr: float = 1.0
    block_momentum: float = 0.875
    sync_iter: int = 50
    warmup_iterations: int = 500
    use_nbm: bool = False
    average_sync: bool = False  # also average optimizer state at sync


class BMUFState(NamedTuple):
    global_params: Any   # last synchronized model (identical on all workers)
    smoothed_grads: Any  # block-momentum buffer (identical on all workers)
    num_updates: jnp.ndarray


def bmuf_init(params) -> BMUFState:
    """`_reset_local_data` (bmuf.py:146-155): global copy = current params,
    zero momentum buffers."""
    zeros = jax.tree.map(jnp.zeros_like, params)
    return BMUFState(global_params=params, smoothed_grads=zeros,
                     num_updates=jnp.zeros((), jnp.int32))


def block_sync(params, state: BMUFState, cfg: BMUFConfig,
               axis_name: str) -> Tuple[Any, BMUFState]:
    """One BMUF reconciliation (`_block_sync`, bmuf.py:77-95). Call inside a
    shard_map/pjit program; `axis_name` is the data-parallel mesh axis."""
    if cfg.block_momentum == 0.0:
        new_params = jax.tree.map(lambda p: lax.pmean(p, axis_name), params)
        return new_params, state._replace(global_params=new_params)

    def sync_leaf(p, g, s):
        grad = lax.pmean(g - p, axis_name)
        smoothed = cfg.block_momentum * s + cfg.block_lr * grad
        new_p = g - smoothed
        if cfg.use_nbm:
            new_p = new_p - cfg.block_momentum * smoothed
        return new_p, smoothed

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(state.global_params)
    flat_s = treedef.flatten_up_to(state.smoothed_grads)
    out = [sync_leaf(p, g, s) for p, g, s in zip(flat_p, flat_g, flat_s)]
    new_params = treedef.unflatten([o[0] for o in out])
    smoothed = treedef.unflatten([o[1] for o in out])
    return new_params, BMUFState(global_params=new_params,
                                 smoothed_grads=smoothed,
                                 num_updates=state.num_updates)


def warmup_sync(params, state: BMUFState, cfg: BMUFConfig,
                axis_name: str) -> Tuple[Any, BMUFState]:
    """Broadcast worker 0's params to everyone and reset the momentum state
    (`_warmup_sync`, bmuf.py:110-122)."""
    idx = lax.axis_index(axis_name)
    mask = (idx == 0).astype(jnp.float32)

    def bcast(p):
        return lax.psum(p * mask.astype(p.dtype), axis_name)

    new_params = jax.tree.map(bcast, params)
    fresh = bmuf_init(new_params)
    return new_params, fresh._replace(num_updates=state.num_updates)


def bmuf_step(params, state: BMUFState, cfg: BMUFConfig,
              axis_name: str) -> Tuple[Any, BMUFState]:
    """Post-optimizer-step hook (`FairseqBMUF.step`, bmuf.py:124-132): bump the
    update counter, then warmup-broadcast exactly at `warmup_iterations` and
    block-sync every `sync_iter` updates thereafter. Branches via lax.cond so
    the caller can keep the whole training step in one jit program."""
    num = state.num_updates + 1
    state = state._replace(num_updates=num)

    is_warmup_end = num == cfg.warmup_iterations
    is_sync = (num > cfg.warmup_iterations) & (num % cfg.sync_iter == 0)

    def vary(tree):
        # collectives mark their outputs replicated over `axis_name`; the
        # no-sync branch keeps them device-varying — unify so lax.cond's
        # branch output types match under shard_map
        def one(x):
            vma = getattr(jax.typeof(x), "vma", frozenset())
            return x if axis_name in vma else lax.pvary(x, axis_name)

        return jax.tree.map(one, tree)

    def do_warmup(operand):
        p, s = operand
        return vary(warmup_sync(p, s, cfg, axis_name))

    def maybe_sync(operand):
        p, s = operand
        return lax.cond(
            is_sync,
            lambda o: vary(block_sync(o[0], o[1], cfg, axis_name)),
            lambda o: vary(o), (p, s))

    return lax.cond(is_warmup_end, do_warmup, maybe_sync, (params, state))
