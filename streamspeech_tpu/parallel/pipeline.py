"""GPipe-style pipeline parallelism over a device-mesh axis.

TPU-native replacement for fairseq's pipeline model parallelism
(`--pipeline-model-parallel`, `fairseq/fairseq/model_parallel/models/
pipeline_parallel_transformer/{model,layers}.py`, balance/devices args
`fairseq/fairseq/dataclass/configs.py:376-384`): instead of torch RPC +
per-GPU module placement, the layer stack's parameters are STACKED on a
leading stage axis and sharded over a ``pipe`` mesh axis; a ``shard_map``
program runs the classic GPipe schedule — ``n_micro + n_stages - 1`` ticks
of (compute my stage, ``ppermute`` activations to the next stage) — so
activations ride ICI and XLA overlaps the collective with compute.

Autodiff goes straight through ``lax.scan`` + ``ppermute``: ``jax.grad`` of a
loss over :func:`pipeline_apply` yields the same gradients as the sequential
stack (asserted by tests/test_pipeline.py), i.e. GPipe's synchronous
semantics — no PipeDream-style staleness.

Intended use here: the 12-layer conformer stack (or any homogeneous layer
stack) at scales where one chip can't hold the model; at StreamSpeech's 70M
params this exists for completeness and is off by default (SURVEY §2.7
"low priority").
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # moved in newer jax
    from jax.experimental.shard_map import shard_map
except ImportError:  # pragma: no cover
    from jax.shard_map import shard_map


def stack_stage_params(per_stage_params) -> Any:
    """[pytree_0, ..., pytree_{S-1}] -> one pytree with leading stage axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *per_stage_params)


def pipeline_apply(
    stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    stacked_params: Any,
    x: jnp.ndarray,
    mesh: Mesh,
    axis: str = "pipe",
) -> jnp.ndarray:
    """Run ``stage_fn`` S times in pipeline over mesh axis ``axis``.

    stage_fn(params_slice, act) -> act, with act shape preserved.
    stacked_params: leaves with leading axis S == mesh.shape[axis].
    x: [n_micro, micro_batch, ...] microbatched input (replicated).
    Returns [n_micro, micro_batch, ...] outputs of the final stage.
    """
    n_stages = mesh.shape[axis]
    n_micro = x.shape[0]
    ticks = n_micro + n_stages - 1
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def per_device(params, xs):
        # params: [1, ...] stage slice; xs: full [n_micro, mb, ...]
        params = jax.tree.map(lambda p: p[0], params)
        stage = jax.lax.axis_index(axis)

        def tick(carry, t):
            recv = carry
            m = jnp.clip(t, 0, n_micro - 1)
            x_t = jax.lax.dynamic_index_in_dim(xs, m, 0, keepdims=False)
            inp = jnp.where(stage == 0, x_t, recv)
            out = stage_fn(params, inp)
            # microbatch index this stage works on at tick t is t - stage;
            # out is garbage when that is out of [0, n_micro) — masked below
            nxt = jax.lax.ppermute(out, axis, perm)
            active = (stage == n_stages - 1) & (t - stage >= 0) \
                & (t - stage < n_micro)
            collect = jnp.where(active, out, jnp.zeros_like(out))
            return nxt, collect

        zero = jnp.zeros_like(xs[0])
        _, collected = jax.lax.scan(tick, zero, jnp.arange(ticks))
        # collected[t] holds microbatch t-(S-1)'s output on the last stage and
        # zeros elsewhere; psum makes the result replicated across the axis
        outs = collected[n_stages - 1:]
        return jax.lax.psum(outs, axis)

    pspec = jax.tree.map(lambda _: P(axis), stacked_params)
    fn = shard_map(per_device, mesh=mesh,
                   in_specs=(pspec, P()), out_specs=P(),
                   check_rep=False)
    return fn(stacked_params, x)


def make_pipe_mesh(n_stages: int, devices=None) -> Mesh:
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    assert len(devices) % n_stages == 0
    arr = np.asarray(devices[: n_stages])
    return Mesh(arr.reshape(n_stages), axis_names=("pipe",))
