"""Sharding rules: DP batch sharding, FSDP parameter sharding, TP head/FFN sharding.

Equivalent coverage of the reference's parallelism inventory (SURVEY.md §2.7):
- DP/DDP      → batch sharded on the ``data`` axis; XLA inserts the gradient
                all-reduce that LegacyDistributedDataParallel does by hand.
- FSDP/ZeRO   → parameters sharded along their largest divisible dim on ``data``;
                optimizer state inherits the same sharding (optax state mirrors
                the param tree).
- TP          → attention/FFN kernels sharded on ``model`` (column/row-parallel):
                Dense kernels [in, out] split on `out` for q/k/v/fc1 and on `in`
                for out_proj/fc2, the standard Megatron pairing.
- PP          → not materialized as a mesh axis (the 70M model doesn't need it);
                see train/trainer.py notes.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COL_PARALLEL = ("q_proj", "k_proj", "v_proj", "fc1", "w_1", "linear_pos")
_ROW_PARALLEL = ("out_proj", "fc2", "w_2")


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim sharded over the data axis."""
    return NamedSharding(mesh, P("data"))


def _spec_for(path: tuple, shape: tuple, mesh: Mesh, fsdp: bool, tp: bool) -> P:
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    tp_size = mesh.shape.get("model", 1)
    dp_size = mesh.shape.get("data", 1)
    spec = [None] * len(shape)

    # EP: BASE-layer expert-stacked params [E, ...] shard the expert dim over
    # ``model`` (the reference pins one expert per DDP worker and excludes
    # expert params from grad sync, `fairseq_cli/train.py:104-123` +
    # `base_layer.py:30-32`; here XLA partitions the dispatch/combine einsums
    # into the equivalent all_to_all). The router stays replicated.
    if tp_size > 1 and any(n.startswith("base_layers_") for n in names) \
            and names[-1] in ("w1", "b1", "w2", "b2") \
            and shape[0] % tp_size == 0:
        spec[0] = "model"

    if tp and tp_size > 1 and len(shape) >= 2 and "kernel" in names[-1]:
        owner = names[-2] if len(names) >= 2 else ""
        if any(owner.startswith(m) for m in _COL_PARALLEL):
            if shape[-1] % tp_size == 0:
                spec[-1] = "model"
        elif any(owner.startswith(m) for m in _ROW_PARALLEL):
            if shape[-2] % tp_size == 0:
                spec[-2] = "model"

    if fsdp and dp_size > 1:
        # shard the largest still-unsharded dim divisible by dp_size
        order = sorted(range(len(shape)), key=lambda i: -shape[i])
        for i in order:
            if spec[i] is None and shape[i] % dp_size == 0 and shape[i] >= dp_size:
                spec[i] = "data"
                break
    return P(*spec)


def param_shardings(params: Any, mesh: Mesh, fsdp: bool = False, tp: bool = False):
    """Pytree of NamedShardings matching ``params``."""

    def f(path, leaf):
        if not hasattr(leaf, "shape") or leaf.ndim == 0:
            return replicated(mesh)
        return NamedSharding(mesh, _spec_for(path, leaf.shape, mesh, fsdp, tp))

    return jax.tree_util.tree_map_with_path(f, params)


def shard_params(params: Any, shardings: Any) -> Any:
    return jax.tree.map(lambda x, s: jax.device_put(x, s), params, shardings)
