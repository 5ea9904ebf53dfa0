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

try:  # newer jax: jax.shard_map (check_rep renamed/removed → check_vma)
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
        try:
            return _shard_map(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_vma=check_rep)
        except TypeError:  # pragma: no cover
            return _shard_map(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def stack_stage_params(per_stage_params) -> Any:
    """[pytree_0, ..., pytree_{S-1}] -> one pytree with leading stage axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *per_stage_params)


def pipeline_apply(
    stage_fn: Callable[..., jnp.ndarray],
    stacked_params: Any,
    x: jnp.ndarray,
    mesh: Mesh,
    axis: str = "pipe",
    extras: Any = None,
) -> jnp.ndarray:
    """Run ``stage_fn`` S times in pipeline over mesh axis ``axis``.

    stage_fn(params_slice, act) -> act, with act shape preserved; when
    ``extras`` is given, stage_fn(params_slice, act, extras_m) where
    ``extras_m`` is ``extras`` indexed at the microbatch the stage is
    currently processing (leaves must carry a leading n_micro axis) — this
    is how per-microbatch side inputs (e.g. padding masks) ride along
    without being baked into the activation.
    stacked_params: leaves with leading axis S == mesh.shape[axis].
    x: [n_micro, micro_batch, ...] microbatched input (replicated).
    Returns [n_micro, micro_batch, ...] outputs of the final stage.
    """
    n_stages = mesh.shape[axis]
    n_micro = x.shape[0]
    ticks = n_micro + n_stages - 1
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
    has_extras = extras is not None
    if not has_extras:
        extras = jnp.zeros((n_micro,), x.dtype)  # unused placeholder

    def per_device(params, xs, extras_all):
        # params: [1, ...] stage slice; xs: full [n_micro, mb, ...]
        params = jax.tree.map(lambda p: p[0], params)
        stage = jax.lax.axis_index(axis)

        def tick(carry, t):
            recv = carry
            m = jnp.clip(t, 0, n_micro - 1)
            x_t = jax.lax.dynamic_index_in_dim(xs, m, 0, keepdims=False)
            inp = jnp.where(stage == 0, x_t, recv)
            if not has_extras:
                out = stage_fn(params, inp)
            else:
                # the microbatch this stage processes at tick t is t - stage
                m_own = jnp.clip(t - stage, 0, n_micro - 1)
                extras_m = jax.tree.map(
                    lambda e: jax.lax.dynamic_index_in_dim(
                        e, m_own, 0, keepdims=False), extras_all)
                out = stage_fn(params, inp, extras_m)
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
    espec = jax.tree.map(lambda _: P(), extras)
    fn = shard_map(per_device, mesh=mesh,
                   in_specs=(pspec, P(), espec), out_specs=P(),
                   check_rep=False)
    return fn(stacked_params, x, extras)


def conformer_stage_params(variables, n_stages: int):
    """Split a ChunkConformerEncoder's layer variables into ``n_stages``
    equal stage groups and stack them on a leading stage axis.

    The encoder's per-layer variables (``layers_i`` subtrees of both
    ``params`` and ``batch_stats`` — attention, depthwise conv, BatchNorm
    running stats, layer norms) are homogeneous, so stages stack cleanly;
    the reference's analogue assigns whole torch modules to pipeline
    devices (`fairseq/fairseq/model_parallel/models/
    pipeline_parallel_transformer/model.py`). Returns (stacked, n_layers).
    """
    p = variables["params"]
    bs = variables.get("batch_stats", {})
    names = sorted((k for k in p if k.startswith("layers_")),
                   key=lambda k: int(k.split("_")[1]))
    n_layers = len(names)
    assert n_layers % n_stages == 0, (n_layers, n_stages)
    per = n_layers // n_stages
    stages = []
    for s in range(n_stages):
        group = names[s * per: (s + 1) * per]
        stages.append({
            "params": {str(i): p[k] for i, k in enumerate(group)},
            "batch_stats": {str(i): bs.get(k, {}) for i, k in enumerate(group)},
        })
    return stack_stage_params(stages), n_layers


def conformer_pipeline_forward(encoder, variables, src_tokens, src_lengths,
                               mesh: Mesh, n_micro: int,
                               chunk_size=None, conv_chunk_size=None,
                               axis: str = "pipe"):
    """Forward the REAL ChunkConformerEncoder with its layer stack staged
    over the ``axis`` mesh axis (GPipe), exactly equal to the sequential
    encoder in eval mode (BatchNorm running stats — batch-independent, so
    microbatching preserves numerics; asserted by tests/test_pipeline.py).

    The pre-layer frontend (Conv1d subsampler, positional encoding, input
    projection) and the layer stack run inside one jittable computation;
    chunk masks and per-example key-valid masks ride the pipeline as
    per-microbatch extras. Returns (encoder_out [B, T', C], out_lengths).
    """
    from streamspeech_tpu.models.conformer import (
        ChunkConformerEncoder,
        ConformerLayer,
    )
    from streamspeech_tpu.ops.masks import lengths_to_mask
    from streamspeech_tpu.ops.pos_encoding import rel_pos_encoding

    cfg = encoder.cfg
    n_stages = mesh.shape[axis]
    stacked, n_layers = conformer_stage_params(variables, n_stages)
    per = n_layers // n_stages

    b = src_tokens.shape[0]
    assert b % n_micro == 0, (b, n_micro)
    mb = b // n_micro

    # frontend (everything before the layer stack), replicated
    x, out_lengths = encoder.apply(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})},
        src_tokens, src_lengths, conv_chunk_size,
        method=ChunkConformerEncoder.pre_layers)
    t = x.shape[1]
    pos_emb = None
    if cfg.pos_enc_type == "rel_pos":
        pos_emb = jnp.asarray(rel_pos_encoding(t, cfg.embed_dim), x.dtype)
    allowed = None
    if chunk_size is not None and chunk_size < 999:
        from streamspeech_tpu.ops.masks import chunk_allowed
        allowed = chunk_allowed(t, chunk_size)
    key_valid = lengths_to_mask(out_lengths, t)

    xs = x.reshape(n_micro, mb, t, -1)
    extras = {"key_valid": key_valid.reshape(n_micro, mb, t)}

    layer = ConformerLayer(cfg)

    def stage_fn(stage_vars, act, extras_m):
        h = act
        for i in range(per):
            sub_p = stage_vars["params"][str(i)]
            sub_b = stage_vars["batch_stats"][str(i)]
            h = layer.apply({"params": sub_p, "batch_stats": sub_b},
                            h, pos_emb, allowed, extras_m["key_valid"],
                            conv_chunk_size)
        return h

    y = pipeline_apply(stage_fn, stacked, xs, mesh, axis=axis, extras=extras)
    return y.reshape(b, t, -1), out_lengths


def make_pipe_mesh(n_stages: int, devices=None) -> Mesh:
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    assert len(devices) % n_stages == 0
    arr = np.asarray(devices[: n_stages])
    return Mesh(arr.reshape(n_stages), axis_names=("pipe",))
