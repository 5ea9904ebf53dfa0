"""BASE-style expert layer with balanced routing (expert parallelism).

Reference: `fairseq/fairseq/modules/base_layer.py:14` — each token routes to
exactly one expert FFN, with a BALANCED assignment (every expert receives the
same number of tokens) computed by the libbase auction kernel; expert parameters
are excluded from DDP sync and live on their own workers
(`fairseq_cli/train.py:104-123`).

TPU-native version: routing is an on-device Sinkhorn-balanced argmax (jittable;
`parallel/balanced_assignment.py` also provides the exact native auction kernel
for host-side routing parity). Dispatch/combine are one-hot einsums that XLA
partitions cleanly when the expert dimension of the parameters is sharded over
the ``model`` mesh axis — the all_to_all the reference needs from NCCL is then
just XLA's partitioning of the einsum.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from streamspeech_tpu.parallel.balanced_assignment import sinkhorn_routing


class BASELayer(nn.Module):
    embed_dim: int
    ffn_dim: int
    num_experts: int
    sinkhorn_iterations: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """x [B, T, C] → [B, T, C]; every token runs exactly one expert FFN."""
        b, t, c = x.shape
        e = self.num_experts
        w_router = self.param("router", nn.initializers.lecun_normal(),
                              (c, e))
        # expert-stacked FFN weights; shard dim 0 over the "model" axis for EP
        w1 = self.param("w1", nn.initializers.lecun_normal(),
                        (e, c, self.ffn_dim))
        b1 = self.param("b1", nn.initializers.zeros, (e, self.ffn_dim))
        w2 = self.param("w2", nn.initializers.lecun_normal(),
                        (e, self.ffn_dim, c))
        b2 = self.param("b2", nn.initializers.zeros, (e, c))

        tokens = x.reshape(b * t, c)
        scores = tokens @ w_router.astype(x.dtype)               # [N, E]
        if deterministic:
            # inference routes each token greedily to its top expert — the
            # reference's eval mode (`base_layer.py:50-54` greedy_assignment
            # when not training). Per-token routing keeps incremental decode
            # identical to the offline forward (streaming exactness).
            expert_of = jnp.argmax(scores, axis=-1)              # [N]
        else:
            balanced = sinkhorn_routing(scores, self.sinkhorn_iterations)
            expert_of = jnp.argmax(balanced, axis=-1)            # [N]
        route = jax.nn.one_hot(expert_of, e, dtype=x.dtype)      # [N, E]
        # gate value = router prob of the chosen expert (straight-through style)
        gate = jnp.sum(jax.nn.softmax(scores, axis=-1) * route, axis=-1,
                       keepdims=True)

        # dispatch: [E, N, C] weighted by routing; combine after expert FFNs
        xe = jnp.einsum("ne,nc->enc", route, tokens)
        h = jax.nn.relu(jnp.einsum("enc,ecf->enf", xe, w1.astype(x.dtype))
                        + b1[:, None].astype(x.dtype) * route.T[:, :, None])
        y = jnp.einsum("enf,efc->enc", h, w2.astype(x.dtype)) \
            + b2[:, None].astype(x.dtype) * route.T[:, :, None]
        out = jnp.einsum("enc,ne->nc", y, route) * gate
        return (tokens + out).reshape(b, t, c)
