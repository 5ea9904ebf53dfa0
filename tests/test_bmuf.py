"""BMUF local-SGD sync (`parallel/bmuf.py`) on the virtual 8-device mesh.

Reference semantics: fairseq/fairseq/optim/bmuf.py:77-200 (block sync with
momentum filter, warmup broadcast, momentum-0 averaging degenerate case).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax.experimental.shard_map import shard_map
except ImportError:  # jax >= 0.6 moves it
    from jax.shard_map import shard_map

from streamspeech_tpu.parallel.bmuf import (
    BMUFConfig,
    block_sync,
    bmuf_init,
    bmuf_step,
)

NDEV = 8


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < NDEV:
        pytest.skip("needs the virtual 8-device CPU mesh")
    return Mesh(np.array(devs[:NDEV]), ("dp",))


def _tree(seed, scale=1.0):
    rng = np.random.RandomState(seed)
    return {
        "w": jnp.asarray(rng.randn(4, 3) * scale, jnp.float32),
        "b": jnp.asarray(rng.randn(3) * scale, jnp.float32),
    }


def _per_worker_grads(seed):
    rng = np.random.RandomState(seed)
    return {
        "w": jnp.asarray(rng.randn(NDEV, 4, 3), jnp.float32),
        "b": jnp.asarray(rng.randn(NDEV, 3), jnp.float32),
    }


def test_momentum_zero_sync_equals_synced_sgd(mesh):
    """Local SGD + BMUF(momentum=0) sync every step == plain synced SGD."""
    params = _tree(0)
    grads = _per_worker_grads(1)
    lr = 0.1
    cfg = BMUFConfig(block_momentum=0.0, sync_iter=1, warmup_iterations=0)

    def worker(params, g):
        state = bmuf_init(params)
        local = jax.tree.map(lambda p, gg: p - lr * gg[0], params, g)
        new_params, _ = block_sync(local, state, cfg, "dp")
        return jax.tree.map(lambda x: x[None], new_params)

    out = jax.jit(shard_map(
        worker, mesh=mesh,
        in_specs=(P(), P("dp")), out_specs=P("dp")))(params, grads)
    # every worker holds the same result...
    for leaf in jax.tree.leaves(out):
        arr = np.asarray(leaf)
        np.testing.assert_allclose(arr, np.broadcast_to(arr[:1], arr.shape),
                                   atol=1e-6)
    # ...equal to the gradient-averaged SGD step
    want = jax.tree.map(lambda p, g: p - lr * g.mean(0), params, grads)
    got = jax.tree.map(lambda x: x[0], out)
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-6)


def test_block_momentum_matches_numpy_recurrence(mesh):
    """Momentum sync == the reference recurrence (bmuf.py:173-200) in numpy."""
    cfg = BMUFConfig(block_momentum=0.875, block_lr=0.9, use_nbm=True,
                     sync_iter=1, warmup_iterations=0)
    params = _tree(2)
    rounds = 3
    all_grads = [_per_worker_grads(10 + r) for r in range(rounds)]
    lr = 0.05

    def worker(params, *grads_rounds):
        state = bmuf_init(params)
        p = params
        for g in grads_rounds:
            local = jax.tree.map(lambda x, gg: x - lr * gg[0], p, g)
            p, state = block_sync(local, state, cfg, "dp")
        return jax.tree.map(lambda x: x[None], p)

    out = jax.jit(shard_map(
        worker, mesh=mesh,
        in_specs=(P(),) + (P("dp"),) * rounds,
        out_specs=P("dp")))(params, *all_grads)
    got = {k: np.asarray(v[0]) for k, v in out.items()}

    # numpy reference recurrence
    g_np = {k: np.asarray(v) for k, v in params.items()}
    global_p = dict(g_np)
    smoothed = {k: np.zeros_like(v) for k, v in global_p.items()}
    for r in range(rounds):
        local = {k: global_p[k] - lr * np.asarray(all_grads[r][k])
                 for k in global_p}  # [NDEV, ...] locals
        for k in global_p:
            grad = (global_p[k][None] - local[k]).mean(0)
            smoothed[k] = cfg.block_momentum * smoothed[k] + cfg.block_lr * grad
            p = global_p[k] - smoothed[k]
            p = p - cfg.block_momentum * smoothed[k]  # nbm
            global_p[k] = p
    for k in got:
        np.testing.assert_allclose(got[k], global_p[k], atol=1e-5)


def test_bmuf_step_schedule_and_warmup_broadcast(mesh):
    """bmuf_step: no sync before warmup; at warmup, worker-0 broadcast; then
    sync every sync_iter."""
    cfg = BMUFConfig(block_momentum=0.0, sync_iter=2, warmup_iterations=2)
    params = _tree(3)

    def worker(params):
        idx = jax.lax.axis_index("dp").astype(jnp.float32)
        state = bmuf_init(params)
        # diverge the workers
        p = jax.tree.map(lambda x: x + idx, params)
        history = []
        for _ in range(4):
            p, state = bmuf_step(p, state, cfg, "dp")
            history.append(p["b"])
            p = jax.tree.map(lambda x: x + idx, p)  # keep diverging
        return jnp.stack(history)[None]

    out = np.asarray(jax.jit(shard_map(
        worker, mesh=mesh, in_specs=(P(),), out_specs=P("dp")))(params))
    b0 = np.asarray(params["b"])
    # update 1 (< warmup): still divergent per worker
    assert not np.allclose(out[0, 0], out[7, 0])
    np.testing.assert_allclose(out[3, 0], b0 + 3, atol=1e-6)
    # update 2 (== warmup): worker 0's params broadcast to everyone
    for d in range(NDEV):
        np.testing.assert_allclose(out[d, 1], b0, atol=1e-6)
    # update 3 (odd, not a sync step): divergent again
    assert not np.allclose(out[0, 2], out[7, 2])
    # update 4 (sync_iter multiple, past warmup): averaged & identical
    for d in range(1, NDEV):
        np.testing.assert_allclose(out[d, 3], out[0, 3], atol=1e-6)
    np.testing.assert_allclose(out[0, 3], b0 + 2 * np.mean(np.arange(NDEV)),
                               atol=1e-5)
