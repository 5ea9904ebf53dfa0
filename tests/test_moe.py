import jax
import jax.numpy as jnp
import numpy as np

from streamspeech_tpu.models.moe import BASELayer
from streamspeech_tpu.parallel.balanced_assignment import (
    _load,
    balanced_assignment,
    sinkhorn_routing,
)


def test_balanced_assignment_exact_balance_and_quality():
    rng = np.random.RandomState(0)
    t, e = 32, 4
    scores = rng.randn(t, e).astype(np.float32)
    assign = balanced_assignment(scores)
    counts = np.bincount(assign, minlength=e)
    assert (counts == t // e).all(), counts

    # near-optimal vs Hungarian on the expanded assignment problem
    from scipy.optimize import linear_sum_assignment

    cap = t // e
    cost = -np.repeat(scores, cap, axis=1)  # columns = expert slots
    rows, cols = linear_sum_assignment(cost)
    optimal = -cost[rows, cols].sum()
    achieved = scores[np.arange(t), assign].sum()
    assert achieved >= 0.9 * optimal - 1e-3, (achieved, optimal)


def test_native_matches_fallback_balance():
    if _load() is None:
        return
    rng = np.random.RandomState(1)
    scores = rng.randn(24, 3).astype(np.float32)
    a = balanced_assignment(scores)
    counts = np.bincount(a, minlength=3)
    assert (counts == 8).all()


def test_sinkhorn_balances_load():
    rng = np.random.RandomState(2)
    # heavily skewed scores: plain argmax routes everything to expert 0
    scores = jnp.asarray(rng.randn(64, 4) + np.array([5.0, 0, 0, 0]),
                         jnp.float32)
    plain = np.bincount(np.argmax(np.asarray(scores), -1), minlength=4)
    assert plain[0] == 64
    routed = np.argmax(np.asarray(sinkhorn_routing(scores)), -1)
    counts = np.bincount(routed, minlength=4)
    assert counts.max() <= 3 * counts.min() + 8, counts


def test_base_layer_forward_and_grads():
    layer = BASELayer(embed_dim=16, ffn_dim=32, num_experts=4)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 16), jnp.float32)
    variables = layer.init(jax.random.PRNGKey(0), x)
    y = layer.apply(variables, x)
    assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()

    def loss(p):
        return jnp.sum(layer.apply({"params": p}, x) ** 2)

    g = jax.grad(loss)(variables["params"])
    assert np.isfinite(float(jnp.linalg.norm(g["w1"])))


def test_base_layer_expert_parallel_mesh():
    """True EP: expert-stacked FFN params sharded over a `model` mesh axis,
    tokens sharded over `data` — the dispatch/combine einsums compile as SPMD
    with XLA-inserted collectives (the reference needs NCCL all_to_all +
    expert-param DDP exclusion for this, `fairseq_cli/train.py:104-123`).
    Outputs must match the unsharded layer."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 8:
        import pytest
        pytest.skip("needs 8 devices")
    mesh = Mesh(np.array(devs[:8]).reshape(2, 4), ("data", "model"))

    layer = BASELayer(embed_dim=16, ffn_dim=32, num_experts=4)
    x = jnp.asarray(np.random.RandomState(1).randn(4, 8, 16), jnp.float32)
    variables = layer.init(jax.random.PRNGKey(0), x)
    y_ref = np.asarray(jax.jit(layer.apply)(variables, x))

    spec = {"router": P(), "w1": P("model", None, None),
            "b1": P("model", None), "w2": P("model", None, None),
            "b2": P("model", None)}
    sharded = {"params": {
        k: jax.device_put(v, NamedSharding(mesh, spec[k]))
        for k, v in variables["params"].items()}}
    x_sh = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
    y = np.asarray(jax.jit(layer.apply)(sharded, x_sh))
    np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=2e-5)
