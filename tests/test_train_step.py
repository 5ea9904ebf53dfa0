import jax
import jax.numpy as jnp
import numpy as np

from streamspeech_tpu.config import OptimizationConfig
from streamspeech_tpu.models.streamspeech import StreamSpeechModel, init_params
from streamspeech_tpu.parallel.mesh import make_mesh
from streamspeech_tpu.train.synthetic import synthetic_batch, tiny_config
from streamspeech_tpu.train.trainer import (
    create_sharded_state,
    make_optimizer,
    make_train_step,
)


def build():
    cfg = tiny_config()
    model = StreamSpeechModel(cfg)
    variables = init_params(model, jax.random.PRNGKey(0))
    opt = OptimizationConfig(update_freq=1, warmup_updates=10, lr=1e-3,
                             clip_norm=1.0)
    tx = make_optimizer(opt)
    step = make_train_step(model, tx, unit_blank=cfg.unit_decoder.vocab_size - 1)
    return cfg, model, variables, tx, step


def test_single_device_loss_decreases():
    cfg, model, variables, tx, step = build()
    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    state = create_sharded_state(variables, tx, mesh)
    batch = synthetic_batch(cfg, batch=4)
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(i),
                              chunk_size=4, conv_chunk_size=8)
        losses.append(float(metrics["loss_mean"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


def test_int_seed_rng_matches_prng_key():
    """train_step accepts a HOST int seed (free through the remote tunnel —
    inlined into the execute RPC; an eager PRNGKey between chained donated
    dispatches measured 15 s/step) and must give the exact PRNGKey(seed)
    trajectory."""
    cfg, model, variables, tx, step = build()
    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    batch = synthetic_batch(cfg, batch=4)

    s1 = create_sharded_state(variables, tx, mesh)
    s1, m1 = step(s1, batch, jax.random.PRNGKey(7), chunk_size=4,
                  conv_chunk_size=8)

    variables2 = init_params(StreamSpeechModel(cfg), jax.random.PRNGKey(0))
    s2 = create_sharded_state(variables2, tx, mesh)
    s2, m2 = step(s2, batch, 7, chunk_size=4, conv_chunk_size=8)

    np.testing.assert_allclose(float(m1["loss_mean"]), float(m2["loss_mean"]),
                               rtol=0, atol=0)


def test_dp_mesh_matches_single_device():
    cfg, model, variables, tx, step = build()
    batch = synthetic_batch(cfg, batch=8)

    mesh1 = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    s1 = create_sharded_state(variables, tx, mesh1)
    s1, m1 = step(s1, batch, jax.random.PRNGKey(0), chunk_size=4,
                  conv_chunk_size=8)

    mesh4 = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    from streamspeech_tpu.train.trainer import batch_spec
    sharded_batch = jax.tree.map(
        lambda x, s: jax.device_put(x, s), batch, batch_spec(mesh4, batch))
    # the train step donates its state; re-init fresh variables for mesh 2
    variables2 = init_params(StreamSpeechModel(cfg), jax.random.PRNGKey(0))
    s4 = create_sharded_state(variables2, tx, mesh4)
    s4, m4 = step(s4, sharded_batch, jax.random.PRNGKey(0), chunk_size=4,
                  conv_chunk_size=8)
    # dropout rngs are replicated in our step (same key), so losses must agree
    np.testing.assert_allclose(float(m1["loss_mean"]), float(m4["loss_mean"]),
                               rtol=1e-4)


def test_fsdp_tp_mesh_runs():
    cfg, model, variables, tx, step = build()
    mesh = make_mesh(data=4, model=2)
    state = create_sharded_state(variables, tx, mesh, fsdp=True, tp=True)
    batch = synthetic_batch(cfg, batch=4)
    from streamspeech_tpu.train.trainer import batch_spec
    batch = jax.tree.map(lambda x, s: jax.device_put(x, s), batch,
                         batch_spec(mesh, batch))
    state, metrics = step(state, batch, jax.random.PRNGKey(0), chunk_size=4,
                          conv_chunk_size=8)
    assert np.isfinite(float(metrics["loss_mean"]))
    # params actually sharded: at least one leaf not fully replicated
    shardings = jax.tree.leaves(
        jax.tree.map(lambda x: x.sharding.is_fully_replicated, state.params))
    assert not all(shardings)


def test_train_step_with_specaugment():
    cfg = tiny_config()
    model = StreamSpeechModel(cfg)
    variables = init_params(model, jax.random.PRNGKey(0))
    tx = make_optimizer(OptimizationConfig(update_freq=1, warmup_updates=10))
    step = make_train_step(model, tx, unit_blank=cfg.unit_decoder.vocab_size - 1,
                           specaugment_cfg={"freq_mask_N": 1, "freq_mask_F": 10,
                                            "time_mask_N": 1, "time_mask_T": 20,
                                            "time_mask_p": 1.0},
                           rdrop_alpha=0.5)
    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    state = create_sharded_state(variables, tx, mesh)
    batch = synthetic_batch(cfg, batch=2)
    state, m = step(state, batch, jax.random.PRNGKey(0), chunk_size=4,
                    conv_chunk_size=8)
    assert np.isfinite(float(m["loss_mean"]))
    assert "rdrop_kl" in m
