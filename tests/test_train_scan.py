"""make_train_step_scan: K device-side steps in one dispatch must reproduce
K sequential make_train_step calls exactly (same fold_in(key, i) rng
schedule), including optimizer state and batch_stats threading."""

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
    make_train_step_scan,
)

K = 3


def build():
    cfg = tiny_config()
    model = StreamSpeechModel(cfg)
    variables = init_params(model, jax.random.PRNGKey(0))
    tx = make_optimizer(OptimizationConfig(update_freq=1, warmup_updates=10,
                                           lr=1e-3, clip_norm=1.0))
    blank = cfg.unit_decoder.vocab_size - 1
    return cfg, model, variables, tx, blank


def stacked_batches(cfg):
    bs = [synthetic_batch(cfg, batch=2, seed=s) for s in range(K)]
    return jax.tree.map(lambda *xs: np.stack(xs), *bs), bs


def test_scan_matches_sequential():
    cfg, model, variables, tx, blank = build()
    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    step = make_train_step(model, tx, unit_blank=blank)
    step_k = make_train_step_scan(model, tx, unit_blank=blank)
    batches, bs = stacked_batches(cfg)

    seed0 = 13
    key0 = jax.random.PRNGKey(seed0)
    s_seq = create_sharded_state(variables, tx, mesh)
    seq_losses = []
    for i, b in enumerate(bs):
        s_seq, m = step(s_seq, b, jax.random.fold_in(key0, i),
                        chunk_size=4, conv_chunk_size=8)
        seq_losses.append(float(m["loss_mean"]))

    variables2 = init_params(StreamSpeechModel(cfg), jax.random.PRNGKey(0))
    s_scan = create_sharded_state(variables2, tx, mesh)
    s_scan, ms = step_k(s_scan, batches, seed0, chunk_size=4,
                        conv_chunk_size=8)

    np.testing.assert_allclose(np.asarray(ms["loss_mean"]),
                               np.asarray(seq_losses), rtol=0, atol=0)
    assert int(s_scan.step) == K
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=0, atol=0),
        s_seq.params, s_scan.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=0, atol=0),
        s_seq.batch_stats, s_scan.batch_stats)


def test_scan_metrics_stacked():
    cfg, model, variables, tx, blank = build()
    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    step_k = make_train_step_scan(model, tx, unit_blank=blank)
    batches, _ = stacked_batches(cfg)
    state = create_sharded_state(variables, tx, mesh)
    state, ms = step_k(state, batches, 7, chunk_size=4, conv_chunk_size=8)
    assert ms["loss_mean"].shape == (K,)
    assert np.isfinite(np.asarray(ms["loss_mean"])).all()
    assert not bool(np.asarray(ms["overflow"]).any())
