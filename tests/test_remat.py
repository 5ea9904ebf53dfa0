"""Backward-pass rematerialization (EncoderConfig.remat /
UnitDecoderConfig.remat): loss, gradients, and batch_stats updates must be
numerically identical to the non-remat program — remat only changes WHEN
activations are computed, never what is computed."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamspeech_tpu.models.streamspeech import StreamSpeechModel
from streamspeech_tpu.train.criterion import CriterionWeights, streamspeech_loss
from streamspeech_tpu.train.synthetic import synthetic_batch, tiny_config


def _loss_and_grads(cfg, batch, seed=0):
    model = StreamSpeechModel(cfg)
    init = jax.jit(lambda r: model.init(
        {"params": r}, jnp.asarray(batch["src_tokens"]),
        jnp.asarray(batch["src_lengths"]),
        jnp.asarray(batch["prev_output_tokens_mt"]), n2=1,
        use_running_stats=False))
    variables = init(jax.random.PRNGKey(seed))
    unit_blank = cfg.unit_decoder.vocab_size - 1
    w = CriterionWeights()

    def loss_fn(params):
        out, mut = model.apply(
            {"params": params,
             "batch_stats": variables.get("batch_stats", {})},
            batch["src_tokens"], batch["src_lengths"],
            batch["prev_output_tokens_mt"], chunk_size=8, conv_chunk_size=8,
            k1=0, n1=1, k2=0, n2=1, streaming=True, deterministic=True,
            use_running_stats=False, mutable=["batch_stats"])
        m = streamspeech_loss(out, batch, unit_blank, w)
        return m["loss"] / m["sample_size"].astype(jnp.float32), mut

    (loss, mut), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(variables["params"])
    return loss, grads, mut, variables["params"]


@pytest.mark.parametrize("seed", [0])
def test_remat_matches_plain(seed):
    cfg_plain = tiny_config()
    cfg_remat = tiny_config()
    cfg_remat.encoder.remat = True
    cfg_remat.unit_decoder.remat = True

    batch = synthetic_batch(cfg_plain, batch=2, frames=64, mt_len=8,
                            units_len=12, text_len=6, seed=3)
    l0, g0, m0, p0 = _loss_and_grads(cfg_plain, batch, seed)
    l1, g1, m1, p1 = _loss_and_grads(cfg_remat, batch, seed)

    # identical init (remat does not change param structure or values)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)), p0, p1)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6), g0, g1)
    # batch_stats updates (BatchNorm inside the rematted conformer layer)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7), m0, m1)
