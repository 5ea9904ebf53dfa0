"""Tail-emission exactness: windowed vocoding must reproduce the full-prefix
waveform tail bit-for-bit (receptive-field context included), and the session's
emit_tail must match the full emit program's tail."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamspeech_tpu.models.vocoder import CodeGenerator


def rf_vocoder_cfg():
    """Tiny channels but the PRODUCTION kernel/dilation/upsample structure —
    the receptive field (what the ctx window must cover) is identical to the
    real mHuBERT CodeHiFiGAN."""
    return {
        "upsample_rates": [5, 4, 4, 2, 2],
        "upsample_kernel_sizes": [11, 8, 8, 4, 4],
        "upsample_initial_channel": 32,
        "resblock_kernel_sizes": [3, 7, 11],
        "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
        "num_embeddings": 20, "embedding_dim": 16, "model_in_dim": 16,
        "dur_predictor_params": {
            "encoder_embed_dim": 16, "var_pred_hidden_dim": 16,
            "var_pred_kernel_size": 3, "var_pred_dropout": 0.5},
    }


@pytest.mark.parametrize("n_new_units", [1, 3, 17])
def test_windowed_vocode_tail_exact(n_new_units):
    cfg = rf_vocoder_cfg()
    voc = CodeGenerator(cfg)
    rng = np.random.RandomState(0)
    t = 40
    codes = jnp.asarray(rng.randint(0, cfg["num_embeddings"], (1, t)))
    variables = voc.init(jax.random.PRNGKey(1), codes, max_frames=8)
    dur = jnp.asarray(rng.randint(1, 5, (1, t)), jnp.int32)
    total = int(dur.sum())

    wav_full, n_samples, _ = voc.apply(variables, codes, dur,
                                       max_frames=total)
    wav_full = np.asarray(wav_full[0][: int(n_samples[0])])

    need = int(dur[0, -n_new_units:].sum())
    ctx, window = 64, 256
    start = max(total - need - ctx, 0)
    wav_win, n_valid = voc.apply(variables, codes, dur,
                                 jnp.asarray([start]), window,
                                 method=CodeGenerator.vocode_window)
    assert int(n_valid[0]) == total - start
    cur = need * 320
    tail_win = np.asarray(wav_win[0][: (total - start) * 320])[-cur:]
    np.testing.assert_allclose(tail_win, wav_full[-cur:], atol=1e-5)


def test_session_emit_tail_matches_emit():
    from streamspeech_tpu.models.streamspeech import StreamSpeechModel, init_params
    from streamspeech_tpu.runtime.session import StreamSpeechEngine
    from streamspeech_tpu.train.synthetic import tiny_config
    from tests.test_batched_eval import doctor_params

    cfg = tiny_config()
    model = StreamSpeechModel(cfg)
    variables = doctor_params(init_params(model, jax.random.PRNGKey(0)))
    voc_cfg = rf_vocoder_cfg()
    voc_cfg["num_embeddings"] = cfg.unit_decoder.vocab_size - 4
    vocoder = CodeGenerator(voc_cfg)
    voc_vars = vocoder.init(jax.random.PRNGKey(1), jnp.zeros((1, 4), jnp.int32),
                            max_frames=8)
    engine = StreamSpeechEngine(model, variables, vocoder, voc_vars,
                                max_enc_frames=64, max_mt_tokens=32,
                                mt_buckets=(8, 16, 32),
                                unit_buckets=(16, 32, 64))

    rng = np.random.RandomState(3)
    sess = engine.new_session()
    sess.push_features(rng.randn(64, 80).astype(np.float32) * 0.5, 8, 8)
    sess.mt_decode(6)
    assert len(sess.mt_tokens) >= 1, "doctored model must decode some tokens"

    for n_prev in [0, 1]:
        units_f, wav_f, dur_f = sess.emit()
        units_t, tail_t, dur_t = sess.emit_tail(n_prev)
        assert units_t == units_f
        np.testing.assert_allclose(dur_t, dur_f)
        new = len(units_f) - n_prev
        if new <= 0:
            assert len(tail_t) == 0
            continue
        cur = int(dur_f[-new:].sum()) * 320
        np.testing.assert_allclose(tail_t, wav_f[len(wav_f) - cur:], atol=1e-5)
