"""Exactness tests for the incremental streaming runtime vs offline computation.

These are the load-bearing guarantees that let the TPU build replace the
reference's per-chunk full recomputation with cached incremental steps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamspeech_tpu.models.streamspeech import StreamSpeechModel, init_params
from streamspeech_tpu.models.transformer import PAD
from streamspeech_tpu.runtime.session import StreamSpeechEngine
from streamspeech_tpu.train.synthetic import tiny_config

EOS = 2


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    model = StreamSpeechModel(cfg)
    variables = init_params(model, jax.random.PRNGKey(0))
    engine = StreamSpeechEngine(model, variables, max_enc_frames=64,
                                max_mt_tokens=32, mt_buckets=(8, 16),
                                unit_buckets=(32, 64))
    return cfg, model, variables, engine


def offline_encode(model, variables, feats, chunk, conv_chunk):
    enc, lens = model.apply(variables, feats[None], jnp.array([feats.shape[0]]),
                            chunk, conv_chunk,
                            method=StreamSpeechModel.encode)
    return np.asarray(enc[0]), int(lens[0])


def test_incremental_encoder_matches_offline(setup):
    cfg, model, variables, engine = setup
    rng = np.random.RandomState(0)
    feats = rng.randn(100, 80).astype(np.float32)  # NOT a multiple of block size
    chunk, conv_chunk = 4, 8  # block = 16 fbank frames

    session = engine.new_session()
    # push in ragged pieces like a real mic stream
    for piece in np.split(feats, [7, 20, 33, 50, 81]):
        session.push_features(piece, chunk, conv_chunk)
    session.push_features(np.zeros((0, 80), np.float32), chunk, conv_chunk,
                          finished=True)

    ref, ref_len = offline_encode(model, variables, jnp.asarray(feats), chunk,
                                  conv_chunk)
    assert session.enc_len == ref_len == 25  # ceil(100/4)
    inc = np.asarray(session.enc_buf[0, :ref_len])
    np.testing.assert_allclose(inc, ref[:ref_len], rtol=2e-4, atol=2e-5)


def test_incremental_ctc_ids_match_offline(setup):
    cfg, model, variables, engine = setup
    rng = np.random.RandomState(1)
    feats = rng.randn(64, 80).astype(np.float32)
    chunk, conv_chunk = 4, 8
    session = engine.new_session()
    session.push_features(feats, chunk, conv_chunk, finished=True)

    out = model.apply(variables, jnp.asarray(feats)[None], jnp.array([64]),
                      jnp.array([[EOS]], dtype=jnp.int32), chunk_size=chunk,
                      conv_chunk_size=conv_chunk, streaming=False)
    ref_asr = np.argmax(np.asarray(out["asr_logits"][0]), axis=-1)
    np.testing.assert_array_equal(np.asarray(session.asr_ids), ref_asr)


def test_incremental_mt_decode_matches_offline_teacher_forcing(setup):
    """Greedy incremental decoding must produce the same logits trajectory as the
    offline decoder fed the same prefix (same encoder, no streaming mask)."""
    cfg, model, variables, engine = setup
    rng = np.random.RandomState(2)
    feats = rng.randn(64, 80).astype(np.float32)
    chunk, conv_chunk = 4, 8

    session = engine.new_session()
    session.push_features(feats, chunk, conv_chunk, finished=True)
    hyp = session.mt_decode(max_new_tokens=6)

    # offline check at the LOGIT level (argmax alone once hid a cross-cache
    # dispatch bug): teacher-force the same prefix through the offline forward
    # and require the whole logit row to match the incremental step's.
    def offline_logits(prefix):
        toks = jnp.asarray([[EOS] + prefix], dtype=jnp.int32)
        out = model.apply(variables, feats[None], jnp.asarray([64]), toks,
                          chunk_size=chunk, conv_chunk_size=conv_chunk,
                          streaming=False)
        return np.asarray(out["mt_logits"][0, -1])

    # replay the incremental decode step-by-step on a fresh session, capturing
    # logits via the engine's step function
    s2 = engine.new_session()
    s2.push_features(feats, chunk, conv_chunk, finished=True)
    import jax.numpy as jnp2
    prefix = []
    for tok in hyp:
        feed = prefix[-1] if prefix else EOS
        logits, _, new_self = model.apply(
            engine.variables, jnp2.asarray([[feed]], jnp2.int32),
            jnp2.asarray(len(prefix), jnp2.int32), s2.mt_self, s2.mt_cross,
            method=type(model).mt_decoder_step)
        s2.mt_self = new_self
        inc_row = np.asarray(logits[0, -1])
        off_row = offline_logits(prefix)
        np.testing.assert_allclose(inc_row, off_row, rtol=2e-4, atol=2e-4)
        assert int(np.argmax(inc_row)) == tok
        prefix.append(tok)


def test_synthesize_units_runs(setup):
    cfg, model, variables, engine = setup
    rng = np.random.RandomState(3)
    feats = rng.randn(64, 80).astype(np.float32)
    session = engine.new_session()
    session.push_features(feats, 4, 8, finished=True)
    session.mt_tokens = [5, 6, 7]
    units = session.synthesize_units(unit_blank=cfg.unit_decoder.vocab_size - 1)
    assert all(4 <= u < cfg.unit_decoder.vocab_size - 1 for u in units)


def test_mt_truncate_rollback(setup):
    cfg, model, variables, engine = setup
    full = []
    # random tiny models may emit EOS immediately; scan seeds for a hypothesis
    # long enough to exercise the rollback (deterministic given the fixture)
    for seed in range(12):
        feats = np.random.RandomState(seed).randn(64, 80).astype(np.float32)
        s1 = engine.new_session()
        s1.push_features(feats, 4, 8, finished=True)
        full = s1.mt_decode(max_new_tokens=6)
        if len(full) >= 3:
            break
    assert len(full) >= 3, "no seed produced a >=3-token hypothesis"
    # decode, truncate to 2, re-decode → must match the untruncated trajectory
    s1.mt_truncate(2)
    redone = s1.mt_decode(max_new_tokens=len(full) - 2)
    assert redone == full
