"""Batched multi-stream serving exactness: B lockstep streams must reproduce
B independent single-stream sessions bit-for-bit at the output level — encoder
frames, CTC ids, MT hypotheses, units, and waveforms. This is the guarantee
that lets one chip serve many live conversations with shared compiled programs
(the reference serves one utterance per agent process)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamspeech_tpu.models.streamspeech import StreamSpeechModel, init_params
from streamspeech_tpu.models.vocoder import CodeGenerator
from streamspeech_tpu.runtime.batched import BatchedStreamingSession
from streamspeech_tpu.runtime.session import StreamSpeechEngine
from streamspeech_tpu.train.synthetic import tiny_config
from tests.test_vocoder import tiny_cfg as tiny_vocoder_cfg

CHUNK, CONV_CHUNK = 4, 8  # lockstep block = 4 * lcm(4,8) = 32 fbank frames


@pytest.fixture(scope="module")
def stack():
    cfg = tiny_config()
    model = StreamSpeechModel(cfg)
    variables = init_params(model, jax.random.PRNGKey(0))
    voc_cfg = tiny_vocoder_cfg()
    voc_cfg["num_embeddings"] = cfg.unit_decoder.vocab_size - 4
    vocoder = CodeGenerator(voc_cfg)
    voc_vars = vocoder.init(jax.random.PRNGKey(1), jnp.zeros((1, 4), jnp.int32),
                            max_frames=8)
    engine = StreamSpeechEngine(model, variables, vocoder, voc_vars,
                                max_enc_frames=64, max_mt_tokens=32,
                                mt_buckets=(8, 16, 32),
                                unit_buckets=(16, 32, 64))
    # three streams with lengths exercising: exact block multiple (64), a
    # partial tail inside a shared block (100 → tail 4), and a stream that
    # drains ticks before the others finish (83 → tail 19)
    rng = np.random.RandomState(7)
    streams = [rng.randn(n, 80).astype(np.float32) for n in (100, 64, 83)]
    singles = []
    for feats in streams:
        s = engine.new_session()
        s.push_features(feats, CHUNK, CONV_CHUNK, finished=True)
        singles.append(s)
    return engine, streams, singles


def test_batched_encoder_and_ctc_match_singles(stack):
    engine, streams, singles = stack
    bs = BatchedStreamingSession(engine, len(streams))
    for i, feats in enumerate(streams):
        bs.push_features(i, feats, finished=True)
    bs.encode_ready_blocks(CHUNK, CONV_CHUNK)
    for i, single in enumerate(singles):
        assert int(bs.enc_len[i]) == single.enc_len
        got = np.asarray(bs.enc_buf[i, : single.enc_len])
        ref = np.asarray(single.enc_buf[0, : single.enc_len])
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)
        assert bs.asr_ids[i] == single.asr_ids
        assert bs.st_ids[i] == single.st_ids
        assert bs.ctc_hypotheses(i)["asr"] == single.ctc_hypotheses()["asr"]


def test_batched_staggered_arrival_matches(stack):
    """Streams fed in ragged per-tick pieces (like real mics) with lockstep
    encoding between pushes must equal the all-at-once result."""
    engine, streams, singles = stack
    bs = BatchedStreamingSession(engine, len(streams))
    cuts = [0, 17, 40, 64, 90, 10_000]
    done = [False] * len(streams)
    for a, b in zip(cuts, cuts[1:]):
        for i, feats in enumerate(streams):
            if done[i]:
                continue
            piece = feats[a: min(b, len(feats))]
            finished = b >= len(feats)
            bs.push_features(i, piece, finished=finished)
            done[i] = finished
        bs.encode_ready_blocks(CHUNK, CONV_CHUNK)
    for i, single in enumerate(singles):
        assert int(bs.enc_len[i]) == single.enc_len
        np.testing.assert_allclose(
            np.asarray(bs.enc_buf[i, : single.enc_len]),
            np.asarray(single.enc_buf[0, : single.enc_len]),
            rtol=2e-4, atol=2e-5)
        assert bs.asr_ids[i] == single.asr_ids


@pytest.fixture(scope="module")
def decoded(stack):
    engine, streams, singles = stack
    bs = BatchedStreamingSession(engine, len(streams))
    for i, feats in enumerate(streams):
        bs.push_features(i, feats, finished=True)
    bs.encode_ready_blocks(CHUNK, CONV_CHUNK)
    hyps = [s.mt_decode(max_new_tokens=6) for s in singles]
    bs.mt_decode(np.asarray([6, 6, 6]))
    return bs, hyps


def test_batched_mt_decode_matches_singles(decoded):
    bs, hyps = decoded
    for i, hyp in enumerate(hyps):
        assert bs.mt_tokens[i] == hyp


def test_batched_uneven_budgets_and_truncate(stack, decoded):
    """Per-stream budgets: hold stream 0, extend 1 and 2 by different amounts;
    then roll stream 1 back and re-decode — trajectories must match a single
    session doing the same moves (per-example KV truncation)."""
    engine, streams, singles = stack
    bs, hyps = decoded
    ext = [engine.new_session() for _ in streams]
    for i, feats in enumerate(streams):
        ext[i].push_features(feats, CHUNK, CONV_CHUNK, finished=True)
        ext[i].mt_decode(max_new_tokens=6)
    ext[1].mt_decode(max_new_tokens=3)
    ext[2].mt_decode(max_new_tokens=1)
    bs.mt_decode(np.asarray([0, 3, 1]))
    for i in range(3):
        assert bs.mt_tokens[i] == ext[i].mt_tokens
    # whole-word rollback on stream 1 only
    keep = max(1, len(ext[1].mt_tokens) - 2)
    ext[1].mt_truncate(keep)
    redo = ext[1].mt_decode(max_new_tokens=4)
    before_0, before_2 = list(bs.mt_tokens[0]), list(bs.mt_tokens[2])
    bs.mt_truncate(1, keep)
    bs.mt_decode(np.asarray([0, 4, 0]))
    assert bs.mt_tokens[1] == redo
    assert bs.mt_tokens[0] == before_0 and bs.mt_tokens[2] == before_2


def test_batched_emit_matches_singles(decoded, stack):
    engine, streams, singles = stack
    bs, hyps = decoded
    outs = bs.emit()
    for i, single in enumerate(singles):
        # align the single session to the batched hypothesis state
        single.mt_tokens = list(bs.mt_tokens[i])
        units_ref, wav_ref, dur_ref = single.emit()
        units, wav, dur = outs[i]
        assert units == units_ref
        np.testing.assert_array_equal(dur, dur_ref)
        assert wav.shape == wav_ref.shape
        np.testing.assert_allclose(wav, wav_ref, rtol=1e-4, atol=1e-5)


def test_emit_unit_bucket_exceeding_available_ids(stack):
    """7 tokens × up=5 = 35 ids → unit bucket 64 > available 40: the emit path
    must pad the code buffer to the vocoder bucket instead of shape-erroring
    (caught live by scripts/bench_serving.py at the full config)."""
    engine, streams, singles = stack
    s = engine.new_session()
    s.push_features(streams[1], CHUNK, CONV_CHUNK, finished=True)
    s.mt_tokens = [5, 6, 7, 8, 9, 10]
    units, wav, dur = s.emit()
    assert np.isfinite(wav).all() and len(dur) == len(units)
    bs = BatchedStreamingSession(engine, 2)
    for i in range(2):
        bs.push_features(i, streams[1], finished=True)
        bs.encode_ready_blocks(CHUNK, CONV_CHUNK)
    bs.mt_tokens = [[5, 6, 7, 8, 9, 10], [5, 6]]
    outs = bs.emit()
    assert outs[0][0] == units
    np.testing.assert_allclose(outs[0][1], wav, rtol=1e-4, atol=1e-5)
