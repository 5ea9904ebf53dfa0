import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamspeech_tpu.generation import OfflineGenerator
from streamspeech_tpu.models.streamspeech import StreamSpeechModel, init_params
from streamspeech_tpu.train.synthetic import tiny_config

EOS = 2


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    model = StreamSpeechModel(cfg)
    variables = init_params(model, jax.random.PRNGKey(0))
    return cfg, model, variables


def offline_next(model, variables, feats, prefix):
    toks = jnp.asarray([[EOS] + prefix], dtype=jnp.int32)
    out = model.apply(variables, feats[None], jnp.asarray([feats.shape[0]]),
                      toks, chunk_size=99999, conv_chunk_size=99999,
                      streaming=False)
    lp = np.asarray(out["mt_logits"][0, -1], np.float64)
    lp[1] = -np.inf
    return int(np.argmax(lp))


def test_beam1_matches_greedy_chain(setup):
    cfg, model, variables = setup
    rng = np.random.RandomState(0)
    feats = rng.randn(64, 80).astype(np.float32)
    gen = OfflineGenerator(model, variables, beam=1, max_len=8)
    out = gen.generate(feats)
    prefix = []
    for tok in out["mt_tokens"]:
        nxt = offline_next(model, variables, feats, prefix)
        assert nxt == tok
        prefix.append(nxt)


def test_beam_search_improves_or_matches_score(setup):
    cfg, model, variables = setup
    rng = np.random.RandomState(1)
    feats = rng.randn(48, 80).astype(np.float32)
    g1 = OfflineGenerator(model, variables, beam=1, max_len=8)
    g4 = OfflineGenerator(model, variables, beam=4, max_len=8)
    s1 = g1.generate(feats)["mt_score"]
    s4 = g4.generate(feats)["mt_score"]
    assert s4 >= s1 - 1e-6


def test_generate_outputs_well_formed(setup):
    cfg, model, variables = setup
    rng = np.random.RandomState(2)
    feats = rng.randn(80, 80).astype(np.float32)  # not multiple of 32
    gen = OfflineGenerator(model, variables, beam=2, max_len=8)
    out = gen.generate(feats)
    unit_blank = cfg.unit_decoder.vocab_size - 1
    assert all(4 <= u < unit_blank for u in out["units"])
    assert all(t not in (1, 2) for t in out["mt_tokens"])
    assert isinstance(out["asr_tokens"], list)


def test_batched_greedy_matches_single(setup):
    cfg, model, variables = setup
    rng = np.random.RandomState(5)
    feats = [rng.randn(64, 80).astype(np.float32),
             rng.randn(48, 80).astype(np.float32)]
    gen = OfflineGenerator(model, variables, beam=1, max_len=8)
    batched = gen.generate_batch_greedy(feats, max_tokens=8)
    for f, got in zip(feats, batched):
        single = gen.generate(f)
        assert got["mt_tokens"] == single["mt_tokens"], (got, single)
        assert got["asr_tokens"] == single["asr_tokens"]
        assert got["units"] == single["units"]
