"""Smoke the benchmark plumbing on CPU with the tiny model: the fused-policy
replay recording must capture calls, and the no-sync chained replay must run
the identical programs end to end (same branch mix as the recorded run)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamspeech_tpu.agents.streamspeech import (
    StreamSpeechAgentConfig,
    StreamSpeechS2STAgent,
)
from streamspeech_tpu.benchmarks import measure_nosync_rtf
from streamspeech_tpu.dictionary import Dictionary
from streamspeech_tpu.eval.evaluator import SentenceLevelEvaluator
from streamspeech_tpu.models.streamspeech import StreamSpeechModel, init_params
from streamspeech_tpu.models.vocoder import CodeGenerator
from streamspeech_tpu.runtime.session import StreamSpeechEngine
from streamspeech_tpu.train.synthetic import tiny_config
from tests.test_batched_eval import doctor_params
from tests.test_emit_tail import rf_vocoder_cfg


@pytest.fixture(scope="module")
def stack():
    cfg = tiny_config()
    model = StreamSpeechModel(cfg)
    variables = doctor_params(init_params(model, jax.random.PRNGKey(0)))
    voc_cfg = rf_vocoder_cfg()
    voc_cfg["num_embeddings"] = cfg.unit_decoder.vocab_size - 4
    vocoder = CodeGenerator(voc_cfg)
    voc_vars = vocoder.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, 4), jnp.int32), max_frames=8)
    engine = StreamSpeechEngine(model, variables, vocoder, voc_vars,
                                max_enc_frames=64, max_mt_tokens=32,
                                mt_buckets=(8, 16, 32),
                                unit_buckets=(16, 32, 64))
    d = Dictionary()
    for i in range(cfg.mt_decoder.vocab_size - 4):
        d.add_symbol(("▁w" if i % 3 != 2 else "sub") + str(i))
    units = Dictionary.units(cfg.unit_decoder.vocab_size - 5)
    units.add_blank()
    return engine, d, units


def test_record_and_nosync_replay(stack):
    engine, d, units = stack
    agent = StreamSpeechS2STAgent(
        engine, StreamSpeechAgentConfig(source_segment_size=320), d, d, units)
    assert agent._starts_word is not None

    collected = []
    orig = engine.new_session

    def recording():
        s = orig()
        s.record = []
        collected.append(s.record)
        return s

    engine.new_session = recording
    try:
        rng = np.random.default_rng(0)
        sources = [(0.2 * rng.standard_normal(16000 * 2)).astype(
            np.float32).tolist() for _ in range(2)]
        ev = SentenceLevelEvaluator(agent, source_segment_size=320,
                                    quality_metrics=[])
        ev(sources, ["r", "r"])
    finally:
        engine.new_session = orig

    n_calls = sum(len(r) for r in collected)
    assert n_calls > 0, "no fused-policy calls recorded"
    # each record carries the full arg bundle
    r0 = [r for r in collected if r][0][0]
    for key in ("block", "mt_buf", "static", "starts_word"):
        assert key in r0

    res = measure_nosync_rtf(engine, collected, trials=1)
    assert res is not None
    assert res["nosync_n_chunks"] == n_calls
    assert res["nosync_xrealtime"] > 0
