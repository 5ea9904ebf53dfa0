"""Fused single-round-trip policy step ≡ host policy path.

The fused program (runtime/session.py policy_step) moves every policy decision
on-device; this must not change ANY observable: actions, delays, emitted wav
samples, units, or MT tokens. Both paths run the same doctored tiny model over
the same audio through the evaluator and must match exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamspeech_tpu.agents.streamspeech import (
    StreamSpeechAgentConfig,
    StreamSpeechS2STAgent,
)
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
    voc_vars = vocoder.init(jax.random.PRNGKey(1), jnp.zeros((1, 4), jnp.int32),
                            max_frames=8)
    engine = StreamSpeechEngine(model, variables, vocoder, voc_vars,
                                max_enc_frames=64, max_mt_tokens=32,
                                mt_buckets=(8, 16, 32),
                                unit_buckets=(16, 32, 64))
    d = Dictionary()
    for i in range(cfg.mt_decoder.vocab_size - 4):
        d.add_symbol(("▁w" if i % 3 != 2 else "sub") + str(i))
    units = Dictionary.units(cfg.unit_decoder.vocab_size - 5)
    units.add_blank()
    return cfg, engine, d, units


def run_eval(engine, src_dict, unit_dict, sources, whole_word, fused):
    agent = StreamSpeechS2STAgent(
        engine,
        StreamSpeechAgentConfig(source_segment_size=320,
                                whole_word=whole_word),
        src_dict, src_dict, unit_dict)
    assert agent._starts_word is not None
    if not fused:
        agent._starts_word = None  # forces the host path
    ev = SentenceLevelEvaluator(agent, source_segment_size=320,
                                quality_metrics=[])
    ev(sources, ["ref"] * len(sources))
    return ev.instances


@pytest.mark.parametrize("whole_word", [False, True])
def test_fused_equals_host_path(stack, whole_word):
    cfg, engine, src_dict, unit_dict = stack
    rng = np.random.RandomState(0)
    sources = [list(rng.uniform(-0.4, 0.4, 16000)),
               list(rng.uniform(-0.4, 0.4, 23456))]  # non-block-aligned tail

    host = run_eval(engine, src_dict, unit_dict, sources, whole_word, False)
    fused = run_eval(engine, src_dict, unit_dict, sources, whole_word, True)

    wrote = 0
    for k in host:
        h, f = host[k], fused[k]
        assert h.delays == f.delays, f"instance {k} delays differ"
        np.testing.assert_allclose(
            np.asarray(f.stitched, np.float32),
            np.asarray(h.stitched, np.float32), atol=1e-5,
            err_msg=f"instance {k} wavs differ")
        if h.delays:
            wrote += 1
    assert wrote >= 1, "vacuous: no instance ever wrote"
