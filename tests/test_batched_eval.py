"""Batched corpus evaluation must reproduce the sequential evaluator exactly:
same per-instance predictions, delays, and durations — only wall-clock
(`elapsed`, the _CA metrics) may differ. Waves of B instances share one
lockstep BatchedStreamingSession (eval/batched_evaluator.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamspeech_tpu.agents.streamspeech import (
    StreamSpeechAgentConfig,
    StreamSpeechS2STAgent,
)
from streamspeech_tpu.dictionary import Dictionary
from streamspeech_tpu.eval.batched_evaluator import BatchedS2STEvaluator
from streamspeech_tpu.eval.evaluator import SentenceLevelEvaluator
from streamspeech_tpu.models.streamspeech import StreamSpeechModel, init_params
from streamspeech_tpu.models.vocoder import CodeGenerator
from streamspeech_tpu.runtime.session import StreamSpeechEngine
from streamspeech_tpu.train.synthetic import tiny_config
from tests.test_vocoder import tiny_cfg as tiny_vocoder_cfg


def make_dicts(text_vocab, unit_count):
    d = Dictionary()
    for i in range(text_vocab - 4):
        d.add_symbol("▁w" + str(i))
    units = Dictionary.units(unit_count)
    units.add_blank()
    return d, units


def doctor_params(variables):
    """Bias a random tiny model so the streaming policy actually WRITES:
    suppress CTC blanks (hypotheses grow every chunk), zero the special-token
    embedding rows of the MT and unit decoders (EOS/PAD rarely argmax, units
    rarely blank). Without this every instance is all-READ + one empty final
    write and an exactness test is vacuous."""
    p = variables["params"]
    for head in ("source_unigram_head", "ctc_target_unigram_head"):
        b = p[head]["proj"]["bias"]
        p[head]["proj"]["bias"] = b.at[0].add(-8.0)
    emb = p["mt_decoder"]["embed_tokens"]
    p["mt_decoder"]["embed_tokens"] = emb.at[:4].set(0.0)
    uemb = p["unit_decoder"]["embed_tokens"]
    p["unit_decoder"]["embed_tokens"] = uemb.at[:4].set(0.0).at[-1].set(0.0)
    return variables


@pytest.fixture(scope="module")
def stack():
    cfg = tiny_config()
    model = StreamSpeechModel(cfg)
    variables = doctor_params(init_params(model, jax.random.PRNGKey(0)))
    voc_cfg = tiny_vocoder_cfg()
    voc_cfg["num_embeddings"] = cfg.unit_decoder.vocab_size - 4
    vocoder = CodeGenerator(voc_cfg)
    voc_vars = vocoder.init(jax.random.PRNGKey(1), jnp.zeros((1, 4), jnp.int32),
                            max_frames=8)
    engine = StreamSpeechEngine(model, variables, vocoder, voc_vars,
                                max_enc_frames=128, max_mt_tokens=32,
                                mt_buckets=(8, 16, 32),
                                unit_buckets=(16, 32, 64))
    src_dict, unit_dict = make_dicts(cfg.mt_decoder.vocab_size, 19)
    return cfg, engine, src_dict, unit_dict


def test_batched_evaluator_matches_sequential(stack, tmp_path):
    cfg, engine, src_dict, unit_dict = stack
    agent_cfg = StreamSpeechAgentConfig(source_segment_size=320)
    rng = np.random.RandomState(5)
    lengths = [11200, 19200, 8000, 24000, 14000]  # 0.5–1.5 s, ragged
    sources = [list(rng.uniform(-0.3, 0.3, n)) for n in lengths]
    refs = ["dummy"] * len(sources)

    agent = StreamSpeechS2STAgent(engine, agent_cfg, src_dict, src_dict,
                                  unit_dict)
    seq = SentenceLevelEvaluator(agent, source_segment_size=320,
                                 quality_metrics=[],
                                 output_dir=str(tmp_path / "seq"))
    seq(sources, refs)

    bat = BatchedS2STEvaluator(engine, agent_cfg, src_dict, src_dict,
                               unit_dict, batch=3, quality_metrics=[],
                               output_dir=str(tmp_path / "bat"))
    bat(sources, refs)

    assert set(seq.instances) == set(bat.instances) == set(range(len(sources)))
    # the comparison must not be vacuous: the doctored model really streams
    assert any(len(ins.delays) > 0 for ins in seq.instances.values()), \
        "no instance ever wrote — exactness comparison is vacuous"
    for i in seq.instances:
        a, b = seq.instances[i].summarize(), bat.instances[i].summarize()
        assert a["delays"] == b["delays"], f"instance {i} delays differ"
        np.testing.assert_allclose(a["durations"], b["durations"], atol=1e-6,
                                   err_msg=f"instance {i}")
        assert a["source_length"] == b["source_length"]
        assert seq.instances[i].finish_prediction
        assert bat.instances[i].finish_prediction
        for wa, wb in zip(seq.instances[i].prediction_list,
                          bat.instances[i].prediction_list):
            np.testing.assert_allclose(np.asarray(wa), np.asarray(wb),
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=f"instance {i} wav differs")


def test_batched_evaluator_whole_word_matches_sequential(stack):
    """whole_word=True exercises the device-side word-start rollback of the
    fused batched program (policy_step_batched starts_word path)."""
    cfg, engine, src_dict, unit_dict = stack
    agent_cfg = StreamSpeechAgentConfig(source_segment_size=640,
                                        whole_word=True)
    rng = np.random.RandomState(13)
    sources = [list(rng.uniform(-0.3, 0.3, n)) for n in (12800, 19200)]
    refs = ["dummy"] * len(sources)

    agent = StreamSpeechS2STAgent(engine, agent_cfg, src_dict, src_dict,
                                  unit_dict)
    seq = SentenceLevelEvaluator(agent, source_segment_size=640,
                                 quality_metrics=[])
    seq(sources, refs)
    bat = BatchedS2STEvaluator(engine, agent_cfg, src_dict, src_dict,
                               unit_dict, batch=2, quality_metrics=[])
    assert bat.use_fused
    bat(sources, refs)
    assert any(len(ins.delays) > 0 for ins in seq.instances.values()), \
        "vacuous: whole-word policy never wrote"
    for i in seq.instances:
        assert seq.instances[i].summarize()["delays"] == \
            bat.instances[i].summarize()["delays"], i
        for wa, wb in zip(seq.instances[i].prediction_list,
                          bat.instances[i].prediction_list):
            np.testing.assert_allclose(np.asarray(wa), np.asarray(wb),
                                       rtol=1e-4, atol=1e-5, err_msg=str(i))


def test_batched_evaluator_split_fetch_matches_sequential(stack):
    """Large waves fetch the wav tails in a second, emit-only RPC
    (runtime/batched.py fused_tick split path) — force the split with a zero
    threshold and assert exactness is unchanged."""
    cfg, engine, src_dict, unit_dict = stack
    agent_cfg = StreamSpeechAgentConfig(source_segment_size=320)
    rng = np.random.RandomState(12)
    sources = [list(rng.uniform(-0.3, 0.3, n)) for n in (11200, 14000)]
    refs = ["dummy"] * len(sources)

    agent = StreamSpeechS2STAgent(engine, agent_cfg, src_dict, src_dict,
                                  unit_dict)
    seq = SentenceLevelEvaluator(agent, source_segment_size=320,
                                 quality_metrics=[])
    seq(sources, refs)

    engine.split_fetch_bytes = 0
    try:
        bat = BatchedS2STEvaluator(engine, agent_cfg, src_dict, src_dict,
                                   unit_dict, batch=2, quality_metrics=[])
        bat(sources, refs)
    finally:
        del engine.split_fetch_bytes
    assert any(len(ins.delays) > 0 for ins in seq.instances.values())
    for i in seq.instances:
        assert seq.instances[i].summarize()["delays"] == \
            bat.instances[i].summarize()["delays"], i
        for wa, wb in zip(seq.instances[i].prediction_list,
                          bat.instances[i].prediction_list):
            np.testing.assert_allclose(np.asarray(wa), np.asarray(wb),
                                       rtol=1e-4, atol=1e-5, err_msg=str(i))


def test_batched_evaluator_host_path_matches_sequential(stack, tmp_path):
    """use_fused=False forces the multi-RPC host tick (also the fallback for
    engines without the fused batched program) — must stay exact too."""
    cfg, engine, src_dict, unit_dict = stack
    agent_cfg = StreamSpeechAgentConfig(source_segment_size=320)
    rng = np.random.RandomState(11)
    sources = [list(rng.uniform(-0.3, 0.3, n)) for n in (11200, 16000)]
    refs = ["dummy"] * len(sources)

    agent = StreamSpeechS2STAgent(engine, agent_cfg, src_dict, src_dict,
                                  unit_dict)
    seq = SentenceLevelEvaluator(agent, source_segment_size=320,
                                 quality_metrics=[])
    seq(sources, refs)
    bat = BatchedS2STEvaluator(engine, agent_cfg, src_dict, src_dict,
                               unit_dict, batch=2, use_fused=False,
                               quality_metrics=[])
    bat(sources, refs)
    assert any(len(ins.delays) > 0 for ins in seq.instances.values())
    for i in seq.instances:
        assert seq.instances[i].summarize()["delays"] == \
            bat.instances[i].summarize()["delays"], i
        for wa, wb in zip(seq.instances[i].prediction_list,
                          bat.instances[i].prediction_list):
            np.testing.assert_allclose(np.asarray(wa), np.asarray(wb),
                                       rtol=1e-4, atol=1e-5, err_msg=str(i))


def test_batched_evaluator_resume(stack, tmp_path):
    """continue_unfinished must skip already-logged indices (waves only cover
    the remainder)."""
    cfg, engine, src_dict, unit_dict = stack
    agent_cfg = StreamSpeechAgentConfig(source_segment_size=320)
    rng = np.random.RandomState(6)
    sources = [list(rng.uniform(-0.3, 0.3, 8000)) for _ in range(4)]
    refs = ["dummy"] * 4
    out = str(tmp_path / "resume")
    bat = BatchedS2STEvaluator(engine, agent_cfg, src_dict, src_dict,
                               unit_dict, batch=2, quality_metrics=[],
                               output_dir=out)
    bat(sources[:2], refs[:2])
    bat2 = BatchedS2STEvaluator(engine, agent_cfg, src_dict, src_dict,
                                unit_dict, batch=2, quality_metrics=[],
                                output_dir=out)
    bat2(sources, refs, continue_unfinished=True)
    import json
    from pathlib import Path
    lines = (Path(out) / "instances.log").read_text().splitlines()
    idx = [json.loads(l)["index"] for l in lines]
    assert sorted(idx) == [0, 1, 2, 3] and len(idx) == 4


def test_batched_s2tt_and_asr_match_sequential(stack, tmp_path):
    from streamspeech_tpu.agents.streamspeech import (
        StreamSpeechASRAgent,
        StreamSpeechS2TTAgent,
    )
    from streamspeech_tpu.eval.batched_evaluator import (
        BatchedASREvaluator,
        BatchedS2TTEvaluator,
    )

    cfg, engine, src_dict, unit_dict = stack
    agent_cfg = StreamSpeechAgentConfig(source_segment_size=320)
    rng = np.random.RandomState(9)
    sources = [list(rng.uniform(-0.3, 0.3, n))
               for n in (9600, 17000, 12800, 7000)]
    refs = ["dummy"] * len(sources)

    for name, agent, bat in (
        ("s2tt",   # fused one-RPC tick (with_emission=False program)
         StreamSpeechS2TTAgent(engine, agent_cfg, src_dict, src_dict),
         BatchedS2TTEvaluator(engine, agent_cfg, src_dict, src_dict, batch=3,
                              quality_metrics=[])),
        ("s2tt-host",
         StreamSpeechS2TTAgent(engine, agent_cfg, src_dict, src_dict),
         BatchedS2TTEvaluator(engine, agent_cfg, src_dict, src_dict, batch=3,
                              use_fused=False, quality_metrics=[])),
        ("asr",
         StreamSpeechASRAgent(engine, agent_cfg, src_dict),
         BatchedASREvaluator(engine, agent_cfg, src_dict, src_dict, batch=3,
                             quality_metrics=[])),
    ):
        seq = SentenceLevelEvaluator(agent, source_segment_size=320,
                                     quality_metrics=[])
        seq(sources, refs)
        bat(sources, refs)
        wrote = 0
        for i in seq.instances:
            a, b = seq.instances[i].summarize(), bat.instances[i].summarize()
            assert a["prediction"] == b["prediction"], f"{name} instance {i}"
            assert a["delays"] == b["delays"], f"{name} instance {i}"
            wrote += len(a["delays"])
        assert wrote > 0, f"{name}: no instance wrote — comparison vacuous"
