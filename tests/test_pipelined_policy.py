"""Overlapped (pipelined) streaming ≡ synchronous fused path.

The pipelined runtime (runtime/session.py policy_step_pipelined) keeps the
policy counters device-resident and dispatches chunk N+1 before fetching
chunk N; the host observes results with a small lag and attributes writes to
their DECISION positions. This must not change ANY observable vs the
synchronous fused path: per-instance delays, emitted wav samples, units, and
MT tokens all match exactly (the reference policy semantics of
`agent/speech_to_speech.streamspeech.agent.py:422-770`)."""

import jax
import numpy as np
import pytest

from streamspeech_tpu.agents.streamspeech import (
    StreamSpeechAgentConfig,
    StreamSpeechS2STAgent,
)
from streamspeech_tpu.eval.evaluator import SentenceLevelEvaluator

from tests.test_fused_policy import stack  # noqa: F401 (fixture)


def run_eval(engine, src_dict, unit_dict, sources, whole_word, mode,
             max_lag=8, segment_ms=320):
    agent = StreamSpeechS2STAgent(
        engine,
        StreamSpeechAgentConfig(source_segment_size=segment_ms,
                                whole_word=whole_word,
                                pipelined=(mode == "pipelined"),
                                pipe_max_lag=max_lag,
                                # age-based fetch disabled: force the deepest
                                # pipeline (worst case for exactness)
                                pipe_ready_s=3600.0),
        src_dict, src_dict, unit_dict)
    assert agent._starts_word is not None
    if mode == "host":
        agent._starts_word = None
    ev = SentenceLevelEvaluator(agent, source_segment_size=segment_ms,
                                quality_metrics=[])
    ev(sources, ["ref"] * len(sources))
    return ev.instances


def assert_instances_equal(a, b, require_writes=True):
    wrote = 0
    for k in a:
        ha, hb = a[k], b[k]
        assert ha.delays == hb.delays, f"instance {k} delays differ"
        np.testing.assert_allclose(
            np.asarray(hb.stitched, np.float32),
            np.asarray(ha.stitched, np.float32), atol=1e-5,
            err_msg=f"instance {k} wavs differ")
        if ha.delays:
            wrote += 1
    if require_writes:
        assert wrote >= 1, "vacuous: no instance ever wrote"


@pytest.mark.parametrize("whole_word", [False, True])
def test_pipelined_equals_sync(stack, whole_word):  # noqa: F811
    cfg, engine, src_dict, unit_dict = stack
    rng = np.random.RandomState(0)
    sources = [list(rng.uniform(-0.4, 0.4, 16000)),
               list(rng.uniform(-0.4, 0.4, 23456))]  # non-block-aligned tail

    sync = run_eval(engine, src_dict, unit_dict, sources, whole_word, "sync")
    piped = run_eval(engine, src_dict, unit_dict, sources, whole_word,
                     "pipelined")
    assert_instances_equal(sync, piped)


@pytest.mark.parametrize("max_lag", [1, 3])
def test_pipelined_lag_depths(stack, max_lag):  # noqa: F811
    """Exactness must hold at every pipeline depth (the fetch schedule is a
    pure performance knob)."""
    cfg, engine, src_dict, unit_dict = stack
    rng = np.random.RandomState(1)
    sources = [list(rng.uniform(-0.4, 0.4, 20000))]

    sync = run_eval(engine, src_dict, unit_dict, sources, False, "sync")
    piped = run_eval(engine, src_dict, unit_dict, sources, False, "pipelined",
                     max_lag=max_lag)
    assert_instances_equal(sync, piped)


def test_pipelined_equals_host_path(stack):  # noqa: F811
    """Transitivity guard: pipelined == the original HOST policy path (the
    reference-parity baseline), not just the fused twin."""
    cfg, engine, src_dict, unit_dict = stack
    rng = np.random.RandomState(2)
    sources = [list(rng.uniform(-0.4, 0.4, 16000))]

    host = run_eval(engine, src_dict, unit_dict, sources, False, "host")
    piped = run_eval(engine, src_dict, unit_dict, sources, False, "pipelined")
    assert_instances_equal(host, piped)


def test_pipelined_budget_fallback(stack):  # noqa: F811
    """Force the decode budget past the fused scan length mid-stream (tiny
    fused_steps): the pipelined runtime must drain, run the exact host
    continuation, replay the speculated chunks, and still match the
    synchronous path bit-for-bit."""
    cfg, engine, src_dict, unit_dict = stack
    rng = np.random.RandomState(3)
    sources = [list(rng.uniform(-0.4, 0.4, 20000))]

    old_steps = engine.fused_steps
    try:
        engine.fused_steps = 2  # budgets of 3+ tokens now overflow the scan
        sync = run_eval(engine, src_dict, unit_dict, sources, False, "sync")
        piped = run_eval(engine, src_dict, unit_dict, sources, False,
                         "pipelined")
    finally:
        engine.fused_steps = old_steps
    assert_instances_equal(sync, piped, require_writes=False)
    assert any(i.delays for i in sync.values()), "vacuous fallback test"
