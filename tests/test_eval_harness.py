"""Harness tests with a scripted fake agent (SimulEval test strategy, SURVEY §4)
plus latency-scorer formula checks on hand-computed examples."""

import numpy as np

from streamspeech_tpu.agents.base import (
    AgentPipeline,
    EmptySegment,
    ReadAction,
    SpeechSegment,
    SpeechToTextAgent,
    TextSegment,
    WriteAction,
)
from streamspeech_tpu.eval.evaluator import SentenceLevelEvaluator
from streamspeech_tpu.eval.instance import SpeechOutputInstance, TextOutputInstance
from streamspeech_tpu.eval.latency import build_scorers


class DummyWaitKAgent(SpeechToTextAgent):
    """Emit one word per chunk after waiting 2 chunks."""

    def __init__(self):
        self.read_count = 0
        self.emitted = 0
        super().__init__()

    def reset(self):
        super().reset()
        self.read_count = 0
        self.emitted = 0

    def policy(self):
        self.read_count += 1
        if self.read_count <= 2 and not self.states.source_finished:
            return ReadAction()
        if self.states.source_finished and self.emitted >= 5:
            self.states.target_finished = True
            return WriteAction(TextSegment(content="", finished=True),
                               finished=True)
        self.emitted += 1
        fin = self.states.source_finished and self.emitted >= 5
        if fin:
            self.states.target_finished = True
        return WriteAction(TextSegment(content=f"w{self.emitted}", finished=fin),
                           finished=fin)


def test_evaluator_text_output(tmp_path):
    agent = DummyWaitKAgent()
    ev = SentenceLevelEvaluator(agent, source_segment_size=320,
                                quality_metrics=["BLEU"],
                                output_dir=str(tmp_path))
    sources = [list(np.zeros(16000)), list(np.zeros(8000))]
    refs = ["w1 w2 w3 w4 w5", "w1 w2 w3 w4 w5"]
    scores = ev(sources, refs)
    assert scores["BLEU"] > 99.0  # exact match
    assert np.isfinite(scores["AL"])
    assert (tmp_path / "instances.log").exists()
    assert (tmp_path / "scores.tsv").exists()
    # resume: second run with continue_unfinished skips everything
    n_lines = len((tmp_path / "instances.log").read_text().splitlines())
    ev2 = SentenceLevelEvaluator(DummyWaitKAgent(), output_dir=str(tmp_path))
    ev2(sources, refs, continue_unfinished=True)
    assert len((tmp_path / "instances.log").read_text().splitlines()) == n_lines


def make_text_instance(delays, src_len_ms, ref="a b c"):
    ins = TextOutputInstance(0, [0.0] * int(src_len_ms * 16), ref)
    ins.delays = list(delays)
    ins.elapsed = [d + 10 for d in delays]
    ins.prediction_list = [f"t{i}" for i in range(len(delays))]
    return ins


def test_al_formula():
    # hand example: src 1000ms, delays [200, 600, 1000], ref len 3
    scorers = build_scorers(["AL"])
    ins = make_text_instance([200, 600, 1000], 1000)
    # gamma = 3/1000; AL = 1/3 * [(200-0) + (600 - 1000/3) + (1000 - 2000/3)]
    expect = (200 + (600 - 1000 / 3) + (1000 - 2000 / 3)) / 3
    got = scorers["AL"]({0: ins})
    assert abs(got - expect) < 1e-6
    # CA twin uses elapsed (+10ms)
    got_ca = scorers["AL_CA"]({0: ins})
    assert got_ca > got


def test_ap_dal_offsets():
    s = build_scorers(["AP", "DAL", "StartOffset", "EndOffset", "RTF",
                       "NumChunks"])
    ins = make_text_instance([200, 600, 1000], 1000)
    assert abs(s["AP"]({0: ins}) - (1800 / (1000 * 3))) < 1e-6
    assert s["StartOffset"]({0: ins}) == 200
    assert s["EndOffset"]({0: ins}) == 0
    assert abs(s["RTF"]({0: ins}) - 1.0) < 1e-6
    assert s["NumChunks"]({0: ins}) == 3
    # DAL: gamma=3/1000; g' = [200, max(600, 200+333.3)=600, max(1000, 933.3)]
    g = 1000 / 3
    expect = ((200 - 0) + (600 - g) + (1000 - 2 * g)) / 3
    assert abs(s["DAL"]({0: ins}) - expect) < 1e-3


def test_speech_output_stitching(tmp_path):
    ins = SpeechOutputInstance(0, [0.0] * 16000, "ref",
                               output_dir=str(tmp_path))
    sr = 16000
    ins.target_sample_rate = sr
    # two segments: at 320ms (160ms audio), then a discontinuity at 960ms
    ins.delays = [320.0, 960.0]
    ins.durations = [160.0, 100.0]
    ins.prediction_list = [[0.1] * int(sr * 0.16), [0.2] * int(sr * 0.1)]
    summary = ins.summarize()
    # silence of 960 - (320+160) = 480ms inserted
    assert ins.silences == [480.0]
    assert summary["intervals"] == [[320.0, 160.0], [960.0, 100.0]]
    import wave
    with wave.open(summary["prediction"]) as f:
        assert f.getnframes() == int(sr * 0.16) + int(sr * 0.48) + int(sr * 0.1)


def test_pipeline_type_check():
    a = DummyWaitKAgent()
    try:
        AgentPipeline([a, DummyWaitKAgent()])
        assert False, "should have raised"
    except ValueError:
        pass


def test_score_only_roundtrip(tmp_path):
    agent = DummyWaitKAgent()
    ev = SentenceLevelEvaluator(agent, source_segment_size=320,
                                quality_metrics=[], output_dir=str(tmp_path))
    sources = [list(np.zeros(16000))]
    scores = ev(sources, ["w1 w2 w3 w4 w5"])
    ev2 = SentenceLevelEvaluator(DummyWaitKAgent(), quality_metrics=[],
                                 output_dir=str(tmp_path))
    rescored = ev2.score_only()
    for key in ["AL", "AP", "DAL", "StartOffset", "RTF"]:
        assert abs(scores[key] - rescored[key]) < 1e-6, key


def test_watchdog_and_nan_detector():
    import time

    from streamspeech_tpu.utils.watchdog import HeartbeatWatchdog, \
        check_finite_tree

    fired = []
    w = HeartbeatWatchdog(timeout=0.3, on_timeout=lambda: fired.append(1))
    w.start()
    for _ in range(3):
        time.sleep(0.1)
        w.beat()
    assert not fired
    time.sleep(0.6)
    assert fired
    w.stop()

    bad = check_finite_tree({"a": np.array([1.0, np.nan]),
                             "b": np.array([1.0])}, "params")
    assert bad == ["params['a']"]
