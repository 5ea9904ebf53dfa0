import numpy as np

from streamspeech_tpu.eval.bleu_native import BleuScorer, _load
from streamspeech_tpu.eval.evaluator import SentenceLevelEvaluator
from streamspeech_tpu.eval.service import AgentService, RemoteAgent
from tests.test_eval_harness import DummyWaitKAgent


def test_native_bleu_matches_python_and_sacrebleu():
    rng = np.random.RandomState(0)
    pairs = [(rng.randint(0, 50, size=rng.randint(8, 20)).tolist(),
              rng.randint(0, 50, size=rng.randint(8, 20)).tolist())
             for _ in range(20)]
    pairs.append(([1, 2, 3, 4, 5, 6], [1, 2, 3, 4, 5, 6]))

    native = BleuScorer()
    py = BleuScorer()
    py._lib = None
    for ref, hyp in pairs:
        native.add(ref, hyp)
        py._add_py(ref, hyp)
    assert abs(native.score() - py.score()) < 1e-9 or _load() is None

    # cross-check vs sacrebleu on string-ified tokens
    import sacrebleu

    hyps = [" ".join(map(str, h)) for _, h in pairs]
    refs = [[" ".join(map(str, r)) for r, _ in pairs]]
    sb = sacrebleu.corpus_bleu(hyps, refs, tokenize="none",
                               smooth_method="none").score
    assert abs(native.score() - sb) < 0.2


def test_remote_agent_service():
    agent = DummyWaitKAgent()
    service = AgentService(agent, host="127.0.0.1", port=0)
    port = service.start(background=True)
    try:
        remote = RemoteAgent(f"http://127.0.0.1:{port}",
                             source_type="speech", target_type="text")
        ev = SentenceLevelEvaluator(remote, source_segment_size=320,
                                    quality_metrics=["BLEU"])
        scores = ev([list(np.zeros(16000))], ["w1 w2 w3 w4 w5"])
        assert scores["BLEU"] > 99.0
    finally:
        service.stop()


def test_native_edit_distance_matches_python():
    import numpy as np

    from streamspeech_tpu.eval.quality import (
        _edit_distance,
        _load_edit_lib,
        batched_edit_distance,
    )

    rng = np.random.RandomState(0)
    pairs = []
    for _ in range(30):
        a = [f"w{int(x)}" for x in rng.randint(0, 12, rng.randint(0, 25))]
        b = [f"w{int(x)}" for x in rng.randint(0, 12, rng.randint(0, 25))]
        pairs.append((a, b))
    pairs.append(([], []))
    pairs.append((["x"], []))
    got = batched_edit_distance(pairs)
    ref = [_edit_distance(a, b) for a, b in pairs]
    assert got == ref
    assert _load_edit_lib() is not None, "native kernel failed to build"
