"""rm_silence ASR-BLEU preprocessing (`asr_bleu_rm_silence/utils.py:232-243`)."""

import numpy as np
import torch

from streamspeech_tpu.eval.quality import (
    ASRBLEUScorer,
    remove_simuleval_silence,
)


def _reference_rm_silence(wav: np.ndarray) -> np.ndarray:
    """The reference's exact torch expression (utils.py:234-241)."""
    w = torch.tensor(wav)[None]
    left = (w == 0).contiguous()
    right = (w == 0).contiguous()
    for i in range(10):
        left = left & (torch.roll(w, shifts=-1 * i, dims=-1) == 0)
        right = right & (torch.roll(w, shifts=i, dims=-1) == 0)
    mask = (w == 0) & (left | right)
    return w[:, ~mask[0]].numpy()[0]


def test_matches_reference_expression():
    rng = np.random.RandomState(0)
    pieces = []
    for n_sil in [0, 3, 9, 10, 18, 19, 50, 4000]:
        pieces.append(rng.randn(37).astype(np.float32) + 0.5)
        pieces.append(np.zeros(n_sil, np.float32))
    wav = np.concatenate(pieces)
    ours = remove_simuleval_silence(wav)
    ref = _reference_rm_silence(wav)
    np.testing.assert_array_equal(ours, ref)


def test_long_silence_fully_removed():
    rng = np.random.RandomState(1)
    a = rng.randn(100).astype(np.float32) + 1.0
    b = rng.randn(80).astype(np.float32) + 1.0
    stitched = np.concatenate([a, np.zeros(5120, np.float32), b])
    out = remove_simuleval_silence(stitched)
    np.testing.assert_array_equal(out, np.concatenate([a, b]))


def test_asr_bleu_scorer_strips_silence():
    """Stitched wav with SimulEval silences transcribes identically to the
    pre-stitch concatenation (VERDICT r1 Next #5 done-criterion)."""
    rng = np.random.RandomState(2)
    chunk1 = rng.randn(320).astype(np.float32) + 1.0
    chunk2 = rng.randn(480).astype(np.float32) + 1.0
    concat = np.concatenate([chunk1, chunk2])
    stitched = np.concatenate(
        [chunk1, np.zeros(1600, np.float32), chunk2])

    seen = []

    def fake_asr(wav, sample_rate=16000):
        seen.append(np.asarray(wav))
        return f"len {len(wav)}"

    class Ins:
        def __init__(self, wav):
            self.stitched = wav
            self.reference = "ref"
            self.prediction = ""

    scorer = ASRBLEUScorer(asr_fn=fake_asr)  # remove_silence defaults True
    hyp_stitched = scorer.transcripts({0: Ins(stitched)})[0]
    hyp_concat = scorer.transcripts({1: Ins(concat)})[0]
    assert hyp_stitched == hyp_concat
    np.testing.assert_array_equal(seen[0], seen[1])

    # and the raw variant keeps the silence
    raw = ASRBLEUScorer(asr_fn=fake_asr, remove_silence=False)
    assert raw.transcripts({0: Ins(stitched)})[0] == f"len {len(stitched)}"
