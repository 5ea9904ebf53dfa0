"""Flagship end-to-end learnability golden (VERDICT r3 item #5).

The reference's de-facto golden test is quality+latency on real data
(`/root/reference/README.md:207-208`: ASR_BLEU 15.448 / AL 1724.9 after the
example training run). No released data/checkpoints exist in this
environment, so the local equivalent trains the REAL model (real criterion,
streaming masks, random n2) on the deterministic wav-based toy S2ST task
through the REAL CLIs — `cli.train`, then STREAMING evaluation exactly like
the reference golden: `cli.simuleval --agent s2tt` for text, the streaming
S2ST agent (batched evaluator) for units. A simul-trained model is
in-distribution only under its streaming masks — offline full-context
decode systematically under-scores it, which is why the eval is streaming.
Gates:

  trained unit edit rate < 0.3 absolute AND < half the untrained rate,
  trained text token accuracy > 0.8, BLEU > 30, finite AL.

Gate calibration: at this toy scale (300 train utterances, 2000 steps) the
text head's outcome is trajectory-sensitive — ANY ~1-ulp change to the loss
math (e.g. the CTC logits-space-gather fusion, whose value/grad parity is
asserted to float tolerance in test_ctc_loss.py) decoheres the run into an
independent draw. Measured healthy-run spread (docs/golden_learnability.md):
text acc {1.000, 0.863, 0.836}, BLEU {84.0, 62.8, 60.7}; unit edit rate is
stable {0.219-0.237}. The gates sit below every healthy run and far above
failure modes (untrained = 0.0 acc / 0.0 BLEU; a broken text branch
plateaus ≈ 0.5 acc — see the offline-decode note in
docs/golden_learnability.md).

Stages run as plain-CPU subprocesses (fresh backend each; no mesh/global
state bleed into the suite). ~15-20 min on this box's single core — the
slowest test in the suite, by design the closest to the reference golden.
"""

import numpy as np
import pytest


def test_toy_dataset_roundtrip(tmp_path):
    """The generated task loads through the real dataset/task plumbing."""
    from streamspeech_tpu.config import MultitaskConfig, S2SDataConfig
    from streamspeech_tpu.data.dataset import SpeechToSpeechDataset
    from streamspeech_tpu.data.toy_task import (
        generate_toy_dataset,
        read_dev_refs,
    )
    from streamspeech_tpu.dictionary import Dictionary

    task = generate_toy_dataset(str(tmp_path), n_train=8, n_dev=4, seed=3)
    unit_dict = Dictionary.units(task["n_units"])
    unit_dict.add_blank()
    mt_cfg = MultitaskConfig.load(
        str(tmp_path / task["multitask_config_yaml"]))
    assert set(mt_cfg.tasks) == {"target_unigram", "source_unigram",
                                 "ctc_target_unigram"}
    assert mt_cfg.tasks["target_unigram"].loss_weight == 8.0
    dicts = {n: Dictionary.load(t.dict_path) for n, t in mt_cfg.tasks.items()}
    targets = {
        n: SpeechToSpeechDataset.load_multitask_targets(
            str(tmp_path / n / "dev.tsv"), dicts[n])
        for n in mt_cfg.tasks}
    ds = SpeechToSpeechDataset(
        str(tmp_path / "dev.tsv"), unit_dict,
        S2SDataConfig.load(str(tmp_path / task["config_yaml"])),
        targets, split="dev")
    assert len(ds) == 4
    batch = ds.collate(np.arange(4))
    assert batch["src_tokens"].shape[-1] == 80
    # unit ids in the batch are dict ids (raw code + 4 specials)
    refs = read_dev_refs(str(tmp_path))
    raw0 = refs[0][1]
    assert list(batch["target_units"][0][: len(raw0)]) == \
        [u + 4 for u in raw0]
    # text targets match the reference tokens through the dictionary
    # (dict symbols are spm pieces "▁w3" so the streaming agents' spm_to_text
    # detokenization yields "w3 w1 ..." — refs carry the detokenized words)
    d = dicts["target_unigram"]
    ids = batch["mt_targets"][0]
    toks = [d[i].lstrip("▁") for i in ids if i >= d.nspecial]
    assert toks == refs[0][2]


@pytest.mark.slow
def test_learnability_golden(tmp_path):
    """Reference-shaped golden: train the simul model, evaluate STREAMING
    (cli.simuleval s2tt for text, the streaming S2ST agent for units).
    Recorded runs in docs/golden_learnability.md; gates per the module
    docstring's healthy-run spread."""
    import numpy as _np

    from streamspeech_tpu.data.toy_task import run_learnability_golden

    res = run_learnability_golden(str(tmp_path), max_update=2000,
                                  n_train=300, n_dev=24)
    u, t = res["untrained"], res["trained"]
    # the untrained model must make the comparison non-vacuous
    assert u["unit_edit_rate"] > 0.6, u
    assert t["unit_edit_rate"] < 0.3, res
    assert t["unit_edit_rate"] < 0.5 * u["unit_edit_rate"], res
    assert t["text_token_acc"] > 0.8, res
    assert t.get("BLEU", 0.0) > 30.0, res
    # the streaming eval must be genuinely streaming: finite average lagging
    assert _np.isfinite(t.get("AL", _np.nan)), res
