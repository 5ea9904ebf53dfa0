"""CLI-level golden smoke (VERDICT r1 Next #7): synthetic wavs + doctored tiny
checkpoint + reference-format torch vocoder driven end-to-end through
cli.simuleval.main (evaluate, then --score-only) and cli.generate.main,
asserting the instances.log / scores.tsv schema and the A-/D-/U- line formats
(`SimulEval/simuleval/evaluator/evaluator.py:135-209`, `fairseq_cli/generate.py:201`)."""

import dataclasses
import json
import re

import jax
import numpy as np
import pytest

from streamspeech_tpu.config import OptimizationConfig
from streamspeech_tpu.dictionary import Dictionary
from streamspeech_tpu.eval.instance import write_wav
from streamspeech_tpu.models.streamspeech import StreamSpeechModel, init_params
from streamspeech_tpu.train.checkpoint import save_checkpoint
from streamspeech_tpu.train.synthetic import tiny_config
from streamspeech_tpu.train.trainer import TrainState, make_optimizer
from ref_torch import make_torch_vocoder_ckpt
from tests.test_batched_eval import doctor_params


@pytest.fixture(scope="module")
def golden_dir(tmp_path_factory):
    """Checkpoint + dicts + vocoder ckpt + wavs, once per module."""
    root = tmp_path_factory.mktemp("golden")
    cfg = tiny_config()
    model = StreamSpeechModel(cfg)
    variables = doctor_params(init_params(model, jax.random.PRNGKey(0)))
    state = TrainState.create(variables,
                              make_optimizer(OptimizationConfig(update_freq=1)))
    save_checkpoint(str(root / "ck"), 0, state,
                    config=dataclasses.asdict(cfg))

    src_dict = Dictionary()
    for i in range(cfg.mt_decoder.vocab_size - 4):
        src_dict.add_symbol(f"▁w{i}")
    dict_path = root / "dict.txt"
    src_dict.save(str(dict_path))

    n_units = cfg.unit_decoder.vocab_size - 5  # 4 specials + blank
    voc_ckpt, voc_cfg = make_torch_vocoder_ckpt(root, num_embeddings=n_units)

    rng = np.random.RandomState(0)
    wavs = []
    for i, n in enumerate([16000, 23000]):
        w = root / f"utt{i}.wav"
        write_wav(w, rng.uniform(-0.4, 0.4, n).astype(np.float32), 16000)
        wavs.append(str(w))
    (root / "wav_list.txt").write_text("\n".join(wavs) + "\n")
    (root / "target.txt").write_text("a b c\nd e\n")
    return root, cfg, n_units


def test_simuleval_cli_golden(golden_dir, capsys):
    from streamspeech_tpu.cli.simuleval import main

    root, cfg, n_units = golden_dir
    out = root / "res"
    main(["--source", str(root / "wav_list.txt"),
          "--target", str(root / "target.txt"),
          "--checkpoint", str(root / "ck" / "checkpoint_0"),
          "--agent", "s2st", "--source-segment-size", "320",
          "--src-dict", str(root / "dict.txt"),
          "--target-code-size", str(n_units),
          "--vocoder", str(root / "g_00500000"),
          "--vocoder-cfg", str(root / "vocoder_config.json"),
          "--output", str(out), "--quality-metrics"])
    printed = capsys.readouterr().out

    # instances.log schema (evaluator.py:135-209 summary fields)
    lines = (out / "instances.log").read_text().splitlines()
    assert len(lines) == 2
    for line in lines:
        rec = json.loads(line)
        for key in ("index", "prediction", "delays", "durations", "elapsed",
                    "intervals", "prediction_length", "source_length",
                    "reference"):
            assert key in rec, f"missing {key}"
        assert len(rec["delays"]) == len(rec["durations"])
        if rec["delays"]:
            assert all(0 < d <= rec["source_length"] for d in rec["delays"])
    # at least one instance must actually have emitted audio (non-vacuous)
    recs = [json.loads(line) for line in lines]
    assert any(r["delays"] for r in recs), "no WRITEs — golden smoke vacuous"
    wav_files = list((out / "wavs").glob("*_pred.wav"))
    assert wav_files, "no prediction wavs written"

    # scores.tsv: header + one row, latency columns present
    tsv = (out / "scores.tsv").read_text().splitlines()
    assert len(tsv) == 2
    header = tsv[0].split("\t")
    for col in ("AL", "AP", "DAL", "RTF", "StartOffset"):
        assert col in header
    assert "AL" in printed

    # --score-only reproduces the non-CA latency numbers from the log
    main(["--source", str(root / "wav_list.txt"),
          "--target", str(root / "target.txt"),
          "--score-only", "--output", str(out)])
    rescored = capsys.readouterr().out
    first = dict(zip(header, tsv[1].split("\t")))
    for line in rescored.splitlines():
        name, _, val = line.partition("\t")
        if name in ("AL", "AP", "DAL", "StartOffset") and first.get(name, "nan") != "nan":
            assert abs(float(val) - float(first[name])) < 1e-2, name


def test_generate_cli_golden(golden_dir, capsys):
    from streamspeech_tpu.cli.generate import main

    root, cfg, n_units = golden_dir
    out = root / "gen"
    main(["--checkpoint", str(root / "ck" / "checkpoint_0"),
          "--manifest", str(root / "wav_list.txt"),
          "--src-dict", str(root / "dict.txt"),
          "--tgt-dict", str(root / "dict.txt"),
          "--beam", "2", "--output", str(out)])
    printed = capsys.readouterr().out.splitlines()
    # fairseq_cli/generate.py:201 line formats: A-/D-/U- per utterance
    for utt in ("0", "1"):
        assert any(re.match(rf"^A-{utt}\t", line) for line in printed), printed
        assert any(re.match(rf"^D-{utt}\t", line) for line in printed)
        u = next(line for line in printed if line.startswith(f"U-{utt}\t"))
        payload = u.split("\t", 1)[1].strip()
        if payload:
            units = [int(tok) for tok in payload.split()]
            assert all(0 <= x < n_units for x in units)
    units_txt = (out / "units.txt").read_text().splitlines()
    assert len(units_txt) == 2
    # doctored model must produce at least one unit somewhere (non-vacuous)
    assert any(line.strip() for line in units_txt)


def test_simuleval_slurm_submit(golden_dir, tmp_path, capsys):
    """--slurm writes output/script.sh re-invoking the CLI without the slurm
    flags, output pinned to the absolute results dir
    (`SimulEval/simuleval/utils/slurm.py:31-121`); sbatch absence is
    tolerated (script generation is the testable part)."""
    from streamspeech_tpu.cli.simuleval import main

    root, cfg, n_units = golden_dir
    out = tmp_path / "slurm_out"
    argv = ["--source", str(root / "wav_list.txt"),
            "--target", str(root / "target.txt"),
            "--checkpoint", str(root / "ck" / "checkpoint_0"),
            "--agent", "asr",
            "--src-dict", str(root / "dict.txt"),
            "--output", str(out),
            "--slurm", "--slurm-partition", "tpu",
            "--slurm-time", "1:00:00", "--slurm-job-name", "ss-eval"]
    main(argv)
    script = (out / "script.sh").read_text()
    assert "#SBATCH --partition=tpu" in script
    assert "#SBATCH --time=1:00:00" in script
    assert '#SBATCH --job-name="ss-eval"' in script
    assert "--slurm" not in script.replace("slurm-%j.log", "")
    assert "streamspeech_tpu.cli.simuleval" in script
    assert f'--output "{out.resolve()}"' in script.replace("\\\n\t", " ")
    # no evaluation ran (submission mode returns before building the engine)
    assert not (out / "instances.log").exists()
