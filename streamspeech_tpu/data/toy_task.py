"""Deterministic toy S2ST task for end-to-end learnability goldens.

The reference's de-facto golden test is the example run on real fr-en data
(`/root/reference/README.md:140-210`: train → simuleval → ASR-BLEU 15.448).
Released data/checkpoints are not available in this environment, so this module
constructs a task with the same *shape* — speech-like features in, unit
sequences + text out — deterministic enough that a few hundred CPU train steps
of the real model (real criterion incl. streaming masks, real
`cli.train`/`cli.generate` path) must learn it:

- K "words": word w is a band of energy at mel bins [6w+4, 6w+10) whose
  amplitude is modulated by a word-specific temporal envelope, plus noise;
- a word maps to one text token ("w3") and a fixed 6-unit subsequence;
- an utterance is 2-4 words; text targets are the word tokens (shared by the
  MT decoder, ASR head, and ST head), unit targets the concatenated
  subsequences.

`generate_toy_dataset` writes the REAL on-disk task layout (manifest tsvs,
multitask target tsvs, dict files, config yamls — the same files
`fairseq/fairseq/tasks/speech_to_speech.py:212-290` parses), so the golden
exercises the same loaders/CLIs a user runs on real data.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np

N_FEAT = 80


def word_pattern(w: int, frames: int, rng: np.random.RandomState) -> np.ndarray:
    """[frames, 80] fbank-like pattern for word w (+ fresh noise)."""
    t = np.arange(frames, dtype=np.float32)
    env = 1.5 + np.sin(2 * np.pi * (w + 1) * t / frames).astype(np.float32)
    x = rng.randn(frames, N_FEAT).astype(np.float32) * 0.3
    lo = 6 * w + 4
    x[:, lo: lo + 6] += env[:, None] * 2.0
    return x


def word_units(w: int, n_units: int, units_per_word: int = 6) -> List[int]:
    """Fixed raw unit codes (0..n_units-1) for word w."""
    return [(5 * w + 3 * j + 1) % n_units for j in range(units_per_word)]


def make_utterance(words: List[int], frames_per_word: int, n_units: int,
                   rng: np.random.RandomState
                   ) -> Tuple[np.ndarray, List[int], List[str]]:
    feats = np.concatenate(
        [word_pattern(w, frames_per_word, rng) for w in words], axis=0)
    units: List[int] = []
    for w in words:
        units.extend(word_units(w, n_units))
    text = [f"w{w}" for w in words]
    return feats, units, text


def generate_toy_dataset(out_dir: str, n_train: int = 300, n_dev: int = 24,
                         n_words: int = 6, frames_per_word: int = 32,
                         n_units: int = 40, seed: int = 0) -> Dict[str, str]:
    """Write the task to `out_dir`; returns paths of the key files."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    (out / "feats").mkdir(exist_ok=True)
    rng = np.random.RandomState(seed)

    # text dictionary shared by all three text tasks
    from streamspeech_tpu.dictionary import Dictionary

    tdict = Dictionary()
    for w in range(n_words):
        tdict.add_symbol(f"w{w}")
    for task in ("target_unigram", "source_unigram", "ctc_target_unigram"):
        (out / task).mkdir(exist_ok=True)
        tdict.save(str(out / task / "dict.txt"))

    splits = {"train": n_train, "dev": n_dev}
    refs: Dict[str, List[Tuple[str, List[int], List[str]]]] = {}
    for split, n in splits.items():
        rows = ["id\tsrc_audio\tsrc_n_frames\ttgt_audio\ttgt_n_frames"]
        task_rows = {t: ["id\ttgt_text"] for t in
                     ("target_unigram", "source_unigram",
                      "ctc_target_unigram")}
        refs[split] = []
        for i in range(n):
            n_w = rng.randint(2, 5)
            words = [int(rng.randint(0, n_words)) for _ in range(n_w)]
            feats, units, text = make_utterance(words, frames_per_word,
                                                n_units, rng)
            utt = f"{split}_{i}"
            np.save(out / "feats" / f"{utt}.npy", feats)
            rows.append(f"{utt}\tfeats/{utt}.npy\t{feats.shape[0]}\t"
                        f"{' '.join(map(str, units))}\t{len(units)}")
            for t in task_rows:
                task_rows[t].append(f"{utt}\t{' '.join(text)}")
            refs[split].append((utt, units, text))
        (out / f"{split}.tsv").write_text("\n".join(rows) + "\n")
        for t, tr in task_rows.items():
            (out / t / f"{split}.tsv").write_text("\n".join(tr) + "\n")

    (out / "config_toy.yaml").write_text(
        "input_feat_per_channel: 80\ninput_channels: 1\n")
    (out / "config_mtl_toy.yaml").write_text("\n".join(
        f"""{name}:
  decoder_type: {"transformer" if name == "target_unigram" else "ctc"}
  dict: {out / name / "dict.txt"}
  data: {out / name}
  loss_weight: {8.0 if name == "target_unigram" else 4.0}"""
        for name in ("target_unigram", "source_unigram",
                     "ctc_target_unigram")) + "\n")
    return {"data": str(out), "config_yaml": "config_toy.yaml",
            "multitask_config_yaml": "config_mtl_toy.yaml",
            "n_units": n_units, "text_dict": str(out / "target_unigram" /
                                                 "dict.txt")}


def run_learnability_golden(workdir: str, max_update: int = 300,
                            n_train: int = 300, n_dev: int = 24,
                            lr: float = 2e-3, seed: int = 0,
                            upsample: int = 8,
                            verbose: bool = False) -> Dict[str, Dict]:
    """End-to-end flagship learnability golden (VERDICT r3 item #5).

    Generates the toy task, trains the REAL StreamSpeech model (scaled-down
    dims, real criterion incl. streaming masks) through `cli.train`, decodes
    the dev set through `cli.generate`, and scores hypotheses against the
    toy references — for both the untrained (step-0) and trained checkpoints.
    Runs each stage as a plain-CPU subprocess (fresh backend, no mesh/global
    state bleed). Returns {"untrained": scores, "trained": scores}.
    """
    import subprocess
    import sys

    wd = Path(workdir)
    task = generate_toy_dataset(str(wd / "data"), n_train=n_train,
                                n_dev=n_dev, seed=seed)
    repo = Path(__file__).resolve().parents[2]

    def run(mod, *argv):
        import os

        cmd = [sys.executable, "-m", mod, "--cpu", *map(str, argv)]
        env = dict(os.environ)
        # don't inherit the test suite's virtual 8-device CPU mesh (the
        # subprocess would build a data=8 mesh and demand batch divisibility)
        env.pop("XLA_FLAGS", None)
        r = subprocess.run(cmd, cwd=str(repo), capture_output=True, text=True,
                           timeout=3600, env=env)
        if verbose:
            sys.stderr.write(r.stderr[-2000:])
        if r.returncode != 0:
            raise RuntimeError(
                f"{mod} failed rc={r.returncode}\n{r.stderr[-4000:]}")
        return r.stdout

    common = ["--data", task["data"], "--config-yaml", task["config_yaml"],
              "--multitask-config-yaml", task["multitask_config_yaml"],
              "--target-code-size", task["n_units"], "--tiny-dims",
              "--ctc-upsample-rate", upsample, "--max-tokens", 1536,
              "--lr", lr, "--warmup-updates", 30, "--seed", seed + 1,
              "--log-interval", 10, "--validate-interval-updates", 10 ** 9,
              "--save-interval-updates", 10 ** 9]
    run("streamspeech_tpu.cli.train", *common, "--max-update", 0,
        "--save-dir", wd / "ck0")
    run("streamspeech_tpu.cli.train", *common, "--max-update", max_update,
        "--save-dir", wd / "ckN")

    from streamspeech_tpu.dictionary import Dictionary

    tdict = Dictionary.load(task["text_dict"])
    refs = read_dev_refs(task["data"])

    def decode(ckpt_dir):
        ckpts = sorted(Path(ckpt_dir).glob("checkpoint_*"),
                       key=lambda p: int(p.name.split("_")[-1]))
        out = run("streamspeech_tpu.cli.generate", "--checkpoint", ckpts[-1],
                  "--manifest", Path(task["data"]) / "dev.tsv",
                  "--max-len", 16)
        hyp_u: Dict[str, List[int]] = {}
        hyp_t: Dict[str, List[str]] = {}
        for line in out.splitlines():
            if line.startswith("U-"):
                utt, rest = line[2:].split("\t", 1)
                hyp_u[utt] = [int(x) for x in rest.split()] if rest.strip() \
                    else []
            elif line.startswith("D-"):
                utt, rest = line[2:].split("\t", 1)
                ids = [int(x) for x in rest.split()] if rest.strip() else []
                hyp_t[utt] = [tdict[i] for i in ids if i >= tdict.nspecial]
        units = [hyp_u.get(utt, []) for utt, _, _ in refs]
        text = [hyp_t.get(utt, []) for utt, _, _ in refs]
        return score_outputs(units, text, refs)

    return {"untrained": decode(wd / "ck0"), "trained": decode(wd / "ckN")}


def read_dev_refs(data_dir: str) -> List[Tuple[str, List[int], List[str]]]:
    """(utt_id, raw unit codes, text tokens) for the dev split, from disk."""
    data = Path(data_dir)
    text = {}
    with open(data / "target_unigram" / "dev.tsv") as f:
        f.readline()
        for line in f:
            utt, t = line.rstrip("\n").split("\t")
            text[utt] = t.split()
    refs = []
    with open(data / "dev.tsv") as f:
        header = f.readline().rstrip("\n").split("\t")
        col = {n: i for i, n in enumerate(header)}
        for line in f:
            row = line.rstrip("\n").split("\t")
            utt = row[col["id"]]
            refs.append((utt, [int(u) for u in row[col["tgt_audio"]].split()],
                         text[utt]))
    return refs


def score_outputs(hyp_units: List[List[int]], hyp_text: List[List[str]],
                  refs: List[Tuple[str, List[int], List[str]]]
                  ) -> Dict[str, float]:
    """Unit edit-distance rate + text token accuracy vs the toy references."""

    def edit(a, b):
        m, n = len(a), len(b)
        dp = list(range(n + 1))
        for i in range(1, m + 1):
            prev, dp[0] = dp[0], i
            for j in range(1, n + 1):
                cur = dp[j]
                dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                            prev + (a[i - 1] != b[j - 1]))
                prev = cur
        return dp[n]

    tot_ed = tot_units = 0
    tot_tok = ok_tok = 0
    for (hu, ht, (_, ru, rt)) in zip(hyp_units, hyp_text, refs):
        tot_ed += edit(hu, ru)
        tot_units += len(ru)
        tot_tok += len(rt)
        ok_tok += sum(1 for a, b in zip(ht, rt) if a == b)
    return {"unit_edit_rate": tot_ed / max(tot_units, 1),
            "text_token_acc": ok_tok / max(tot_tok, 1)}
