"""Iterate on the learnability golden: run the full wav-based streaming
golden (train via cli.train, eval via cli.simuleval s2tt + streaming S2ST
units), or re-evaluate an existing workdir's checkpoints.

Usage: python scripts/debug_golden.py [--max-update 300] [--eval-only]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-update", type=int, default=300)
    ap.add_argument("--n-train", type=int, default=300)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--dropout", type=float, default=0.0)
    ap.add_argument("--upsample", type=int, default=8)
    ap.add_argument("--workdir", default="/tmp/debug_golden2")
    ap.add_argument("--eval-only", action="store_true",
                    help="reuse workdir's data + ckN; rerun the eval legs")
    args = ap.parse_args()

    import os

    os.environ.pop("XLA_FLAGS", None)
    import jax

    jax.config.update("jax_platforms", "cpu")

    from streamspeech_tpu.data import toy_task

    t0 = time.time()
    if not args.eval_only:
        res = toy_task.run_learnability_golden(
            args.workdir, max_update=args.max_update, n_train=args.n_train,
            lr=args.lr, upsample=args.upsample, dropout=args.dropout,
            verbose=True)
        print(json.dumps(res))
    else:
        import subprocess

        wd = Path(args.workdir)
        data = str(wd / "data")
        refs = toy_task.read_dev_refs(data)
        ckpt = str(sorted((wd / "ckN").glob("checkpoint_*"),
                          key=lambda p: int(p.name.split("_")[-1]))[-1])
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        out_dir = wd / "eval_dbg"
        r = subprocess.run(
            [sys.executable, "-m", "streamspeech_tpu.cli.simuleval", "--cpu",
             "--agent", "s2tt", "--source", str(wd / "data/dev_wavs.txt"),
             "--target", str(wd / "data/dev_text.txt"),
             "--checkpoint", ckpt,
             "--src-dict", f"{data}/target_unigram/dict.txt",
             "--tgt-dict", f"{data}/target_unigram/dict.txt",
             "--target-code-size", "40", "--batch", "6",
             "--output", str(out_dir)],
            capture_output=True, text=True, env=env, timeout=3600)
        sys.stderr.write(r.stderr[-3000:])
        print(r.stdout)
        hyp_text = [[] for _ in refs]
        with open(out_dir / "instances.log") as f:
            for line in f:
                d = json.loads(line)
                hyp_text[int(d["index"])] = str(
                    d.get("prediction", "")).split()
        r2 = subprocess.run(
            [sys.executable, "-m", "streamspeech_tpu.data.toy_task", "--cpu",
             "eval-units", "--checkpoint", ckpt, "--data", data],
            capture_output=True, text=True, env=env, timeout=3600)
        sys.stderr.write(r2.stderr[-3000:])
        hyp_units = json.loads(r2.stdout.splitlines()[-1])
        print(json.dumps(toy_task.score_outputs(hyp_units, hyp_text, refs)))
        for i in (0, 1, 2):
            print("  ref_t", refs[i][2], "hyp_t", hyp_text[i])
            print("  ref_u", refs[i][1], "hyp_u", hyp_units[i])
    print(f"wall {time.time() - t0:.0f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
