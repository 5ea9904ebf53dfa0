"""End-to-end streaming S2ST pipeline benchmark on the real chip.

Drives the full simultaneous agent (fbank → incremental encoder → CTC policy →
cached MT decode → fused unit synthesis + vocoder) through the evaluator on
synthetic utterances and reports wall-clock RTF (processing time / audio time).
The reference example run reports RTF 1.326 on GPU (BASELINE.md).

Usage: python scripts/bench_streaming.py [--utterances 4] [--seconds 10]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--utterances", type=int, default=4)
    p.add_argument("--seconds", type=float, default=10.0)
    p.add_argument("--segment-ms", type=int, default=320)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from streamspeech_tpu import benchmarks as bm

    res = bm.measure_pipeline_rtf(
        utterances=args.utterances, seconds=args.seconds,
        segment_ms=args.segment_ms, verbose=True)
    audio = args.utterances * args.seconds
    print(f"wall {res['pipeline_rtf'] * audio:.2f}s for {audio:.1f}s audio → "
          f"pipeline RTF {res['pipeline_rtf']:.3f} "
          f"({res['pipeline_xrealtime']:.1f}x real time); "
          f"{res['n_writes']} WRITEs over {res['n_chunks']} chunks")
    for k, v in res["scores"].items():
        print(f"{k}\t{v:.3f}" if v == v else f"{k}\tnan")


if __name__ == "__main__":
    main()
