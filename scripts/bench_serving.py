"""Multi-stream serving throughput: how many concurrent real-time S2ST
conversations one TPU chip sustains.

Drives the wave-batched evaluator (eval/batched_evaluator.py — per-instance
numerics identical to sequential sessions, tests/test_batched_eval.py) with B
lockstep streams at the full fr-en model size on a 320 ms chunk cadence:
every tick runs the real policy (batched encode + CTC growth gates + scanned
MT decode for writers + fused batched tail emission). The reference serves
ONE stream per agent process on a GPU at RTF ~1.3 (BASELINE.md); here a
single chip multiplexes B streams through shared compiled programs.

Usage: python scripts/bench_serving.py [--batch 4 8 16] [--seconds 8]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, nargs="+", default=[4, 8, 16])
    ap.add_argument("--seconds", type=float, default=8.0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard the stream batch over N local devices "
                         "(serving data parallelism, runtime/batched.py "
                         "_shard_over_mesh); batch must divide by N")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 compute dtype (fp32 params); ~2x MXU "
                         "throughput, near-tie argmax may flip")
    ap.add_argument("--drift", action="store_true",
                    help="measure the bf16-vs-fp32 quality drift (unit edit "
                         "distance, policy divergence, metric deltas) on "
                         "identical streams instead of throughput")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from streamspeech_tpu import benchmarks as bm

    dtype = None
    if args.bf16:
        import jax.numpy as jnp
        dtype = jnp.bfloat16
    if args.drift:
        r = bm.measure_bf16_drift(batch=args.batch[0], seconds=args.seconds,
                                  verbose=True)
        print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                          for k, v in r.items()}), flush=True)
        return

    model, variables = bm.build_full_model(dtype=dtype)
    for b in args.batch:
        r = bm.measure_batched_throughput(model, variables, batch=b,
                                          seconds=args.seconds,
                                          mesh_devices=args.mesh,
                                          verbose=True)
        r["per_stream_realtime"] = round(
            r["serving_xrealtime"] / b, 3)
        print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                          for k, v in r.items()}), flush=True)


if __name__ == "__main__":
    main()
