"""Measure serving-startup (engine warmup) time on the real TPU, cold vs warm
persistent compile cache (VERDICT r4 item #5: verify the warmup cost and
record it honestly).

Runs the SAME engine construction + `engine.warmup(pipelined=True)` as the
bench pipeline stage (benchmarks.measure_pipeline_rtf), but times ONLY the
startup path and reports the persistent-cache population it found, so the
number is attributable: `cache_entries == 0` means every program paid the
1-4 min remote compile; `cache_entries > 0` means executables deserialized
from disk and the remaining time is host-side tracing/lowering (GIL-bound,
see runtime/session.py warmup docstring).

Usage:
  python scripts/measure_warmup.py [--no-cache] [--mt-buckets 64]
      [--unit-buckets 256] [--pipelined 1] [--sync 0] [--concurrency N]
      [--verbose]

Run it twice from fresh processes to get the cold (first, populates the
cache) and warm (second) numbers on one machine. `--verbose` prints each
program's warm time as it compiles (STREAMSPEECH_WARMUP_VERBOSE); `--sync 1`
additionally warms the synchronous fused-policy programs a non-pipelined
server would run (absorbed from the retired scripts/probe_warmup.py).
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-cache", action="store_true",
                    help="disable the persistent compile cache for this run")
    ap.add_argument("--mt-buckets", type=int, nargs="+", default=[64])
    ap.add_argument("--unit-buckets", type=int, nargs="+", default=[256])
    ap.add_argument("--pipelined", type=int, default=1)
    ap.add_argument("--sync", type=int, default=None,
                    help="1: also warm the synchronous fused-policy programs "
                    "(default: engine default — sync iff not pipelined)")
    ap.add_argument("--concurrency", type=int, default=None,
                    help="concurrent remote compiles during warmup")
    ap.add_argument("--verbose", action="store_true",
                    help="per-program warm timings as they compile")
    ap.add_argument("--max-enc-frames", type=int, default=512)
    args = ap.parse_args()

    import os

    if args.no_cache:
        os.environ["STREAMSPEECH_NO_COMPILE_CACHE"] = "1"
    if args.verbose:
        os.environ["STREAMSPEECH_WARMUP_VERBOSE"] = "1"

    t_all = time.perf_counter()
    from streamspeech_tpu import benchmarks as bm
    from streamspeech_tpu.runtime.session import StreamSpeechEngine
    from streamspeech_tpu.models.vocoder import CodeGenerator, DEFAULT_VOCODER_CFG
    import jax

    t0 = time.perf_counter()
    model, variables = bm.build_full_model()
    # NB: cache keys are program-signature-exact — the bench pipeline stage
    # uses scheduled doctoring, so ITS warmup entries may not coincide with
    # this script's; to pre-populate the cache for bench.py, run bench.py.
    # This script's own entries are stable across its runs (measured: second
    # run re-compiles ~0 programs), which is what the warm/cold comparison
    # needs.
    variables = bm.doctor_streaming_params(variables)
    build_s = time.perf_counter() - t0

    import jax.numpy as jnp

    voc = CodeGenerator(DEFAULT_VOCODER_CFG)
    vinit = jax.jit(lambda r: voc.init(r, jnp.zeros((1, 8), jnp.int32),
                                       max_frames=32))
    voc_vars = bm.retry_compile(
        lambda: jax.block_until_ready(vinit(jax.random.PRNGKey(1))),
        label="vocoder_init")
    engine = StreamSpeechEngine(
        model, variables, vocoder=voc, vocoder_variables=voc_vars,
        max_enc_frames=args.max_enc_frames,
        mt_buckets=tuple(args.mt_buckets),
        unit_buckets=tuple(args.unit_buckets))
    entries_before = bm._compile_cache_entries()
    t0 = time.perf_counter()
    n_prog = engine.warmup(chunk=8, conv_chunk=8,
                           pipelined=bool(args.pipelined),
                           sync=None if args.sync is None else bool(args.sync),
                           concurrency=args.concurrency)
    warmup_s = time.perf_counter() - t0
    out = {
        "warmup_s": round(warmup_s, 1),
        "warmup_programs": n_prog,
        "cache_entries_before": entries_before,
        "cache_entries_after": bm._compile_cache_entries(),
        "build_model_s": round(build_s, 1),
        "total_process_s": round(time.perf_counter() - t_all, 1),
        "cache_dir": jax.config.jax_compilation_cache_dir,
        "pipelined": bool(args.pipelined),
    }
    engine.close()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
