"""Measure cold-process engine warmup on TPU (VERDICT r5 item: warmup_s < 10).

Replicates bench.py's pipeline-stage engine exactly (full dims, mt_buckets=(64,),
unit_buckets=(256,), pipelined) and times engine.warmup() with per-program
timings. Run twice: first run populates the persistent compile cache, second
shows the steady-state cold-process warmup a server restart would pay.

    python scripts/probe_warmup.py [--concurrency N]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--concurrency", type=int, default=None)
    ap.add_argument("--pipelined", action="store_true", default=True)
    ap.add_argument("--sync", action="store_true", default=False,
                    help="also warm the synchronous fused-policy programs "
                    "(default: only what a pipelined server runs)")
    args = ap.parse_args()

    import os

    os.environ["STREAMSPEECH_WARMUP_VERBOSE"] = "1"

    import jax
    import jax.numpy as jnp

    from streamspeech_tpu import benchmarks as bm
    from streamspeech_tpu.models.vocoder import (
        CodeGenerator,
        DEFAULT_VOCODER_CFG,
    )
    from streamspeech_tpu.runtime.session import StreamSpeechEngine

    t00 = time.perf_counter()
    model, variables = bm.build_full_model()
    print(f"build_full_model: {time.perf_counter() - t00:.1f}s", flush=True)

    t0 = time.perf_counter()
    voc = CodeGenerator(DEFAULT_VOCODER_CFG)
    vinit = jax.jit(lambda r: voc.init(r, jnp.zeros((1, 8), jnp.int32),
                                       max_frames=32))
    voc_vars = jax.block_until_ready(vinit(jax.random.PRNGKey(1)))
    print(f"vocoder_init: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    engine = StreamSpeechEngine(model, variables, voc, voc_vars,
                                max_enc_frames=512, mt_buckets=(64,),
                                unit_buckets=(256,))
    print(f"engine_ctor: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    n = engine.warmup(chunk=8, conv_chunk=8, pipelined=args.pipelined,
                      sync=args.sync or None,
                      concurrency=args.concurrency)
    dt = time.perf_counter() - t0
    print(f"WARMUP: {n} programs in {dt:.1f}s "
          f"(process total {time.perf_counter() - t00:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
