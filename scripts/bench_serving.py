"""Multi-stream serving throughput: how many concurrent real-time S2ST
conversations one TPU chip sustains.

Drives BatchedStreamingSession (runtime/batched.py) at the full fr-en model
size with B lockstep streams on a 320 ms chunk cadence, running the full
policy work every tick (encode block + CTC + MT decode + fused emission) and
reports per-tick wall time vs the 320 ms real-time budget. The reference
serves ONE stream per agent process on a GPU at RTF ~1.3 (BASELINE.md); here
a single chip multiplexes B streams through shared compiled programs.

Usage: python scripts/bench_serving.py [--batch 8 16 32] [--ticks 20]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from streamspeech_tpu.models.streamspeech import StreamSpeechModel, init_params
from streamspeech_tpu.models.vocoder import DEFAULT_VOCODER_CFG, CodeGenerator
from streamspeech_tpu.runtime.batched import BatchedStreamingSession
from streamspeech_tpu.runtime.session import StreamSpeechEngine
from streamspeech_tpu.train.synthetic import full_config

CHUNK = CONV_CHUNK = 8          # 320 ms chunks, reference multichunk serving
BLOCK_FRAMES = 4 * 8            # fbank frames per lockstep block (= one chunk)
TICK_SECONDS = 0.320


def build_engine():
    cfg = full_config()
    model = StreamSpeechModel(cfg)
    variables = jax.jit(lambda r: init_params(model, r))(jax.random.PRNGKey(0))
    voc_cfg = dict(DEFAULT_VOCODER_CFG)
    voc_cfg["num_embeddings"] = cfg.unit_decoder.vocab_size - 4
    vocoder = CodeGenerator(voc_cfg)
    voc_vars = jax.jit(
        lambda r: vocoder.init(r, jnp.zeros((1, 4), jnp.int32), max_frames=8)
    )(jax.random.PRNGKey(1))
    return StreamSpeechEngine(model, variables, vocoder, voc_vars,
                              max_enc_frames=1024, max_mt_tokens=128)


def run(engine, batch: int, ticks: int) -> dict:
    rng = np.random.RandomState(0)
    session = BatchedStreamingSession(engine, batch)
    feats = rng.randn(batch, ticks * BLOCK_FRAMES, 80).astype(np.float32)

    def tick(t):
        for i in range(batch):
            session.push_features(i, feats[:, t * BLOCK_FRAMES:
                                           (t + 1) * BLOCK_FRAMES][i],
                                  finished=(t == ticks - 1))
        session.encode_ready_blocks(CHUNK, CONV_CHUNK)
        session.mt_decode(np.full((batch,), 2))
        session.emit()

    tick(0)  # compile
    times = []
    for t in range(1, ticks):
        start = time.perf_counter()
        tick(t)
        times.append(time.perf_counter() - start)
    per_tick = float(np.median(times))
    return {
        "batch": batch,
        "tick_ms": per_tick * 1e3,
        "rtf": per_tick / TICK_SECONDS,
        "realtime_streams": batch * TICK_SECONDS / per_tick,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, nargs="+", default=[1, 4, 8, 16])
    ap.add_argument("--ticks", type=int, default=12)
    args = ap.parse_args()
    engine = build_engine()
    for b in args.batch:
        print(json.dumps(run(engine, b, args.ticks)))


if __name__ == "__main__":
    main()
