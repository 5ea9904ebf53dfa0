"""End-to-end streaming S2ST pipeline benchmark on the real chip.

Drives the full simultaneous agent (fbank → incremental encoder → CTC policy →
cached MT decode → fused unit synthesis + vocoder) through the evaluator on
synthetic utterances and reports wall-clock RTF (processing time / audio time).
The reference example run reports RTF 1.326 on GPU (BASELINE.md).

Usage: python scripts/bench_streaming.py [--utterances 4] [--seconds 10]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--utterances", type=int, default=4)
    p.add_argument("--seconds", type=float, default=10.0)
    p.add_argument("--segment-ms", type=int, default=320)
    args = p.parse_args()

    from streamspeech_tpu.agents.streamspeech import (
        StreamSpeechAgentConfig,
        StreamSpeechS2STAgent,
    )
    from streamspeech_tpu.dictionary import Dictionary
    from streamspeech_tpu.eval.evaluator import SentenceLevelEvaluator
    from streamspeech_tpu.models.streamspeech import StreamSpeechModel
    from streamspeech_tpu.models.vocoder import CodeGenerator, DEFAULT_VOCODER_CFG
    from streamspeech_tpu.runtime.session import StreamSpeechEngine
    from streamspeech_tpu.train.synthetic import full_config

    cfg = full_config()
    model = StreamSpeechModel(cfg)
    src = jnp.zeros((1, 64, 80))
    init = jax.jit(lambda r: model.init(
        {"params": r}, src, jnp.full((1,), 64, jnp.int32),
        jnp.full((1, 4), 4, jnp.int32), n2=1, use_running_stats=False))
    variables = jax.block_until_ready(init(jax.random.PRNGKey(0)))
    # doctor the random weights so the policy actually WRITEs (suppress CTC
    # blanks, zero special embeddings) — otherwise the bench measures only the
    # all-READ path and the latency metrics are vacuous
    p = variables["params"]
    for head in ("source_unigram_head", "ctc_target_unigram_head"):
        b = p[head]["proj"]["bias"]
        p[head]["proj"]["bias"] = b.at[0].add(-8.0)
    p["mt_decoder"]["embed_tokens"] = \
        p["mt_decoder"]["embed_tokens"].at[:4].set(0.0)
    p["unit_decoder"]["embed_tokens"] = \
        p["unit_decoder"]["embed_tokens"].at[:4].set(0.0).at[-1].set(0.0)
    voc = CodeGenerator(DEFAULT_VOCODER_CFG)
    vinit = jax.jit(lambda r: voc.init(r, jnp.zeros((1, 8), jnp.int32),
                                       max_frames=32))
    voc_vars = jax.block_until_ready(vinit(jax.random.PRNGKey(1)))

    engine = StreamSpeechEngine(model, variables, voc, voc_vars,
                                max_enc_frames=512)
    src_dict = Dictionary()
    for i in range(5996):
        src_dict.add_symbol(f"▁w{i}")
    unit_dict = Dictionary.units(1000)
    unit_dict.add_blank()
    agent = StreamSpeechS2STAgent(
        engine, StreamSpeechAgentConfig(source_segment_size=args.segment_ms),
        src_dict, src_dict, unit_dict)

    rng = np.random.RandomState(0)
    n_samples = int(args.seconds * 16000)
    sources = [list(rng.uniform(-0.3, 0.3, n_samples))
               for _ in range(args.utterances)]
    refs = ["ref"] * args.utterances

    # compile every streaming program variant up front (serving-startup cost)
    t0 = time.perf_counter()
    n_prog = engine.warmup(chunk=agent.cfg.chunk_size,
                           conv_chunk=agent.cfg.conv_chunk_size,
                           whole_word=agent.cfg.whole_word)
    print(f"engine.warmup: {n_prog} programs in "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    ev0 = SentenceLevelEvaluator(agent, source_segment_size=args.segment_ms,
                                 quality_metrics=[])
    t0 = time.perf_counter()
    ev0(sources[:1], refs[:1])
    print(f"warmup utterance: {time.perf_counter() - t0:.1f}s", flush=True)

    ev = SentenceLevelEvaluator(agent, source_segment_size=args.segment_ms,
                                quality_metrics=[])
    t0 = time.perf_counter()
    scores = ev(sources, refs)
    wall = time.perf_counter() - t0
    audio = args.utterances * args.seconds
    n_writes = sum(len(ins.delays) for ins in ev.instances.values())
    print(f"wall {wall:.2f}s for {audio:.1f}s audio → pipeline RTF "
          f"{wall / audio:.3f} ({audio / wall:.1f}x real time); "
          f"{n_writes} WRITEs over "
          f"{int(audio * 1000 / args.segment_ms)} chunks")
    for k in ("AL", "AL_CA", "RTF", "RTF_CA", "NumChunks", "StartOffset"):
        if k in scores:
            v = scores[k]
            print(f"{k}\t{v:.3f}" if v == v else f"{k}\tnan")


if __name__ == "__main__":
    main()
