"""Benchmark: full StreamSpeech two-pass forward on the real chip.

Metric: real-time factor (seconds of audio processed per wall-clock second) of the
jitted full-model forward (chunk-8 streaming masks, teacher-forced MT length 24,
×25 NAR unit upsample) on a 10.24 s utterance, batch 1 — the configuration the
reference's simultaneous agent runs per chunk. Reference baseline: the example-run
RTF of 1.326 on GPU (`/root/reference/README.md:207-208`, BASELINE.md), i.e. the
reference processes audio 1/1.326 = 0.75x real time; vs_baseline is
ours_rtf / (1 / 1.326).
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    from streamspeech_tpu.models.streamspeech import StreamSpeechModel
    from streamspeech_tpu.train.synthetic import full_config

    cfg = full_config()
    model = StreamSpeechModel(cfg)

    b, frames, mt_len = 1, 1024, 24  # 1024 fbank frames = 10.24 s audio
    audio_seconds = frames * 0.01
    rng = jax.random.PRNGKey(0)
    src = jax.random.normal(rng, (b, frames, 80), jnp.float32)
    lens = jnp.full((b,), frames, jnp.int32)
    mt = jnp.full((b, mt_len), 4, jnp.int32)
    # init under jit: unjitted init dispatches hundreds of tiny ops, which is
    # minutes over this environment's remote-TPU tunnel
    init = jax.jit(lambda r: model.init({"params": r}, src, lens, mt, n2=1,
                                        use_running_stats=False))
    variables = init(rng)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}

    @jax.jit
    def fwd(v, src, lens, mt):
        out = model.apply(v, src, lens, mt, chunk_size=8, conv_chunk_size=8, n2=1)
        return out["unit_logits"], out["asr_logits"]

    # warmup/compile
    jax.block_until_ready(fwd(variables, src, lens, mt))
    n_iter = 20
    times = []
    for _ in range(3):  # median of 3 trials for stability
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = fwd(variables, src, lens, mt)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / n_iter)
    dt = sorted(times)[1]

    rtf = audio_seconds / dt  # x real time
    baseline_rtf = 1.0 / 1.326  # reference example-run: RTF 1.326 (time/audio)
    print(json.dumps({
        "metric": "s2st_forward_xrealtime",
        "value": round(rtf, 3),
        "unit": "x_realtime_10.24s_utt",
        "vs_baseline": round(rtf / baseline_rtf, 3),
    }))


if __name__ == "__main__":
    main()
