"""Per-call tunnel/compute breakdown of one streaming policy step (real TPU).

Times each jitted program in the policy hot path separately (dispatch + fetch
through the remote tunnel), plus a no-op sync to isolate pure tunnel latency.
VERDICT r1 Next #3: "No measurement isolates tunnel vs compute."

Usage: python scripts/profile_policy.py [--iters 20]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, iters, fetch=lambda out: jax.block_until_ready(out)):
    fetch(fn())  # warm
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fetch(fn())
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] * 1e3  # median ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    from streamspeech_tpu.models.streamspeech import StreamSpeechModel
    from streamspeech_tpu.models.vocoder import CodeGenerator, DEFAULT_VOCODER_CFG
    from streamspeech_tpu.runtime.session import StreamSpeechEngine
    from streamspeech_tpu.train.synthetic import full_config

    print("devices:", jax.devices(), flush=True)

    cfg = full_config()
    model = StreamSpeechModel(cfg)
    src = jnp.zeros((1, 64, 80))
    init = jax.jit(lambda r: model.init(
        {"params": r}, src, jnp.full((1,), 64, jnp.int32),
        jnp.full((1, 4), 4, jnp.int32), n2=1, use_running_stats=False))
    variables = jax.block_until_ready(init(jax.random.PRNGKey(0)))
    voc = CodeGenerator(DEFAULT_VOCODER_CFG)
    vinit = jax.jit(lambda r: voc.init(r, jnp.zeros((1, 8), jnp.int32),
                                       max_frames=32))
    voc_vars = jax.block_until_ready(vinit(jax.random.PRNGKey(1)))

    e = StreamSpeechEngine(model, variables, voc, voc_vars,
                           max_enc_frames=512)
    sess = e.new_session()

    # --- pure tunnel sync: tiny jit + fetch scalar
    noop = jax.jit(lambda x: x + 1)
    x0 = jnp.zeros(())
    t_noop = timeit(lambda: noop(x0), args.iters,
                    fetch=lambda out: np.asarray(out))
    print(f"noop jit call + scalar fetch : {t_noop:8.2f} ms", flush=True)

    # --- encode_block (chunk 8 → block 32 fbank frames) + ids fetch
    block = jnp.asarray(np.random.RandomState(0).randn(1, 32, 80), jnp.float32)
    vl = jnp.asarray(32, jnp.int32)

    def enc_call():
        enc, sess.enc_state, sess.enc_buf, asr, st = e._encode_block(
            e.variables, block, sess.enc_state, sess.enc_buf, vl,
            chunk=8, conv_chunk=8)
        return asr, st

    t_enc = timeit(enc_call, args.iters,
                   fetch=lambda out: (np.asarray(out[0]), np.asarray(out[1])))
    print(f"encode_block + ids fetch     : {t_enc:8.2f} ms", flush=True)

    # --- mt_fill_cross (dispatch only, then force)
    enc_new = jnp.zeros((1, 8, cfg.encoder.embed_dim))

    def fill_call():
        sess.mt_cross = e._mt_fill_cross(e.variables, enc_new, sess.mt_cross)
        return sess.mt_cross[0].k

    t_fill = timeit(fill_call, args.iters)
    print(f"mt_fill_cross + force        : {t_fill:8.2f} ms", flush=True)

    # --- mt_decode_greedy (scan of 16 steps) + fetch
    def mt_call():
        toks, emitted, hit_eos, _ = e._mt_decode_greedy(
            e.variables, jnp.asarray([2], jnp.int32),
            jnp.asarray(0, jnp.int32), jnp.asarray(4, jnp.int32),
            sess.mt_self, sess.mt_cross, max_steps=16)
        return toks, emitted, hit_eos

    t_mt = timeit(mt_call, args.iters,
                  fetch=lambda o: (np.asarray(o[0]), np.asarray(o[1]),
                                   np.asarray(o[2])))
    print(f"mt_decode_greedy(16) + fetch : {t_mt:8.2f} ms", flush=True)

    # --- fused emit (mt bucket 16, unit bucket 512) + fetch
    padded = np.full((1, 16), 1, np.int32)
    padded[0, :5] = [2, 10, 11, 12, 13]

    def emit_call():
        return e._emit(e.variables, e.vocoder_variables, jnp.asarray(padded),
                       sess.enc_buf, jnp.asarray(64),
                       jnp.asarray(5, jnp.int32),
                       valid_tokens_cap=16, max_frames=512 * 4)

    t_emit = timeit(emit_call, args.iters,
                    fetch=lambda o: tuple(np.asarray(v) for v in o))
    print(f"fused emit + fetch           : {t_emit:8.2f} ms", flush=True)

    per_write = t_enc + t_fill + t_mt + t_emit
    per_read = t_enc + t_fill
    print(f"\nhost-path WRITE chunk ≈ {per_write:.1f} ms | READ chunk ≈ "
          f"{per_read:.1f} ms | tunnel floor ≈ {t_noop:.1f} ms/sync")

    # --- the ACTUAL serving path: one fused policy_step per chunk
    # (runtime/session.py policy_step — encode + gates + cond decode + cond
    # emit + ONE batched fetch). This is what the agent pays per chunk.
    sess2 = e.new_session()
    table = jnp.zeros((cfg.mt_decoder.vocab_size,), bool)
    block_np = np.random.RandomState(1).randn(32, 80).astype(np.float32)

    def fused_call():
        out = sess2.fused_policy(block_np, 8, 8, k1=0, n=1,
                                 whole_word=False, max_len=60,
                                 starts_word=table, src_len=10 ** 6,
                                 tgt_len=10 ** 6, n_prev_units=0)
        if out is None:  # ran out of encoder capacity: fresh session
            sess2.__init__(e)
            out = sess2.fused_policy(block_np, 8, 8, k1=0, n=1,
                                     whole_word=False, max_len=60,
                                     starts_word=table, src_len=10 ** 6,
                                     tgt_len=10 ** 6, n_prev_units=0)
        return out

    t_fused = timeit(fused_call, args.iters, fetch=lambda out: out)
    print(f"fused policy_step (READ)     : {t_fused:8.2f} ms  "
          f"(~{t_fused - t_noop:.1f} ms over the tunnel floor)")
    print(f"320 ms chunks → fused single-stream RTF ≈ {320 / t_fused:.1f}x; "
          f"host-path all-WRITE would be {320 / per_write:.1f}x")


if __name__ == "__main__" and "--fused" not in sys.argv:
    main()


def profile_fused(iters=20):
    """Time the fused policy_step (READ and WRITE shapes) + emit_tail."""
    import numpy as np

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
    p = variables["params"]
    for head in ("source_unigram_head", "ctc_target_unigram_head"):
        p[head]["proj"]["bias"] = p[head]["proj"]["bias"].at[0].add(-8.0)
    p["mt_decoder"]["embed_tokens"] = \
        p["mt_decoder"]["embed_tokens"].at[:4].set(0.0)
    p["unit_decoder"]["embed_tokens"] = \
        p["unit_decoder"]["embed_tokens"].at[:4].set(0.0).at[-1].set(0.0)
    voc = CodeGenerator(DEFAULT_VOCODER_CFG)
    vinit = jax.jit(lambda r: voc.init(r, jnp.zeros((1, 8), jnp.int32),
                                       max_frames=32))
    voc_vars = jax.block_until_ready(vinit(jax.random.PRNGKey(1)))
    e = StreamSpeechEngine(model, variables, voc, voc_vars, max_enc_frames=512)
    table = jnp.zeros((cfg.mt_decoder.vocab_size,), bool)
    rng = np.random.RandomState(0)

    def one_chunk(sess, src_len, tgt_len):
        feats = rng.randn(32, 80).astype(np.float32)
        return sess.fused_policy(feats, 8, 8, 0, 1, False, 200, table,
                                 src_len, tgt_len, len_units(sess))

    def len_units(sess):
        return 0

    # READ-shaped call: huge prefix counters force gates to fail
    sess = e.new_session()
    out = one_chunk(sess, 10 ** 6, 10 ** 6)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = one_chunk(sess, 10 ** 6, 10 ** 6)
        ts.append(time.perf_counter() - t0)
        if sess.enc_len + 8 > 500:
            sess = e.new_session()
            one_chunk(sess, 10 ** 6, 10 ** 6)
    ts.sort()
    print(f"policy_step READ              : {ts[len(ts)//2]*1e3:8.2f} ms",
          flush=True)

    # WRITE-shaped call: zero counters let gates pass (doctored CTC grows)
    sess = e.new_session()
    out = one_chunk(sess, 0, 0)
    ts = []
    for _ in range(iters):
        sess2 = e.new_session()
        sess2.mt_tokens = [5, 6, 7]
        sess2.mt_steps = 3
        t0 = time.perf_counter()
        out = one_chunk(sess2, 0, 0)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"policy_step WRITE (bucket 16) : {ts[len(ts)//2]*1e3:8.2f} ms "
          f"(do_decode={out['do_decode']}, do_emit={out['do_emit']})",
          flush=True)

    # emit_tail standalone (bucket 16)
    sess = e.new_session()
    sess.mt_tokens = [5, 6, 7, 8]
    sess.mt_steps = 4
    sess.enc_len = 64
    sess.emit_tail(0)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sess.emit_tail(0)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"emit_tail (bucket 16)         : {ts[len(ts)//2]*1e3:8.2f} ms",
          flush=True)


if __name__ == "__main__" and "--fused" in sys.argv:
    profile_fused()
