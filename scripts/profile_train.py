"""Train-step roofline + ablation profile (VERDICT r3 item #2).

Decomposes the K-step-block train time (the chip-truth number from
`benchmarks.measure_train_step`) into per-component contributions and tests
whether the measured MFU is compute-starved (small batch) or memory-bound:

- batch sweep: per-step ms + MFU + memory-roofline fraction at B in --batches
- ablations at the base batch, each its own freshly-built program so zero
  weights statically drop the term (criterion gates on `weights.* != 0`):
    full          fwd + bwd + Adam, all four losses (the bench number)
    fwd-only      loss forward alone (no grad, no optimizer)
    fwd+bwd       value_and_grad, optimizer replaced by a trivial apply
    ce-only       unit/asr/st CTC off -> CTC total cost by delta
    no-aux-ctc    asr/st CTC off     -> aux-CTC pair cost by delta
    unit-surrogate unit decoder live, CTC DP replaced by mean|logit|
                   -> splits the ce-only delta into decoder-stack vs DP-kernel
    no-pallas     STREAMSPEECH_DISABLE_PALLAS=1 (+ no PALLAS_TRAIN)

Roofline method: XLA's own cost analysis for the compiled block gives matmul
FLOPs and HBM bytes accessed; compute time bound = flops/peak_bf16, memory
bound = bytes/peak_hbm_bw. A step whose measured time ~= bytes/bw is
memory-bound: more MFU requires fewer bytes (bigger batch amortizes weight
traffic), not faster matmuls.

Writes one JSON line per row; paste the table into docs/training.md.

Usage:
  python scripts/profile_train.py [--batches 8 16 32 64] [--k 10]
      [--frames 1024] [--skip-ablations] [--out /tmp/profile_train.jsonl]
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# v5e: 197 TFLOP/s bf16, ~819 GB/s HBM (public chip specs)
PEAK_HBM_BW = {"v5 lite": 8.19e11, "v5lite": 8.19e11, "v4": 1.2e12,
               "v5p": 2.765e12, "v6": 1.64e12}


def hbm_bw() -> float:
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for key, bw in PEAK_HBM_BW.items():
        if key in kind:
            return bw
    return 8.19e11


def build(batch, frames, mt_len, units_len, text_len, k, weights=None,
          mode="full", pallas=True, bf16=True):
    """Fresh model + K-step block program for one profile row."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from streamspeech_tpu import benchmarks as bm
    from streamspeech_tpu.config import OptimizationConfig
    from streamspeech_tpu.parallel.mesh import make_mesh
    from streamspeech_tpu.train.criterion import (
        CriterionWeights,
        streamspeech_loss,
    )
    from streamspeech_tpu.train.synthetic import full_config, synthetic_batch
    from streamspeech_tpu.train.trainer import (
        TrainState,
        create_sharded_state,
        make_optimizer,
        make_train_step,
        make_train_step_scan,
    )

    if pallas:
        os.environ["STREAMSPEECH_PALLAS_TRAIN"] = "1"
        os.environ.pop("STREAMSPEECH_DISABLE_PALLAS", None)
    else:
        os.environ.pop("STREAMSPEECH_PALLAS_TRAIN", None)
        os.environ["STREAMSPEECH_DISABLE_PALLAS"] = "1"

    cfg = full_config()
    model, variables = bm.build_full_model(dtype=jnp.bfloat16 if bf16 else None)
    w = weights or CriterionWeights()
    tx = make_optimizer(OptimizationConfig(
        update_freq=1, warmup_updates=10000, lr=1e-3, clip_norm=10.0))
    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    state = create_sharded_state(variables, tx, mesh)
    b = synthetic_batch(cfg, batch=batch, frames=frames, mt_len=mt_len,
                        units_len=units_len, text_len=text_len)
    unit_blank = cfg.unit_decoder.vocab_size - 1

    if mode == "fwd-only":
        # loss forward alone, scanned K times with per-step rng folds (the
        # fold keeps XLA from CSE-ing identical iterations away)
        from functools import partial

        def loss_only(params, batch_stats, batch, key):
            var = {"params": params, "batch_stats": batch_stats}
            out, _ = model.apply(
                var, batch["src_tokens"], batch["src_lengths"],
                batch["prev_output_tokens_mt"], chunk_size=8,
                conv_chunk_size=8, k1=0, n1=1, k2=0, n2=batch["n2"],
                streaming=True, deterministic=False, use_running_stats=False,
                rngs={"dropout": key}, mutable=["batch_stats"])
            m = streamspeech_loss(out, batch, unit_blank, w)
            return m["loss"] / m["sample_size"].astype(jnp.float32)

        @partial(jax.jit, donate_argnums=())
        def block(state, batches, seed0):
            key0 = jax.random.PRNGKey(seed0)

            def body(acc, xs):
                bt, i = xs
                return acc + loss_only(state.params, state.batch_stats, bt,
                                       jax.random.fold_in(key0, i)), None

            k_ = jax.tree_util.tree_leaves(batches)[0].shape[0]
            acc, _ = jax.lax.scan(body, jnp.zeros(()),
                                  (batches, jnp.arange(k_)))
            return state, {"loss_mean": acc[None] / k_}

        block._lower = lambda s, bt: block.lower(s, bt, 1)
    elif mode == "fwd+bwd":
        # grads computed, optimizer replaced by a trivial sgd apply (so the
        # grads are live) — delta vs `full` isolates Adam + clip cost
        from functools import partial

        def loss_fn(params, batch_stats, batch, key):
            var = {"params": params, "batch_stats": batch_stats}
            out, mut = model.apply(
                var, batch["src_tokens"], batch["src_lengths"],
                batch["prev_output_tokens_mt"], chunk_size=8,
                conv_chunk_size=8, k1=0, n1=1, k2=0, n2=batch["n2"],
                streaming=True, deterministic=False, use_running_stats=False,
                rngs={"dropout": key}, mutable=["batch_stats"])
            m = streamspeech_loss(out, batch, unit_blank, w)
            return m["loss"] / m["sample_size"].astype(jnp.float32)

        @partial(jax.jit, donate_argnums=(0,))
        def block(state, batches, seed0):
            key0 = jax.random.PRNGKey(seed0)

            def body(st, xs):
                bt, i = xs
                loss, grads = jax.value_and_grad(loss_fn)(
                    st.params, st.batch_stats, bt, jax.random.fold_in(key0, i))
                params = jax.tree_util.tree_map(
                    lambda p, g: p - 1e-9 * g.astype(p.dtype),
                    st.params, grads)
                return TrainState(params=params, batch_stats=st.batch_stats,
                                  opt_state=st.opt_state,
                                  step=st.step + 1), loss

            st, losses = jax.lax.scan(
                body, state,
                (batches, jnp.arange(jax.tree_util.tree_leaves(
                    batches)[0].shape[0])))
            return st, {"loss_mean": losses}

        block._lower = lambda s, bt: block.lower(s, bt, 1)
    else:
        step_k = make_train_step_scan(model, tx, unit_blank, weights=w)

        def block(state, batches, seed0):
            return step_k(state, batches, seed0, chunk_size=8,
                          conv_chunk_size=8)

        block._lower = lambda s, bt: step_k.lower(
            s, bt, 1, chunk_size=8, conv_chunk_size=8)

    stacked = jax.tree_util.tree_map(
        lambda x: np.broadcast_to(np.asarray(x)[None],
                                  (k,) + np.shape(x)).copy(), b)
    stacked = jax.device_put(stacked)
    return state, stacked, block


def profile_row(name, batch, frames, k, args, **build_kw):
    import jax

    from streamspeech_tpu import benchmarks as bm

    t_build = time.perf_counter()
    state, stacked, block = build(batch, frames, args.mt_len, args.units_len,
                                  args.text_len, k, **build_kw)
    # avals captured BEFORE the first (donating) execution so cost analysis
    # can lower from shapes without touching consumed buffers
    s_avals = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
    b_avals = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), stacked)
    state, ms = bm.retry_compile(lambda: block(state, stacked, 1),
                                 label=f"profile:{name}")
    float(jax.device_get(ms["loss_mean"][-1]))
    compile_s = time.perf_counter() - t_build

    flops = bytes_acc = None
    try:
        low = block._lower(s_avals, b_avals)
        cost = low.cost_analysis()
        if cost is None:
            cost = low.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        # XLA cost analysis counts a lax.scan body ONCE regardless of trip
        # count (verified: scan k=1 vs k=10 of a matmul report identical
        # flops) — the K-step block's numbers ARE the per-step numbers
        flops = float(cost.get("flops", 0.0)) or None
        bytes_acc = float(cost.get("bytes accessed", 0.0)) or None
        # XLA cost analysis counts tpu_custom_call (the Pallas kernels) as
        # ZERO flops — add the kernels' executed matmul FLOPs analytically
        # (benchmarks.pallas_train_flops mirrors the layers.py routing gates,
        # which also honor the STREAMSPEECH_DISABLE_PALLAS_* ablation envs,
        # so ablation rows count only the kernels they actually run).
        if flops:
            from streamspeech_tpu.train.synthetic import full_config

            pallas_f = bm.pallas_train_flops(
                full_config(), batch, frames, args.mt_len,
                train=build_kw.get("mode", "full") != "fwd-only")
            if pallas_f:
                flops += pallas_f
    except Exception:
        import traceback

        traceback.print_exc()

    ts = []
    for r in range(args.trials):
        t0 = time.perf_counter()
        state, ms = block(state, stacked, 2 + r)
        float(jax.device_get(ms["loss_mean"][-1]))
        ts.append((time.perf_counter() - t0) / k)
    dt = min(ts)

    peak = bm.chip_peak_flops()
    bw = hbm_bw()
    row = {
        "name": name, "batch": batch, "frames": frames, "k": k,
        "step_ms": round(dt * 1e3, 3),
        "audio_s_per_s": round(batch * frames * 0.01 / dt, 1),
        "compile_s": round(compile_s, 1),
    }
    if flops:
        row["tflops_per_step"] = round(flops / 1e12, 4)
        if peak:
            row["mfu"] = round(flops / dt / peak, 4)
        row["compute_bound_ms"] = round(flops / peak * 1e3, 3) if peak else None
    if bytes_acc:
        row["gb_per_step"] = round(bytes_acc / 1e9, 4)
        row["memory_bound_ms"] = round(bytes_acc / bw * 1e3, 3)
        row["hbm_frac"] = round(bytes_acc / bw / dt, 3)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[8, 16, 32, 64])
    ap.add_argument("--base-batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=1024)
    ap.add_argument("--mt-len", type=int, default=48)
    ap.add_argument("--units-len", type=int, default=256)
    ap.add_argument("--text-len", type=int, default=32)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--skip-ablations", action="store_true")
    ap.add_argument("--skip-sweep", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="/tmp/profile_train.jsonl")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from streamspeech_tpu.train.criterion import CriterionWeights

    rows = []
    done = set()
    try:  # resume: skip rows already recorded in --out
        with open(args.out) as f:
            for line in f:
                done.add(json.loads(line).get("name"))
    except OSError:
        pass

    def emit(name, *a, **kw):
        if name in done:
            print(f"skip {name} (already in {args.out})", file=sys.stderr)
            return
        try:
            row = profile_row(name, *a, **kw)
        except Exception:
            import traceback

            traceback.print_exc()
            return
        rows.append(row)
        print(json.dumps(row), flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")

    if not args.skip_sweep:
        for b in args.batches:
            emit(f"full-B{b}", b, args.frames, args.k, args)

    if not args.skip_ablations:
        B = args.base_batch
        emit("fwd-only", B, args.frames, args.k, args, mode="fwd-only")
        emit("fwd+bwd", B, args.frames, args.k, args, mode="fwd+bwd")
        emit("ce-only", B, args.frames, args.k, args,
             weights=CriterionWeights(unit_ctc=0.0, source_unigram=0.0,
                                      ctc_target_unigram=0.0))
        emit("no-aux-ctc", B, args.frames, args.k, args,
             weights=CriterionWeights(source_unigram=0.0,
                                      ctc_target_unigram=0.0))
        emit("unit-surrogate", B, args.frames, args.k, args,
             weights=CriterionWeights(unit_surrogate=True))
        # rel-pos encoder kernel on, fused causal unit-decoder kernel OFF —
        # isolates the masked_attention kernel's contribution
        os.environ["STREAMSPEECH_DISABLE_PALLAS_MASKED"] = "1"
        emit("no-masked-attn", B, args.frames, args.k, args)
        os.environ.pop("STREAMSPEECH_DISABLE_PALLAS_MASKED", None)
        # streaming-mask cross-attention kernel OFF (bias_attention ablation)
        os.environ["STREAMSPEECH_DISABLE_PALLAS_CROSS"] = "1"
        emit("no-cross-attn", B, args.frames, args.k, args)
        os.environ.pop("STREAMSPEECH_DISABLE_PALLAS_CROSS", None)
        # backward-pass remat of conformer + unit-decoder layers (--remat):
        # recompute vs activation HBM traffic on the memory-bound step
        os.environ["STREAMSPEECH_REMAT"] = "1"
        emit("remat", B, args.frames, args.k, args)
        os.environ.pop("STREAMSPEECH_REMAT", None)
        emit("no-pallas", B, args.frames, args.k, args, pallas=False)

    print(json.dumps({"rows": rows}, indent=1), file=sys.stderr)


if __name__ == "__main__":
    main()
