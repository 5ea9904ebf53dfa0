"""Training CLI — the fairseq-train equivalent (`fairseq_cli/train.py:44-300`).

Differences: no process spawning (JAX SPMD owns devices); config through
dataclasses + the same YAML data configs; checkpoints via orbax.

Example (synthetic smoke run):
  python -m streamspeech_tpu.cli.train --synthetic --max-update 20 \
      --save-dir /tmp/ckpt --log-interval 5

Real data:
  python -m streamspeech_tpu.cli.train --data /path/fbank2unit \
      --config-yaml config_gcmvn.yaml --multitask-config-yaml config_mtl.yaml \
      --target-code-size 1000 --max-tokens 22000 --update-freq 2
"""

from __future__ import annotations

import argparse
import random
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from streamspeech_tpu.config import (
    MultitaskConfig,
    OptimizationConfig,
    S2SDataConfig,
    StreamSpeechConfig,
    to_dict,
)
from streamspeech_tpu.data.dataset import SpeechToSpeechDataset
from streamspeech_tpu.dictionary import Dictionary
from streamspeech_tpu.models.streamspeech import StreamSpeechModel, init_params
from streamspeech_tpu.parallel.mesh import make_mesh
from streamspeech_tpu.train.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
    would_enter_best,
)
from streamspeech_tpu.train.synthetic import synthetic_batch, tiny_config
from streamspeech_tpu.train.trainer import (
    batch_spec,
    create_sharded_state,
    make_optimizer,
    make_train_step,
    make_train_step_scan,
)
from streamspeech_tpu.utils.metrics import JsonProgress, metrics


def add_args(p: argparse.ArgumentParser):
    p.add_argument("--data", type=str, default=None)
    p.add_argument("--config-yaml", type=str, default="config_gcmvn.yaml")
    p.add_argument("--multitask-config-yaml", type=str, default=None)
    p.add_argument("--train-subset", type=str, default="train")
    p.add_argument("--valid-subset", type=str, default="dev")
    p.add_argument("--target-code-size", type=int, default=1000)
    p.add_argument("--max-tokens", type=int, default=22000)
    p.add_argument("--max-sentences", type=int, default=0)
    p.add_argument("--update-freq", type=int, default=2)
    p.add_argument("--steps-per-call", type=int, default=1,
                   help="run K optimizer steps per device dispatch via a "
                        "device-side scan over K stacked same-shape batches "
                        "(amortizes per-call host/RPC overhead; multichunk "
                        "chunk sizes are drawn per block, rng per step)")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--warmup-updates", type=int, default=10000)
    p.add_argument("--warmup-init-lr", type=float, default=1e-7)
    p.add_argument("--clip-norm", type=float, default=1.0)
    p.add_argument("--max-update", type=int, default=100000)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--save-dir", type=str, default="checkpoints")
    p.add_argument("--save-interval-updates", type=int, default=1000)
    p.add_argument("--keep-last", type=int, default=10)
    p.add_argument("--keep-best-checkpoints", type=int, default=0,
                   help="also keep the N best checkpoints by validation loss "
                        "as checkpoint.best_<metric>_<step> (fairseq "
                        "checkpoint_utils.py:83-104; the reference recipe "
                        "trains with --keep-best-checkpoints 10)")
    p.add_argument("--maximize-best-checkpoint-metric", action="store_true",
                   default=False)
    p.add_argument("--log-interval", type=int, default=100)
    p.add_argument("--validate-interval-updates", type=int, default=1000)
    p.add_argument("--max-valid-batches", type=int, default=50,
                   help="cap on scored validation batches (0 = score all)")
    p.add_argument("--tensorboard-logdir", type=str, default=None,
                   help="mirror train/valid stats as tensorboard scalars")
    # streaming-mask training (train.simul-s2st.sh)
    p.add_argument("--k1", type=int, default=0)
    p.add_argument("--n1", type=int, default=1)
    p.add_argument("--k2", type=int, default=0)
    p.add_argument("--n2", type=int, default=-1)
    p.add_argument("--chunk-size", type=int, default=8)
    p.add_argument("--multichunk", action="store_true", default=False)
    p.add_argument("--ctc-upsample-rate", type=int, default=25)
    p.add_argument("--n-frames-per-step", type=int, default=1,
                   help="stacked units: the decoder emits N raw-vocab unit "
                        "frames per position; the dataset additionally packs "
                        "prev_output_tokens_unit for AR consumers (fairseq "
                        "--n-frames-per-step, speech_to_speech_dataset.py:88;"
                        " the StreamSpeech recipe uses 1)")
    p.add_argument("--encoder-layers", type=int, default=12)
    p.add_argument("--dropout", type=float, default=None,
                   help="override model dropout everywhere (fairseq "
                        "--dropout; default: the architecture's 0.1)")
    p.add_argument("--remat", action="store_true", default=False,
                   help="rematerialize conformer + unit-decoder layers in "
                        "the backward pass (recompute instead of storing "
                        "activations; numerics identical — the step is "
                        "HBM-bound, see docs/training.md roofline)")
    # parallelism
    p.add_argument("--tp", type=int, default=1, help="model-parallel size")
    p.add_argument("--fsdp", action="store_true", default=False)
    # smoke testing
    p.add_argument("--synthetic", action="store_true", default=False,
                   help="train on synthetic data with a tiny model")
    p.add_argument("--tiny-dims", action="store_true", default=False,
                   help="real data path with scaled-down model dims "
                        "(learnability goldens on the CPU mesh; vocab sizes "
                        "still come from the task dictionaries)")
    p.add_argument("--cpu", action="store_true", default=False,
                   help="force the CPU backend (must run before backend "
                        "init; this environment's sitecustomize otherwise "
                        "force-selects the remote TPU)")
    return p


def build_model_config(args, dicts) -> StreamSpeechConfig:
    if args.synthetic:
        return tiny_config()
    if args.tiny_dims:
        cfg = tiny_config()
        cfg.encoder.layers = min(args.encoder_layers, cfg.encoder.layers + 2)
    else:
        cfg = StreamSpeechConfig.simul_s2st()
        cfg.encoder.layers = args.encoder_layers
    if args.dropout is not None:
        cfg.encoder.dropout = args.dropout
        cfg.mt_decoder.dropout = args.dropout
        cfg.unit_decoder.dropout = args.dropout
    if args.remat:
        cfg.encoder.remat = True
        cfg.unit_decoder.remat = True
    cfg.unit_decoder.ctc_upsample_rate = args.ctc_upsample_rate
    cfg.unit_decoder.n_frames_per_step = args.n_frames_per_step
    cfg.unit_decoder.vocab_size = len(dicts["units"])
    cfg.mt_decoder.vocab_size = len(dicts["target_unigram"])
    cfg.source_unigram_vocab = len(dicts["source_unigram"])
    cfg.ctc_target_unigram_vocab = len(dicts["ctc_target_unigram"])
    return cfg


def load_task(args):
    """Dictionaries + datasets from the data dir (reference task setup,
    `fairseq/fairseq/tasks/speech_to_speech.py:212-290`)."""
    data = Path(args.data)
    unit_dict = Dictionary.units(args.target_code_size)
    unit_dict.add_blank()
    dicts = {"units": unit_dict}
    mt_cfg = MultitaskConfig.load(str(data / args.multitask_config_yaml)) \
        if args.multitask_config_yaml else MultitaskConfig()
    data_cfg = S2SDataConfig.load(str(data / args.config_yaml))
    for name, task in mt_cfg.tasks.items():
        dicts[name] = Dictionary.load(task.dict_path)

    def make_split(split):
        manifest = data / f"{split}.tsv"
        if not manifest.exists():
            return None
        targets = {}
        for name, task in mt_cfg.tasks.items():
            t_path = Path(task.data) / f"{split}.tsv"
            if not t_path.exists():
                t_path = data / name / f"{split}.tsv"
            if t_path.exists():
                targets[name] = SpeechToSpeechDataset.load_multitask_targets(
                    str(t_path), dicts[name])
        return SpeechToSpeechDataset(str(manifest), unit_dict, data_cfg,
                                     targets, split=split,
                                     n_frames_per_step=args.n_frames_per_step)

    return dicts, make_split(args.train_subset), make_split(args.valid_subset)


def main(argv=None):
    args = add_args(argparse.ArgumentParser()).parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    rng = random.Random(args.seed)
    np.random.seed(args.seed)

    # reuse on-disk XLA executables across training processes (TPU-only
    # no-op elsewhere); saves the 1-4 min remote compile of the train step
    # on every restart/resume
    from streamspeech_tpu import enable_persistent_compile_cache
    enable_persistent_compile_cache()

    if args.synthetic:
        dicts = None
        model_cfg = tiny_config()
        train_ds = valid_ds = None
    else:
        dicts, train_ds, valid_ds = load_task(args)
        model_cfg = build_model_config(args, dicts)

    model = StreamSpeechModel(model_cfg)
    variables = init_params(model, jax.random.PRNGKey(args.seed))
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))

    opt = OptimizationConfig(
        lr=args.lr, warmup_updates=args.warmup_updates,
        warmup_init_lr=args.warmup_init_lr, clip_norm=args.clip_norm,
        update_freq=args.update_freq, max_tokens=args.max_tokens,
        max_update=args.max_update)
    tx = make_optimizer(opt)
    from streamspeech_tpu.train.criterion import CriterionWeights
    weights = CriterionWeights()
    specaugment_cfg = None
    if not args.synthetic and args.multitask_config_yaml:
        mt_cfg = MultitaskConfig.load(
            str(Path(args.data) / args.multitask_config_yaml))
        kw = {}
        for name, t in mt_cfg.tasks.items():
            if name in ("target_unigram", "source_unigram",
                        "ctc_target_unigram"):
                kw[name] = t.loss_weight
        if kw:
            weights = CriterionWeights(**kw)
        data_cfg = S2SDataConfig.load(str(Path(args.data) / args.config_yaml))
        if "specaugment" in data_cfg.get_transforms(args.train_subset):
            specaugment_cfg = data_cfg.specaugment
    step_fn = make_train_step(model, tx,
                              unit_blank=model_cfg.unit_decoder.vocab_size - 1,
                              weights=weights,
                              specaugment_cfg=specaugment_cfg)
    step_fn_k = (make_train_step_scan(
        model, tx, unit_blank=model_cfg.unit_decoder.vocab_size - 1,
        weights=weights, specaugment_cfg=specaugment_cfg)
        if args.steps_per_call > 1 else None)

    mesh = make_mesh(model=args.tp)
    # synthetic batch must divide across the data mesh axis
    n_data = dict(mesh.shape).get("data", 1)
    syn_batch = max(4, n_data)
    state = create_sharded_state(variables, tx, mesh, fsdp=args.fsdp,
                                 tp=args.tp > 1)
    if args.save_dir:
        Path(args.save_dir).mkdir(parents=True, exist_ok=True)
    progress = JsonProgress(log_file=str(Path(args.save_dir) / "train.log")
                            if args.save_dir else None,
                            tensorboard_logdir=args.tensorboard_logdir)
    progress.log({"event": "init", "params": n_params,
                  "devices": len(jax.devices()),
                  "mesh": dict(mesh.shape)}, tag="setup", step=0)

    # resume
    ckpt = latest_checkpoint(args.save_dir)
    if ckpt:
        restored = load_checkpoint(ckpt, target=state)
        import dataclasses as dc
        state = dc.replace(state, params=restored["params"],
                           batch_stats=restored["batch_stats"],
                           opt_state=restored["opt_state"],
                           step=restored["step"])
        progress.log({"event": "resumed", "from": ckpt}, tag="setup")

    @jax.jit
    def eval_loss(params, batch_stats, batch):
        from streamspeech_tpu.train.criterion import streamspeech_loss

        out = model.apply({"params": params, "batch_stats": batch_stats},
                          batch["src_tokens"], batch["src_lengths"],
                          batch["prev_output_tokens_mt"],
                          chunk_size=8, conv_chunk_size=8, n2=batch["n2"])
        m = streamspeech_loss(out, batch,
                              model_cfg.unit_decoder.vocab_size - 1, weights)
        return m["loss"] / m["sample_size"].astype(jnp.float32)

    def validate(state):
        if args.synthetic:
            batches = [synthetic_batch(model_cfg, batch=syn_batch, frames=64,
                                       seed=999)]
        elif valid_ds is not None:
            all_idx = valid_ds.batches(args.max_tokens, args.max_sentences)
            cap = args.max_valid_batches
            if cap and len(all_idx) > cap:
                progress.log({"event": "valid_truncated", "scored": cap,
                              "total": len(all_idx)}, tag="setup")
                all_idx = all_idx[:cap]
            batches = [
                {k: jnp.asarray(v) for k, v in valid_ds.collate(idx).items()
                 if k != "id"}
                for idx in all_idx]
        else:
            return None
        losses = []
        for b in batches:
            b = dict(b, n2=jnp.asarray(1, jnp.int32))
            losses.append(float(eval_loss(state.params, state.batch_stats, b)))
        return float(np.mean(losses)) if losses else None

    def batch_iterator(epoch):
        if args.synthetic:
            for i in range(10000):
                yield synthetic_batch(model_cfg, batch=syn_batch, frames=64,
                                      seed=epoch * 10000 + i)
        else:
            for idx in train_ds.batches(args.max_tokens, args.max_sentences,
                                        shuffle_seed=args.seed + epoch):
                b = train_ds.collate(idx)
                b.pop("id", None)
                # host numpy: transferred once by the loop's single
                # device_put, not leaf-by-leaf eager asarray RPCs
                yield b

    num_updates = int(state.step)
    epoch = 0
    t_last = time.perf_counter()

    def draw_chunks():
        # multichunk randomization (`speech_to_speech_ctc_asr_st_criterion.py:149-168`)
        if args.multichunk:
            chunk = rng.choice([8, 16, 24, 32, 99999])
            conv_chunk = rng.choice([8, 16])
            chunk = min(chunk, conv_chunk) if chunk < 999 else chunk
        else:
            chunk, conv_chunk = args.chunk_size, min(args.chunk_size, 16)
        return int(chunk), int(conv_chunk)

    def prep(batch):
        n2 = args.n2 if args.n2 >= 0 else rng.randint(
            1, 1 + int(batch["prev_output_tokens_mt"].shape[1]))
        return dict(batch, n2=np.int32(n2))

    def account(m):
        """Per-update bookkeeping over an already-fetched host metric dict."""
        nonlocal num_updates, t_last
        num_updates += 1
        sample_size = float(m["sample_size"])
        metrics.log_scalar("loss", float(m["loss_mean"]))
        metrics.log_scalar("unit_ctc", float(m["unit_ctc_loss"]) / sample_size)
        metrics.log_scalar("grad_norm", float(m["grad_norm"]))
        metrics.log_scalar("overflow", float(m["overflow"]))
        if num_updates % args.log_interval == 0:
            stats = metrics.get_smoothed_values("default")
            dt = time.perf_counter() - t_last
            stats["ups"] = args.log_interval / dt if dt > 0 else 0.0
            t_last = time.perf_counter()
            progress.log(stats, tag="train", step=num_updates)
            metrics.reset_scope("default")
        if num_updates % args.validate_interval_updates == 0:
            val = validate(state)
            if val is not None:
                progress.log({"valid_loss": val}, tag="valid",
                             step=num_updates)
                if args.save_dir and args.keep_best_checkpoints > 0 and (
                        num_updates % args.save_interval_updates == 0
                        or would_enter_best(
                            args.save_dir, val, args.keep_best_checkpoints,
                            args.maximize_best_checkpoint_metric)):
                    # metric-bearing save at the validation point (fairseq
                    # ties best-rotation to validate_interval_updates). A
                    # plateaued metric at a non-save-interval validation is
                    # NOT serialized: the full state write would be pruned
                    # immediately (would_enter_best pre-check)
                    save_checkpoint(
                        args.save_dir, num_updates, state,
                        config=to_dict(model_cfg), keep_last=args.keep_last,
                        keep_best=args.keep_best_checkpoints, val_metric=val,
                        maximize=args.maximize_best_checkpoint_metric)
                    return
        if args.save_dir and num_updates % args.save_interval_updates == 0:
            save_checkpoint(args.save_dir, num_updates, state,
                            config=to_dict(model_cfg),
                            keep_last=args.keep_last)

    def run_single(b):
        nonlocal state
        # ONE device_put call for the whole dict (a per-leaf tree.map is
        # ~10 separate ~31 ms transfer RPCs through the remote tunnel)
        b = jax.device_put(b, batch_spec(mesh, b))
        # Tunnel RPC discipline (CLAUDE.md): the rng is a HOST int seed
        # (inlined into the execute RPC; the key is derived inside the
        # jitted step — an eager PRNGKey between chained donated
        # dispatches measured 15 s/step), the update counter advances
        # host-side (state.step increments by exactly 1 per call; an
        # `int(state.step)` fetch measured 25 s/step), and ALL metric
        # scalars come back in ONE device_get.
        chunk, conv_chunk = draw_chunks()
        state, m = step_fn(state, b, args.seed * 100003 + num_updates,
                           chunk_size=chunk, conv_chunk_size=conv_chunk)
        account(jax.device_get(m))

    def run_block(group):
        nonlocal state
        stacked = jax.tree.map(lambda *xs: np.stack(xs), *group)
        stacked = jax.device_put(stacked, batch_spec(mesh, stacked))
        chunk, conv_chunk = draw_chunks()
        state, ms = step_fn_k(state, stacked,
                              args.seed * 100003 + num_updates,
                              chunk_size=chunk, conv_chunk_size=conv_chunk)
        ms = jax.device_get(ms)  # ONE fetch for the whole block's metrics
        for i in range(len(group)):
            account({k: v[i] for k, v in ms.items()})

    # steps-per-call > 1: group K consecutive same-shape batches and run each
    # group as one device-side scan dispatch; stragglers (end of epoch,
    # max_update boundary, odd bucket shapes) fall back to single steps
    pending = {}

    def flush_pending():
        for group in pending.values():
            for b in group:
                if num_updates < args.max_update:
                    run_single(b)
        pending.clear()

    while num_updates < args.max_update:
        epoch += 1
        for batch in batch_iterator(epoch):
            if num_updates >= args.max_update:
                break
            if step_fn_k is None:
                run_single(prep(batch))
                continue
            b = prep(batch)
            sig = tuple(sorted(
                (k, getattr(v, "shape", ())) for k, v in b.items()))
            pending.setdefault(sig, []).append(b)
            if len(pending[sig]) == args.steps_per_call:
                group = pending.pop(sig)
                if num_updates + len(group) <= args.max_update:
                    run_block(group)
                else:
                    for bb in group:
                        if num_updates < args.max_update:
                            run_single(bb)
        flush_pending()
    if args.save_dir:
        save_checkpoint(args.save_dir, num_updates, state,
                        config=to_dict(model_cfg), keep_last=args.keep_last)
    progress.log({"event": "done"}, tag="train", step=num_updates)


if __name__ == "__main__":
    main()
