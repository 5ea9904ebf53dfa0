import jax
import jax.numpy as jnp
import numpy as np

from streamspeech_tpu.config import OptimizationConfig
from streamspeech_tpu.models.streamspeech import StreamSpeechModel, init_params
from streamspeech_tpu.train.checkpoint import (
    export_fairseq_streamspeech,
    import_fairseq_streamspeech,
    import_hifigan_vocoder,
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from streamspeech_tpu.train.synthetic import tiny_config
from streamspeech_tpu.train.trainer import TrainState, make_optimizer


def tree_equal(a, b):
    la = jax.tree.leaves(a)
    lb = jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)


def test_orbax_roundtrip_and_rotation(tmp_path):
    cfg = tiny_config()
    model = StreamSpeechModel(cfg)
    variables = init_params(model, jax.random.PRNGKey(0))
    tx = make_optimizer(OptimizationConfig(update_freq=1))
    state = TrainState.create(variables, tx)
    for step in range(4):
        save_checkpoint(str(tmp_path), step, state, config={"a": 1}, keep_last=2)
    ckpts = sorted(p.name for p in tmp_path.glob("checkpoint_*"))
    assert ckpts == ["checkpoint_2", "checkpoint_3"]
    assert latest_checkpoint(str(tmp_path)).endswith("checkpoint_3")
    restored = load_checkpoint(latest_checkpoint(str(tmp_path)), target=state)
    tree_equal(restored["params"], state.params)


def test_keep_best_rotation(tmp_path):
    """--keep-best-checkpoints semantics (fairseq checkpoint_utils.py:83-104):
    copy in only when better than the worst kept best (or fewer than N kept),
    prune beyond N, best_checkpoint() returns the winner, restore works."""
    from streamspeech_tpu.train.checkpoint import best_checkpoint

    cfg = tiny_config()
    model = StreamSpeechModel(cfg)
    variables = init_params(model, jax.random.PRNGKey(0))
    tx = make_optimizer(OptimizationConfig(update_freq=1))
    state = TrainState.create(variables, tx)

    # val-loss trajectory: 0.9, 0.5, 0.7 (kept, replaces nothing yet), then
    # 0.8 is WORSE than both kept -> not copied; 0.4 evicts 0.7
    for step, val in [(1, 0.9), (2, 0.5), (3, 0.7), (4, 0.8), (5, 0.4)]:
        save_checkpoint(str(tmp_path), step, state, keep_last=10,
                        keep_best=2, val_metric=val)
    best = sorted(p.name for p in tmp_path.glob("checkpoint.best_*"))
    assert best == ["checkpoint.best_0.4_5", "checkpoint.best_0.5_2"], best
    assert best_checkpoint(str(tmp_path)).endswith("checkpoint.best_0.4_5")
    # best copies don't disturb the recency rotation / latest_checkpoint
    assert latest_checkpoint(str(tmp_path)).endswith("checkpoint_5")
    restored = load_checkpoint(best_checkpoint(str(tmp_path)), target=state)
    tree_equal(restored["params"], state.params)

    # maximize mode (e.g. BLEU): higher wins
    d2 = tmp_path / "max"
    for step, val in [(1, 10.0), (2, 30.0), (3, 20.0), (4, 5.0)]:
        save_checkpoint(str(d2), step, state, keep_last=10, keep_best=2,
                        val_metric=val, maximize=True)
    best = sorted(p.name for p in d2.glob("checkpoint.best_*"))
    assert best == ["checkpoint.best_20.0_3", "checkpoint.best_30.0_2"]
    assert best_checkpoint(str(d2), maximize=True).endswith(
        "checkpoint.best_30.0_2")


def test_keep_best_exact_metric_and_nonfinite(tmp_path):
    """The stored metric must round-trip EXACTLY through the directory name
    (a 4-decimal rendering made 0.12342 lose to a stored 0.12349999, and made
    near-tie improvements unrankable), and non-finite metrics must never
    create best dirs (an unparsable checkpoint.best_nan_* tree per validation
    would accumulate unpruned for the rest of the run)."""
    from streamspeech_tpu.train.checkpoint import best_checkpoint

    cfg = tiny_config()
    model = StreamSpeechModel(cfg)
    variables = init_params(model, jax.random.PRNGKey(0))
    tx = make_optimizer(OptimizationConfig(update_freq=1))
    state = TrainState.create(variables, tx)

    vals = [(1, 0.12349999), (2, 0.12342),           # genuinely better tie
            (3, float("nan")), (4, float("inf")),    # diverged validations
            (5, 1.5e-07)]                            # exponent rendering
    for step, val in vals:
        save_checkpoint(str(tmp_path), step, state, keep_last=10,
                        keep_best=2, val_metric=val)
    best = sorted(p.name for p in tmp_path.glob("checkpoint.best_*"))
    assert best == ["checkpoint.best_0.12342_2", "checkpoint.best_1.5e-07_5"], best
    assert best_checkpoint(str(tmp_path)).endswith("checkpoint.best_1.5e-07_5")

    # would_enter_best is the train loop's pre-serialization admission check:
    # it must agree with what _rotate_best would actually admit
    from streamspeech_tpu.train.checkpoint import would_enter_best

    assert would_enter_best(str(tmp_path), 0.12342, keep_best=2)   # tie w/ kept
    assert would_enter_best(str(tmp_path), 1e-9, keep_best=2)
    assert not would_enter_best(str(tmp_path), 0.2, keep_best=2)   # plateaued
    assert not would_enter_best(str(tmp_path), float("nan"), keep_best=2)
    assert not would_enter_best(str(tmp_path), 0.2, keep_best=0)
    assert would_enter_best(str(tmp_path / "fresh"), 9.9, keep_best=2)
    # maximize mode flips the comparison
    assert would_enter_best(str(tmp_path), 0.2, keep_best=2, maximize=True)


def torchify(sd):
    import torch

    return {k: torch.tensor(np.asarray(v)) for k, v in sd.items()}


def test_fairseq_import_export_roundtrip(tmp_path):
    import torch

    cfg = tiny_config()
    model = StreamSpeechModel(cfg)
    variables = init_params(model, jax.random.PRNGKey(0))
    params = jax.tree.map(np.asarray, variables["params"])
    batch_stats = jax.tree.map(np.asarray, variables["batch_stats"])

    sd = export_fairseq_streamspeech(params, batch_stats)
    # spot-check reference names exist with torch layouts
    assert "encoder.conformer_layers.0.self_attn.linear_q.weight" in sd
    assert "target_unigram_decoder.layers.0.encoder_attn.k_proj.weight" in sd
    assert "decoder.embed_tokens.weight" in sd
    assert sd["encoder.subsample.conv_layers.0.weight"].shape[2] == 5  # [out,in,k]

    pt = tmp_path / "model.pt"
    torch.save({"model": torchify(sd), "cfg": {"arch": "streamspeech"}}, pt)
    params2, bs2, cfg2 = import_fairseq_streamspeech(str(pt))
    tree_equal(params, params2)
    tree_equal(batch_stats, bs2)
    assert cfg2["arch"] == "streamspeech"

    # the imported tree must drive the model (structure compatibility)
    out = model.apply({"params": params2, "batch_stats": bs2},
                      jnp.zeros((1, 32, 80)), jnp.array([32]),
                      jnp.array([[2, 5, 6]], dtype=jnp.int32), n2=1)
    assert np.isfinite(np.asarray(out["unit_logits"])).all()


def test_hifigan_import(tmp_path):
    """Build a synthetic weight-normed torch generator state dict and import."""
    import torch

    from streamspeech_tpu.models.vocoder import CodeGenerator
    from tests.test_vocoder import tiny_cfg

    cfg = tiny_cfg()
    voc = CodeGenerator(cfg)
    variables = voc.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32),
                         max_frames=8)

    rng = np.random.RandomState(0)

    def wn(shape):
        # produce weight_g/weight_v whose fold equals a known weight
        w = rng.randn(*shape).astype(np.float32)
        v = w.copy()
        g = np.sqrt((v ** 2).reshape(v.shape[0], -1).sum(1)).reshape(
            (-1,) + (1,) * (v.ndim - 1))
        return w, v, g

    sd = {}
    emb = rng.randn(cfg["num_embeddings"], cfg["embedding_dim"]).astype(np.float32)
    sd["dict.weight"] = emb
    ch = cfg["upsample_initial_channel"]
    w, v, g = wn((ch, cfg["model_in_dim"], 7))
    sd["conv_pre.weight_v"], sd["conv_pre.weight_g"] = v, g
    sd["conv_pre.bias"] = rng.randn(ch).astype(np.float32)
    for i, (u, k) in enumerate(zip(cfg["upsample_rates"],
                                   cfg["upsample_kernel_sizes"])):
        cin, cout = ch // (2 ** i), ch // (2 ** (i + 1))
        w, v, g = wn((cin, cout, k))
        sd[f"ups.{i}.weight_v"], sd[f"ups.{i}.weight_g"] = v, g
        sd[f"ups.{i}.bias"] = rng.randn(cout).astype(np.float32)
    n_res = len(cfg["upsample_rates"]) * len(cfg["resblock_kernel_sizes"])
    for r in range(n_res):
        lvl = r // len(cfg["resblock_kernel_sizes"])
        c = ch // (2 ** (lvl + 1))
        kk = cfg["resblock_kernel_sizes"][r % len(cfg["resblock_kernel_sizes"])]
        n_dil = len(cfg["resblock_dilation_sizes"][r % len(cfg["resblock_kernel_sizes"])])
        for br in ("convs1", "convs2"):
            for j in range(n_dil):
                w, v, g = wn((c, c, kk))
                sd[f"resblocks.{r}.{br}.{j}.weight_v"] = v
                sd[f"resblocks.{r}.{br}.{j}.weight_g"] = g
                sd[f"resblocks.{r}.{br}.{j}.bias"] = rng.randn(c).astype(np.float32)
    cpost_in = ch // (2 ** len(cfg["upsample_rates"]))
    w, v, g = wn((1, cpost_in, 7))
    sd["conv_post.weight_v"], sd["conv_post.weight_g"] = v, g
    sd["conv_post.bias"] = rng.randn(1).astype(np.float32)
    dp = cfg["dur_predictor_params"]
    sd["dur_predictor.conv1.0.weight"] = rng.randn(
        dp["var_pred_hidden_dim"], dp["encoder_embed_dim"],
        dp["var_pred_kernel_size"]).astype(np.float32)
    sd["dur_predictor.conv1.0.bias"] = rng.randn(dp["var_pred_hidden_dim"]).astype(np.float32)
    sd["dur_predictor.ln1.weight"] = np.ones(dp["var_pred_hidden_dim"], np.float32)
    sd["dur_predictor.ln1.bias"] = np.zeros(dp["var_pred_hidden_dim"], np.float32)
    sd["dur_predictor.conv2.0.weight"] = rng.randn(
        dp["var_pred_hidden_dim"], dp["var_pred_hidden_dim"],
        dp["var_pred_kernel_size"]).astype(np.float32)
    sd["dur_predictor.conv2.0.bias"] = rng.randn(dp["var_pred_hidden_dim"]).astype(np.float32)
    sd["dur_predictor.ln2.weight"] = np.ones(dp["var_pred_hidden_dim"], np.float32)
    sd["dur_predictor.ln2.bias"] = np.zeros(dp["var_pred_hidden_dim"], np.float32)
    sd["dur_predictor.proj.weight"] = rng.randn(1, dp["var_pred_hidden_dim"]).astype(np.float32)
    sd["dur_predictor.proj.bias"] = rng.randn(1).astype(np.float32)

    import json
    ckpt = tmp_path / "g_00500000"
    cfg_path = tmp_path / "config.json"
    torch.save({"generator": torchify(sd)}, ckpt)
    cfg_path.write_text(json.dumps(cfg))

    imported, cfg2 = import_hifigan_vocoder(str(ckpt), str(cfg_path))
    # structure must match the flax init tree
    init_paths = {jax.tree_util.keystr(p)
                  for p, _ in jax.tree_util.tree_flatten_with_path(variables)[0]}
    imp_paths = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_flatten_with_path(imported)[0]}
    assert init_paths == imp_paths, (
        f"missing: {init_paths - imp_paths}\nextra: {imp_paths - init_paths}")
    # folded weight-norm equals the original weight
    np.testing.assert_allclose(
        np.asarray(imported["params"]["generator"]["conv_pre_w"]),
        sd["conv_pre.weight_v"].transpose(2, 1, 0), rtol=1e-5)
    # and the imported vocoder runs
    wav, n, dur = voc.apply(imported, jnp.array([[1, 2, 3]]), max_frames=12)
    assert np.isfinite(np.asarray(wav)).all()


def test_config_inference_from_imported_params(tmp_path):
    import torch

    from streamspeech_tpu.train.checkpoint import infer_config_from_params

    cfg = tiny_config()
    model = StreamSpeechModel(cfg)
    variables = init_params(model, jax.random.PRNGKey(0))
    sd = export_fairseq_streamspeech(
        jax.tree.map(np.asarray, variables["params"]),
        jax.tree.map(np.asarray, variables["batch_stats"]))
    pt = tmp_path / "m.pt"
    torch.save({"model": torchify(sd)}, pt)
    params, bs, _ = import_fairseq_streamspeech(str(pt))
    inferred = infer_config_from_params(params, bs)
    assert inferred.encoder.layers == cfg.encoder.layers
    assert inferred.encoder.embed_dim == cfg.encoder.embed_dim
    assert inferred.mt_decoder.vocab_size == cfg.mt_decoder.vocab_size
    assert inferred.unit_decoder.vocab_size == cfg.unit_decoder.vocab_size
    assert inferred.synthesizer_encoder_layers == cfg.synthesizer_encoder_layers
    # inferred config drives the model with imported params
    m2 = StreamSpeechModel(inferred)
    out = m2.apply({"params": params, "batch_stats": bs},
                   jnp.zeros((1, 32, 80)), jnp.array([32]),
                   jnp.array([[2, 5]], dtype=jnp.int32), n2=1)
    assert np.isfinite(np.asarray(out["unit_logits"])).all()


def test_average_checkpoints_and_cli(tmp_path):
    """fairseq average_checkpoints semantics: element-wise float mean, first
    checkpoint's metadata (`fairseq/scripts/average_checkpoints.py:17-65`)."""
    cfg = tiny_config()
    model = StreamSpeechModel(cfg)
    tx = make_optimizer(OptimizationConfig(update_freq=1))
    states = []
    for seed in range(3):
        variables = init_params(model, jax.random.PRNGKey(seed))
        state = TrainState.create(variables, tx)
        save_checkpoint(str(tmp_path), seed, state, keep_last=10)
        states.append(state)

    from streamspeech_tpu.train.checkpoint import average_checkpoints

    paths = [str(tmp_path / f"checkpoint_{i}") for i in range(3)]
    payload = average_checkpoints(paths)
    expect = jax.tree.map(
        lambda a, b, c: (np.asarray(a, np.float64) + np.asarray(b, np.float64)
                         + np.asarray(c, np.float64)) / 3,
        states[0].params, states[1].params, states[2].params)
    tree_equal(payload["params"], expect)
    # metadata comes from the first checkpoint
    assert int(np.asarray(payload["step"])) == int(np.asarray(states[0].step))

    # CLI over a save dir with --num-last
    from streamspeech_tpu.cli.average_checkpoints import main as avg_main

    out = tmp_path / "averaged"
    avg_main(["--inputs", str(tmp_path), "--num-last", "3",
              "--output", str(out)])
    restored = load_checkpoint(str(out))
    tree_equal(restored["params"], expect)


def test_load_pretrained_component(tmp_path):
    """fairseq load_pretrained_component_from_model
    (`fairseq/fairseq/checkpoint_utils.py:821-851`): graft one tower into a
    fresh model."""
    cfg = tiny_config()
    model = StreamSpeechModel(cfg)
    tx = make_optimizer(OptimizationConfig(update_freq=1))
    donor = init_params(model, jax.random.PRNGKey(5))
    save_checkpoint(str(tmp_path), 0, TrainState.create(donor, tx))

    from streamspeech_tpu.train.checkpoint import load_pretrained_component

    fresh = init_params(model, jax.random.PRNGKey(6))
    path = str(tmp_path / "checkpoint_0")
    grafted = load_pretrained_component(fresh, path, "encoder")
    tree_equal(grafted["params"]["encoder"], donor["params"]["encoder"])
    tree_equal(grafted["params"]["mt_decoder"], fresh["params"]["mt_decoder"])
    tree_equal(grafted["batch_stats"]["encoder"],
               donor["batch_stats"]["encoder"])

    import pytest as _pytest

    with _pytest.raises(KeyError):
        load_pretrained_component(fresh, path, "nonexistent_tower")
