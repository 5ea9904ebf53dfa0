"""HuBERT JAX port: shapes, downsampling factor, and checkpoint import
structure (synthetic fairseq-layout state dict, like the HiFi-GAN test)."""

import jax
import jax.numpy as jnp
import numpy as np

from streamspeech_tpu.models.hubert import BASE_CONV_LAYERS, HubertModel
from streamspeech_tpu.train.checkpoint import import_hubert


def tiny_hubert():
    return HubertModel(embed_dim=32, ffn_dim=64, heads=2, num_layers=3,
                       pos_conv_kernel=16, pos_conv_groups=4)


def test_feature_rate():
    model = tiny_hubert()
    wav = jnp.zeros((1, 3200))
    variables = model.init(jax.random.PRNGKey(0), wav, output_layer=3)
    feats = model.apply(variables, wav, output_layer=2)
    # total conv stride 320 → 50 Hz features, minus receptive-field edge
    assert feats.shape[0] == 1 and feats.shape[2] == 32
    assert 8 <= feats.shape[1] <= 10
    # deeper layer differs from shallower
    f3 = model.apply(variables, wav, output_layer=3)
    assert f3.shape == feats.shape


def test_hubert_import_structure(tmp_path):
    import torch

    model = tiny_hubert()
    wav = jnp.zeros((1, 3200))
    variables = model.init(jax.random.PRNGKey(0), wav, output_layer=3)

    rng = np.random.RandomState(0)
    sd = {}
    in_ch = 1
    for i, (dim, k, s) in enumerate(BASE_CONV_LAYERS):
        if i >= 7:
            break
        sd[f"feature_extractor.conv_layers.{i}.0.weight"] = \
            rng.randn(32 if False else dim, in_ch, k).astype(np.float32)
        in_ch = dim
    # tiny model: rebuild conv weights with its actual dims by reading shapes
    sd = {}
    p = variables["params"]["feature_extractor"]
    in_ch = 1
    for i in range(len(BASE_CONV_LAYERS)):
        kk, cin, cout = p[f"conv{i}_w"].shape
        sd[f"feature_extractor.conv_layers.{i}.0.weight"] = \
            rng.randn(cout, cin, kk).astype(np.float32)
    gn = p["group_norm"]
    sd["feature_extractor.conv_layers.0.2.weight"] = np.ones_like(
        np.asarray(gn["scale"]))
    sd["feature_extractor.conv_layers.0.2.bias"] = np.zeros_like(
        np.asarray(gn["bias"]))
    d = variables["params"]["post_extract_proj"]["kernel"].shape
    sd["layer_norm.weight"] = np.ones(d[0], np.float32)
    sd["layer_norm.bias"] = np.zeros(d[0], np.float32)
    sd["post_extract_proj.weight"] = rng.randn(d[1], d[0]).astype(np.float32)
    sd["post_extract_proj.bias"] = rng.randn(d[1]).astype(np.float32)
    k, cing, cout = variables["params"]["pos_conv_w"].shape
    v = rng.randn(cout, cing, k).astype(np.float32)
    sd["encoder.pos_conv.0.weight_v"] = v
    sd["encoder.pos_conv.0.weight_g"] = np.sqrt(
        (v ** 2).sum(axis=(0, 1), keepdims=True)).astype(np.float32)
    sd["encoder.pos_conv.0.bias"] = rng.randn(cout).astype(np.float32)
    sd["encoder.layer_norm.weight"] = np.ones(cout, np.float32)
    sd["encoder.layer_norm.bias"] = np.zeros(cout, np.float32)
    for i in range(3):
        pl = f"encoder.layers.{i}"
        for proj in ("k_proj", "q_proj", "v_proj", "out_proj"):
            sd[f"{pl}.self_attn.{proj}.weight"] = rng.randn(cout, cout).astype(np.float32)
            sd[f"{pl}.self_attn.{proj}.bias"] = rng.randn(cout).astype(np.float32)
        for ln in ("self_attn_layer_norm", "final_layer_norm"):
            sd[f"{pl}.{ln}.weight"] = np.ones(cout, np.float32)
            sd[f"{pl}.{ln}.bias"] = np.zeros(cout, np.float32)
        sd[f"{pl}.fc1.weight"] = rng.randn(64, cout).astype(np.float32)
        sd[f"{pl}.fc1.bias"] = rng.randn(64).astype(np.float32)
        sd[f"{pl}.fc2.weight"] = rng.randn(cout, 64).astype(np.float32)
        sd[f"{pl}.fc2.bias"] = rng.randn(cout).astype(np.float32)

    pt = tmp_path / "hubert.pt"
    torch.save({"model": {k2: torch.tensor(v2) for k2, v2 in sd.items()}}, pt)
    imported = import_hubert(str(pt))

    init_paths = {jax.tree_util.keystr(p2)
                  for p2, _ in jax.tree_util.tree_flatten_with_path(variables)[0]}
    imp_paths = {jax.tree_util.keystr(p2)
                 for p2, _ in jax.tree_util.tree_flatten_with_path(imported)[0]}
    assert init_paths == imp_paths, (
        f"missing: {init_paths - imp_paths}\nextra: {imp_paths - init_paths}")
    # weight-norm fold equals the raw v (g chosen as ||v||)
    np.testing.assert_allclose(np.asarray(imported["params"]["pos_conv_w"]),
                               v.transpose(2, 1, 0), rtol=1e-5)
    feats = model.apply(imported, jnp.asarray(
        np.random.RandomState(1).randn(1, 3200).astype(np.float32) * 0.1),
        output_layer=3)
    assert np.isfinite(np.asarray(feats)).all()


def test_wav2vec2_ctc_asr_fn():
    from streamspeech_tpu.models.wav2vec2_ctc import (
        Wav2Vec2CTC,
        make_wav2vec2_asr_fn,
    )

    model = Wav2Vec2CTC(vocab_size=8, embed_dim=32, ffn_dim=64, heads=2,
                        num_layers=2)
    wav = jnp.zeros((1, 3200))
    variables = model.init(jax.random.PRNGKey(0), wav)
    em = model.apply(variables, wav)
    assert em.shape[-1] == 8
    letters = ["<blank>", "|", "a", "b", "c", "d", "e", "f"]
    asr_fn = make_wav2vec2_asr_fn(model, variables, letters)
    text = asr_fn(np.random.RandomState(0).randn(3200).astype(np.float32) * 0.1)
    assert isinstance(text, str)
