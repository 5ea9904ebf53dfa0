import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamspeech_tpu.config import StreamSpeechConfig
from streamspeech_tpu.models.streamspeech import StreamSpeechModel, init_params


def tiny_config() -> StreamSpeechConfig:
    cfg = StreamSpeechConfig.simul_s2st()
    cfg.encoder.layers = 2
    cfg.encoder.embed_dim = 32
    cfg.encoder.ffn_embed_dim = 64
    cfg.encoder.attention_heads = 2
    cfg.encoder.conv_channels = 64
    cfg.encoder.depthwise_conv_kernel_size = 7
    cfg.mt_decoder.layers = 2
    cfg.mt_decoder.embed_dim = 32
    cfg.mt_decoder.ffn_embed_dim = 64
    cfg.mt_decoder.attention_heads = 2
    cfg.mt_decoder.vocab_size = 30
    cfg.unit_decoder.layers = 1
    cfg.unit_decoder.embed_dim = 32
    cfg.unit_decoder.ffn_embed_dim = 64
    cfg.unit_decoder.attention_heads = 2
    cfg.unit_decoder.ctc_upsample_rate = 5
    cfg.unit_decoder.vocab_size = 25
    cfg.synthesizer_encoder_layers = 1
    cfg.source_unigram_vocab = 30
    cfg.ctc_target_unigram_vocab = 30
    return cfg


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_config()
    model = StreamSpeechModel(cfg)
    variables = init_params(model, jax.random.PRNGKey(0))
    return model, variables


def test_forward_shapes(model_and_params):
    model, variables = model_and_params
    b, t, s = 2, 64, 6
    src = jnp.asarray(np.random.RandomState(0).randn(b, t, 80), dtype=jnp.float32)
    lens = jnp.array([64, 48])
    mt = jnp.array([[0, 5, 6, 7, 8, 9], [0, 5, 6, 2, 1, 1]], dtype=jnp.int32)
    out = model.apply(variables, src, lens, mt, n2=1)
    t_enc = (t - 1) // 2 // 2 + 1  # two stride-2 convs: 64→32→16
    assert out["encoder_out"].shape == (b, 16, 32)
    assert out["asr_logits"].shape == (b, 16, 30)
    assert out["mt_logits"].shape == (b, s, 30)
    assert out["unit_logits"].shape == (b, s * 5, 25)
    assert np.asarray(out["encoder_lengths"]).tolist() == [16, 12]
    for k in ["unit_logits", "mt_logits", "asr_logits", "st_logits"]:
        assert np.isfinite(np.asarray(out[k])).all(), k


def test_forward_jit_and_offline_mode(model_and_params):
    model, variables = model_and_params
    b, t, s = 1, 32, 4
    src = jnp.zeros((b, t, 80))
    lens = jnp.array([t])
    mt = jnp.array([[0, 5, 6, 2]], dtype=jnp.int32)

    @jax.jit
    def fwd(v, src, lens, mt):
        return model.apply(v, src, lens, mt, chunk_size=None, conv_chunk_size=None,
                           streaming=False)

    out = fwd(variables, src, lens, mt)
    assert np.isfinite(np.asarray(out["unit_logits"])).all()


def test_encoder_prefix_invariance(model_and_params):
    """The load-bearing property for streaming: with chunk masks + chunk-causal
    convs, encoder outputs for a prefix do not change when more audio arrives."""
    model, variables = model_and_params
    rng = np.random.RandomState(3)
    full = jnp.asarray(rng.randn(1, 64, 80), dtype=jnp.float32)
    chunk, conv_chunk = 4, 8  # post-subsample 4 ⇔ 16 input frames

    def enc(x):
        out, lens = model.apply(variables, x, jnp.array([x.shape[1]]),
                                chunk_size=chunk, conv_chunk_size=conv_chunk,
                                method=StreamSpeechModel.encode)
        return np.asarray(out)

    e_full = enc(full)           # 64 frames → 16 encoder frames
    e_half = enc(full[:, :32])   # 32 frames → 8 encoder frames
    np.testing.assert_allclose(e_half[0], e_full[0, :8], rtol=2e-4, atol=2e-5)


def test_waitk_mask_mode_and_ctc_head_with_encoder(model_and_params):
    model, variables = model_and_params
    import jax.numpy as jnp2
    src = jnp2.zeros((1, 32, 80))
    out = model.apply(variables, src, jnp2.array([32]),
                      jnp2.array([[2, 5, 6]], dtype=jnp2.int32),
                      mt_mask_mode="waitk", k1=2, n1=1, n2=1)
    assert np.isfinite(np.asarray(out["mt_logits"])).all()

    from streamspeech_tpu.models.transformer import CTCHeadWithEncoder
    head = CTCHeadWithEncoder(vocab_size=30, embed_dim=32, ffn_dim=64,
                              num_heads=2, num_layers=2)
    x = jnp2.zeros((2, 8, 32))
    v = head.init(jax.random.PRNGKey(0), x)
    logits = head.apply(v, x)
    assert logits.shape == (2, 8, 30)


def test_bf16_forward_finite():
    import jax.numpy as jnp2

    cfg = tiny_config()
    model = StreamSpeechModel(cfg, dtype=jnp2.bfloat16)
    variables = init_params(model, jax.random.PRNGKey(0))
    src = jnp2.asarray(np.random.RandomState(0).randn(1, 32, 80), jnp2.float32)
    out = model.apply(variables, src, jnp2.array([32]),
                      jnp2.array([[2, 5, 6]], dtype=jnp2.int32), n2=1)
    # params stay fp32; activations bf16
    assert variables["params"]["encoder"]["linear"]["kernel"].dtype == jnp2.float32
    assert np.isfinite(np.asarray(out["unit_logits"], np.float32)).all()
