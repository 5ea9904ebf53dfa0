import jax
import jax.numpy as jnp
import numpy as np

from streamspeech_tpu.config import DecoderConfig
from streamspeech_tpu.models.diseg import (
    DiSegModel,
    diseg_loss,
    expected_speech_seg,
    seg_num_loss,
    segment_word_contrastive_loss,
)
from streamspeech_tpu.train.synthetic import tiny_config


def test_expected_speech_seg_hard_boundaries():
    # with 0/1 boundary probs the expected assignment is the exact hard one
    seg_prob = jnp.asarray([[0, 0, 1, 0, 1, 0]], jnp.float32)
    m = np.asarray(expected_speech_seg(seg_prob, 3))[0]  # [K=3, T=6]
    # frames 0-2 → segment 0 (boundary AFTER prob at frame t moves t+1 onward)
    hard = np.argmax(m, axis=0)
    assert hard.tolist() == [0, 0, 0, 1, 1, 2]
    # soft probs: rows normalized over frames
    rng = np.random.RandomState(0)
    sp = jnp.asarray(rng.uniform(0, 1, (2, 10)), jnp.float32)
    m2 = np.asarray(expected_speech_seg(sp, 4))
    assert m2.shape == (2, 4, 10)
    np.testing.assert_allclose(m2.sum(-1), 1.0, atol=1e-2)


def test_seg_num_loss_prefers_matching_count():
    # seg_prob implying ~3 boundaries should score better against count 4 than 8
    seg_prob = jnp.asarray([[0, 0, 1, 0, 0, 1, 0, 0, 1, 0, 0, 0]], jnp.float32)
    l_match = float(seg_num_loss(seg_prob, jnp.asarray([4])))
    l_off = float(seg_num_loss(seg_prob, jnp.asarray([8])))
    assert l_match < l_off


def test_diseg_model_and_loss():
    cfg = tiny_config()
    dec = DecoderConfig(embed_dim=32, ffn_embed_dim=64, layers=1,
                        attention_heads=2, vocab_size=30, dropout=0.0)
    model = DiSegModel(cfg.encoder, dec, ctc_vocab=30)
    b, t, s, w = 2, 64, 5, 4
    src = jnp.asarray(np.random.RandomState(0).randn(b, t, 80), jnp.float32)
    lens = jnp.array([64, 48])
    prev = jnp.full((b, s), 4, jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), src, lens, prev,
                           use_running_stats=False)
    out = model.apply(variables, src, lens, prev, chunk_size=8,
                      conv_chunk_size=8)
    assert out["seg_prob"].shape == (b, 16)
    assert float(out["seg_prob"][1, 12:].max()) == 0.0  # masked past length

    word_hidden = jnp.asarray(np.random.RandomState(1).randn(b, w, 32),
                              jnp.float32)
    m = diseg_loss(out, jnp.full((b, s), 5, jnp.int32), word_hidden,
                   jnp.asarray([4, 3]))
    assert np.isfinite(float(m["loss"]))
    # gradients flow into the segmentation head
    def loss_fn(p):
        o = model.apply({"params": p, "batch_stats": variables["batch_stats"]},
                        src, lens, prev, chunk_size=8, conv_chunk_size=8)
        return diseg_loss(o, jnp.full((b, s), 5, jnp.int32), word_hidden,
                          jnp.asarray([4, 3]))["loss"]
    g = jax.grad(loss_fn)(variables["params"])
    gnorm = float(jnp.linalg.norm(g["seg_head"]["kernel"]))
    assert np.isfinite(gnorm) and gnorm > 0
