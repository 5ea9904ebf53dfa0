import jax
import jax.numpy as jnp
import numpy as np

from streamspeech_tpu.models.vocoder import (
    DEFAULT_VOCODER_CFG,
    CodeGenerator,
    HiFiGANGenerator,
    expand_by_durations,
)
from streamspeech_tpu.ops.conv1d import conv1d, conv_transpose1d


def tiny_cfg():
    cfg = dict(DEFAULT_VOCODER_CFG)
    cfg["upsample_rates"] = [4, 2]
    cfg["upsample_kernel_sizes"] = [8, 4]
    cfg["upsample_initial_channel"] = 32
    cfg["resblock_kernel_sizes"] = [3]
    cfg["resblock_dilation_sizes"] = [[1, 3]]
    cfg["num_embeddings"] = 20
    cfg["embedding_dim"] = 16
    cfg["model_in_dim"] = 16
    cfg["dur_predictor_params"] = {
        "encoder_embed_dim": 16,
        "var_pred_hidden_dim": 16,
        "var_pred_kernel_size": 3,
        "var_pred_dropout": 0.5,
    }
    return cfg


def test_conv1d_matches_torch():
    import torch

    rng = np.random.RandomState(0)
    x = rng.randn(2, 20, 8).astype(np.float32)
    w = rng.randn(3, 8, 16).astype(np.float32)
    b = rng.randn(16).astype(np.float32)
    for dilation, padding, stride in [(1, 1, 1), (3, 3, 1), (1, 2, 2)]:
        mine = np.asarray(conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                                 stride=stride, dilation=dilation, padding=padding))
        ref = torch.nn.functional.conv1d(
            torch.tensor(x).transpose(1, 2), torch.tensor(w).permute(2, 1, 0),
            torch.tensor(b), stride=stride, padding=padding, dilation=dilation,
        ).transpose(1, 2).numpy()
        np.testing.assert_allclose(mine, ref, rtol=1e-4, atol=1e-5)


def test_conv_transpose1d_matches_torch():
    import torch

    rng = np.random.RandomState(1)
    x = rng.randn(2, 10, 8).astype(np.float32)
    for k, stride in [(8, 4), (4, 2), (11, 5)]:
        w = rng.randn(k, 8, 6).astype(np.float32)
        b = rng.randn(6).astype(np.float32)
        pad = (k - stride) // 2
        mine = np.asarray(conv_transpose1d(jnp.asarray(x), jnp.asarray(w),
                                           jnp.asarray(b), stride=stride,
                                           padding=pad))
        # torch ConvTranspose1d weight layout: [Cin, Cout, K]
        ref = torch.nn.functional.conv_transpose1d(
            torch.tensor(x).transpose(1, 2), torch.tensor(w).permute(1, 2, 0),
            torch.tensor(b), stride=stride, padding=pad,
        ).transpose(1, 2).numpy()
        assert mine.shape == ref.shape
        np.testing.assert_allclose(mine, ref, rtol=1e-4, atol=1e-4)


def test_expand_by_durations_matches_repeat():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 5, 3).astype(np.float32)
    dur = np.array([[1, 2, 1, 3, 1], [2, 1, 1, 1, 1]], dtype=np.int32)
    out, total = expand_by_durations(jnp.asarray(x), jnp.asarray(dur), 12)
    out, total = np.asarray(out), np.asarray(total)
    for b in range(2):
        ref = np.repeat(x[b], dur[b], axis=0)
        assert total[b] == ref.shape[0]
        np.testing.assert_allclose(out[b, : total[b]], ref, rtol=1e-6)
        assert (out[b, total[b]:] == 0).all()


def test_generator_shapes():
    cfg = tiny_cfg()
    gen = HiFiGANGenerator(cfg)
    x = jnp.zeros((1, 7, 16))
    params = gen.init(jax.random.PRNGKey(0), x)
    wav = gen.apply(params, x)
    assert wav.shape == (1, 7 * 8)  # upsample 4*2


def test_code_generator_end_to_end():
    cfg = tiny_cfg()
    m = CodeGenerator(cfg)
    code = jnp.array([[3, 4, 4, 7, 1, 9]])
    params = m.init(jax.random.PRNGKey(0), code, max_frames=24)
    wav, n_samples, dur = m.apply(params, code, max_frames=24)
    assert wav.shape == (1, 24 * 8)
    assert int(n_samples[0]) == int(dur.sum()) * 8
    assert (np.asarray(dur) >= 1).all()
    assert np.isfinite(np.asarray(wav)).all()
    # duration-aware tail emission invariant: n_samples consistent with dur sum
    d2 = m.apply(params, code, method=CodeGenerator.predict_durations)
    np.testing.assert_array_equal(np.asarray(d2), np.asarray(dur))
