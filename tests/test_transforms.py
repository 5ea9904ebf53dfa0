import jax
import jax.numpy as jnp
import numpy as np

from streamspeech_tpu.ops.cmvn import GlobalCMVN, utterance_cmvn
from streamspeech_tpu.ops.specaugment import specaugment


def test_global_cmvn(tmp_path):
    rng = np.random.RandomState(0)
    mean, std = rng.randn(80).astype(np.float32), \
        rng.uniform(0.5, 2, 80).astype(np.float32)
    np.savez(tmp_path / "gcmvn.npz", mean=mean, std=std)
    g = GlobalCMVN.from_npz(str(tmp_path / "gcmvn.npz"))
    x = rng.randn(10, 80).astype(np.float32)
    np.testing.assert_allclose(np.asarray(g(jnp.asarray(x))),
                               (x - mean) / std, rtol=1e-5)


def test_utterance_cmvn():
    x = jnp.asarray(np.random.RandomState(1).randn(50, 80) * 3 + 2, jnp.float32)
    y = np.asarray(utterance_cmvn(x))
    np.testing.assert_allclose(y.mean(0), 0.0, atol=1e-4)


def test_specaugment_masks_region():
    rng = np.random.RandomState(0)
    x = jnp.ones((100, 80))
    out = np.asarray(specaugment(jax.random.PRNGKey(0), x,
                                 jnp.asarray(100), freq_mask_f=27,
                                 time_mask_t=50))
    assert out.shape == (100, 80)
    n_zero = (out == 0).sum()
    assert 0 < n_zero < out.size  # something masked, not everything
    # fully deterministic given the key
    out2 = np.asarray(specaugment(jax.random.PRNGKey(0), x, jnp.asarray(100),
                                  freq_mask_f=27, time_mask_t=50))
    np.testing.assert_array_equal(out, out2)
