import numpy as np
import jax.numpy as jnp

from streamspeech_tpu.ops.fbank import (
    OnlineFbank,
    kaldi_mel_banks,
    logmelfbank,
    num_frames,
    povey_window,
)


def test_num_frames_snip_edges():
    assert num_frames(400) == 1
    assert num_frames(399) == 0
    assert num_frames(560) == 2
    assert num_frames(16000) == 98


def test_povey_window():
    w = povey_window(400)
    assert w.shape == (400,)
    assert abs(w[0]) < 1e-6 and abs(w[-1]) < 1e-6
    assert w.max() <= 1.0 + 1e-6
    # symmetric
    np.testing.assert_allclose(w, w[::-1], rtol=1e-5)


def test_mel_banks_partition():
    banks = kaldi_mel_banks(80, 512, 16000)
    assert banks.shape == (80, 256)
    assert (banks >= 0).all()
    # every filter has support, neighbouring filters overlap
    assert (banks.sum(axis=1) > 0).all()


def test_fbank_shapes_and_finite():
    rng = np.random.RandomState(0)
    wav = rng.uniform(-0.5, 0.5, size=16000).astype(np.float32)
    feats = np.asarray(logmelfbank(jnp.asarray(wav)))
    assert feats.shape == (98, 80)
    assert np.isfinite(feats).all()
    # silence → log floor
    sil = np.asarray(logmelfbank(jnp.zeros(16000)))
    assert np.allclose(sil, np.log(1.1920929e-07), atol=1e-3)


def test_fbank_tone_peak_location():
    # 1 kHz tone should peak in the mel bin whose center is nearest 1 kHz
    t = np.arange(16000) / 16000.0
    wav = 0.5 * np.sin(2 * np.pi * 1000.0 * t)
    feats = np.asarray(logmelfbank(jnp.asarray(wav)))
    mean_spec = feats.mean(axis=0)
    banks = kaldi_mel_banks(80, 512, 16000)
    centers = (banks * np.arange(256) * (16000 / 512)).sum(1) / banks.sum(1)
    peak_bin = int(mean_spec.argmax())
    assert abs(centers[peak_bin] - 1000.0) < 120.0


def test_online_fbank_matches_offline():
    rng = np.random.RandomState(1)
    wav = rng.uniform(-0.5, 0.5, size=16000 * 2).astype(np.float32)
    offline = np.asarray(logmelfbank(jnp.asarray(wav)))

    online = OnlineFbank()
    chunks = np.split(wav, [5120, 10240, 17000, 29000])
    got = [online.push(c) for c in chunks]
    got = np.concatenate([g for g in got if g.size], axis=0)
    assert got.shape[0] >= offline.shape[0] - 1
    n = min(got.shape[0], offline.shape[0])
    np.testing.assert_allclose(got[:n], offline[:n], rtol=1e-4, atol=1e-3)
