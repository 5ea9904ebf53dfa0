"""Kaldi-compliant 80-dim log-mel filterbank frontend, jittable.

Matches the reference feature pipeline (`fairseq/examples/speech_to_text/data_utils.py:73-98`
+ torchaudio.compliance.kaldi.fbank defaults): waveform scaled by 2**15, 25 ms povey
window / 10 ms shift, snip_edges, DC removal, pre-emphasis 0.97, 512-point FFT power
spectrum, kaldi mel banks (low 20 Hz, high = Nyquist, num_fft_bins excludes Nyquist),
floor at float32 epsilon, natural log.

Everything here is pure jnp with static shapes, so the whole frontend fuses into the
encoder step under jit — no host-side feature extraction in the streaming path.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1.1920928955078125e-07  # std::numeric_limits<float>::epsilon()


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def mel_scale(freq):
    return 1127.0 * np.log(1.0 + freq / 700.0)


def kaldi_mel_banks(
    num_bins: int, window_padded: int, sample_rate: int, low_freq: float = 20.0,
    high_freq: float = 0.0,
) -> np.ndarray:
    """[num_bins, num_fft_bins] triangular filters, kaldi layout (excl. Nyquist bin)."""
    nyquist = 0.5 * sample_rate
    if high_freq <= 0.0:
        high_freq = nyquist + high_freq
    num_fft_bins = window_padded // 2
    fft_bin_width = sample_rate / window_padded
    mel_low = mel_scale(low_freq)
    mel_high = mel_scale(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)
    bins = np.zeros((num_bins, num_fft_bins), dtype=np.float32)
    fft_freqs = fft_bin_width * np.arange(num_fft_bins)
    mel = mel_scale(fft_freqs)
    for m in range(num_bins):
        left = mel_low + m * mel_delta
        center = left + mel_delta
        right = center + mel_delta
        up = (mel - left) / (center - left)
        down = (right - mel) / (right - center)
        bins[m] = np.clip(np.minimum(up, down), 0.0, None)
    return bins


def povey_window(n: int) -> np.ndarray:
    a = 2.0 * math.pi / (n - 1)
    return np.power(0.5 - 0.5 * np.cos(a * np.arange(n)), 0.85).astype(np.float32)


def num_frames(num_samples: int, sample_rate: int = 16000, frame_length_ms: float = 25.0,
               frame_shift_ms: float = 10.0) -> int:
    win = int(sample_rate * frame_length_ms / 1000)
    shift = int(sample_rate * frame_shift_ms / 1000)
    if num_samples < win:
        return 0
    return 1 + (num_samples - win) // shift


@partial(jax.jit, static_argnames=("sample_rate", "num_bins", "frame_length_ms",
                                   "frame_shift_ms", "preemph", "scale_to_int16"))
def logmelfbank(
    waveform: jnp.ndarray,
    sample_rate: int = 16000,
    num_bins: int = 80,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    preemph: float = 0.97,
    scale_to_int16: bool = True,
) -> jnp.ndarray:
    """waveform [num_samples] float in [-1, 1] → [num_frames, num_bins] float32.

    num_frames is static given the static input length (snip_edges framing).
    """
    win = int(sample_rate * frame_length_ms / 1000)
    shift = int(sample_rate * frame_shift_ms / 1000)
    padded = _next_pow2(win)
    n_frames = num_frames(waveform.shape[-1], sample_rate, frame_length_ms, frame_shift_ms)
    if n_frames <= 0:
        return jnp.zeros((0, num_bins), dtype=jnp.float32)

    x = waveform.astype(jnp.float32)
    if scale_to_int16:
        x = x * 32768.0

    # Frame: [n_frames, win] — gather strided windows. A strided reshape is not
    # possible (hop < window); use a static gather which XLA turns into a cheap copy.
    starts = jnp.arange(n_frames, dtype=jnp.int32) * shift
    idx = starts[:, None] + jnp.arange(win, dtype=jnp.int32)[None, :]
    frames = x[idx]

    # remove DC offset
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    # pre-emphasis: x[i] -= p * x[i-1]; x[0] -= p * x[0]
    prev = jnp.concatenate([frames[:, :1], frames[:, :-1]], axis=-1)
    frames = frames - preemph * prev

    window = jnp.asarray(povey_window(win))
    frames = frames * window[None, :]

    frames = jnp.pad(frames, ((0, 0), (0, padded - win)))
    spec = jnp.fft.rfft(frames, axis=-1)
    power = (spec.real**2 + spec.imag**2)[:, : padded // 2]  # kaldi drops Nyquist

    banks = jnp.asarray(kaldi_mel_banks(num_bins, padded, sample_rate))
    mel = power @ banks.T
    return jnp.log(jnp.maximum(mel, _EPS))


_CPU_DEVICE = None


def _on_cpu(x: np.ndarray):
    """Commit a host array to the local cpu backend so the jitted extractor
    runs there (falls back to default placement if no cpu backend exists)."""
    global _CPU_DEVICE
    if _CPU_DEVICE is None:
        try:
            _CPU_DEVICE = jax.devices("cpu")[0]
        except Exception:
            _CPU_DEVICE = False
    if _CPU_DEVICE is False:
        return jnp.asarray(x)
    return jax.device_put(x, _CPU_DEVICE)


class OnlineFbank:
    """Incremental fbank: feed raw sample chunks, get new frames back.

    The reference agent re-extracts fbank over the WHOLE utterance each chunk
    (`agent/speech_to_speech.streamspeech.agent.py:66-88`). Since snip-edges kaldi
    framing is a pure function of sample position, incremental extraction is exact:
    we keep the (window - shift) sample overlap and emit only new frames.
    """

    def __init__(self, sample_rate: int = 16000, num_bins: int = 80,
                 frame_length_ms: float = 25.0, frame_shift_ms: float = 10.0):
        self.sample_rate = sample_rate
        self.num_bins = num_bins
        self.win = int(sample_rate * frame_length_ms / 1000)
        self.shift = int(sample_rate * frame_shift_ms / 1000)
        self.residual = np.zeros((0,), dtype=np.float32)

    def reset(self):
        self.residual = np.zeros((0,), dtype=np.float32)

    def push(self, samples: np.ndarray) -> np.ndarray:
        """samples: new raw float samples. Returns [new_frames, num_bins] (np)."""
        buf = np.concatenate([self.residual, np.asarray(samples, dtype=np.float32)])
        n = num_frames(len(buf), self.sample_rate)
        if n <= 0:
            self.residual = buf
            return np.zeros((0, self.num_bins), dtype=np.float32)
        used = n * self.shift
        # Run the jitted extractor on the LOCAL cpu backend: when the default
        # backend is a remote accelerator, the device_put + result fetch for
        # this tiny per-chunk FFT cost two ~30 ms tunnel RPCs — more than the
        # entire fused policy step (measured; CLAUDE.md RPC cost model).
        arr = buf[: used + self.win - self.shift]
        feats = np.asarray(logmelfbank(_on_cpu(arr), self.sample_rate,
                                       self.num_bins))
        self.residual = buf[used:]
        return feats
