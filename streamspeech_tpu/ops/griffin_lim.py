"""Griffin-Lim mel-spectrogram inversion (jittable, static shapes).

The reference evaluates Translatotron2 spectrogram output by vocoding mels to
waveforms (`researches/translatotron/` eval path uses fairseq's TTS toolchain);
with no pretrained mel-vocoder available offline, Griffin-Lim is the standard
parameter-free synthesizer: mel power → linear magnitude via the pseudo-inverse
of the mel filterbank → iterative phase recovery (Griffin & Lim, 1984).

Matches the ops/fbank.py analysis parameters (16 kHz, 25 ms window, 10 ms hop,
kaldi mel banks) so model-predicted log-mels invert consistently.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def _frame_params(sample_rate=16000, frame_length_ms=25.0, frame_shift_ms=10.0):
    win = int(sample_rate * frame_length_ms / 1000)
    hop = int(sample_rate * frame_shift_ms / 1000)
    n_fft = 1 << (win - 1).bit_length()
    return win, hop, n_fft


def stft(x: jnp.ndarray, win: int, hop: int, n_fft: int) -> jnp.ndarray:
    """x [N] → complex [T, n_fft//2+1] (hann window, snip edges)."""
    n_frames = max(1 + (x.shape[-1] - win) // hop, 0)
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(win)[None, :]
    frames = x[idx] * jnp.hanning(win)[None, :]
    return jnp.fft.rfft(frames, n=n_fft, axis=-1)


def istft(spec: jnp.ndarray, win: int, hop: int, n_fft: int,
          length: int) -> jnp.ndarray:
    """Overlap-add inverse with hann-squared normalization."""
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)[:, :win]
    w = jnp.hanning(win)
    frames = frames * w[None, :]
    t = spec.shape[0]
    out = jnp.zeros((length + win,), jnp.float32)
    norm = jnp.zeros((length + win,), jnp.float32)
    idx = jnp.arange(t)[:, None] * hop + jnp.arange(win)[None, :]
    out = out.at[idx.reshape(-1)].add(frames.reshape(-1).astype(jnp.float32))
    norm = norm.at[idx.reshape(-1)].add(
        jnp.broadcast_to((w ** 2)[None], (t, win)).reshape(-1).astype(jnp.float32))
    return (out / jnp.maximum(norm, 1e-8))[:length]


@functools.partial(jax.jit, static_argnames=("n_iter", "sample_rate",
                                             "num_bins", "scale_to_int16"))
def griffin_lim_from_logmel(logmel: jnp.ndarray, n_iter: int = 32,
                            sample_rate: int = 16000, num_bins: int = 80,
                            scale_to_int16: bool = True) -> jnp.ndarray:
    """logmel [T, num_bins] (ops/fbank.logmelfbank convention: log of mel power
    of the int16-scaled signal) → waveform [T*hop] float32 in ~[-1, 1]."""
    from streamspeech_tpu.ops.fbank import kaldi_mel_banks

    win, hop, n_fft = _frame_params(sample_rate)
    banks = jnp.asarray(kaldi_mel_banks(num_bins, n_fft, sample_rate))  # [M, F]
    mel_power = jnp.exp(logmel.astype(jnp.float32))
    pinv = jnp.linalg.pinv(banks)                       # [F, M]
    lin_power = jnp.maximum(pinv @ mel_power.T, 0.0).T  # [T, F]
    # kaldi power spectrum excludes the Nyquist bin in the banks; pad it
    f_full = n_fft // 2 + 1
    if lin_power.shape[1] < f_full:
        lin_power = jnp.pad(lin_power,
                            ((0, 0), (0, f_full - lin_power.shape[1])))
    mag = jnp.sqrt(lin_power)

    t = logmel.shape[0]
    length = (t - 1) * hop + win

    def body(_, spec):
        wav = istft(spec, win, hop, n_fft, length)
        re = stft(wav, win, hop, n_fft)
        phase = re / jnp.maximum(jnp.abs(re), 1e-8)
        return mag * phase[:t]

    spec0 = mag * jnp.exp(2j * jnp.pi * jax.random.uniform(
        jax.random.PRNGKey(0), mag.shape))
    spec = jax.lax.fori_loop(0, n_iter, body, spec0)
    wav = istft(spec, win, hop, n_fft, length)
    if scale_to_int16:
        wav = wav / 32768.0
    return wav
