"""Unit HiFi-GAN vocoder with duration prediction (CodeHiFiGAN), TPU-native.

Behavioral references:
- HiFi-GAN Generator: `fairseq/fairseq/models/text_to_speech/hifigan.py:111-179`
  (conv_pre k7 → N × [leaky_relu → ConvTranspose up → mean of ResBlocks] →
  leaky_relu → conv_post k7 → tanh).
- ResBlock ("v1"): `hifigan.py:20-108` (3 × [lrelu → dilated conv → lrelu → conv] + res).
- CodeGenerator: `agent/tts/codehifigan.py:9-95` (unit embedding → VariancePredictor
  duration → repeat_interleave → Generator). Durations: round(exp(log_dur)-1),
  clamped min 1 (`:63-66`).
- VariancePredictor: `fairseq/fairseq/models/text_to_speech/fastspeech2.py:117-151`
  (conv k3 ReLU → LN → dropout → conv k3 (padding 1) ReLU → LN → dropout → linear).
- Duration-aware incremental emission: `agent/tts/vocoder.py:48-60` returns
  (wav, dur) so the agent can emit only the new tail
  (dur[-new_units:].sum() × 320 samples, `agent/...streamspeech.agent.py:743-751`).

TPU design: the duration-expansion (repeat_interleave with data-dependent length)
is done with a static-shape scatter-free gather: given per-unit durations we build
the frame→unit index map with searchsorted over the duration cumsum at a fixed
max_frames, and mask the tail. Everything stays jittable; the host only picks the
bucket size.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn

from streamspeech_tpu.models.layers import LayerNorm
import jax
import jax.numpy as jnp
import numpy as np

from streamspeech_tpu.ops.conv1d import conv1d, conv_transpose1d

LRELU_SLOPE = 0.1

# fairseq mHuBERT-layer11 km1000 CodeHiFiGAN config
# (pretrain_models/README.md → config.json of mhubert_vp_..._km1000_lj)
DEFAULT_VOCODER_CFG: Dict[str, Any] = {
    "upsample_rates": [5, 4, 4, 2, 2],            # prod = 320 samples / unit frame
    "upsample_kernel_sizes": [11, 8, 8, 4, 4],
    "upsample_initial_channel": 512,
    "resblock_kernel_sizes": [3, 7, 11],
    "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
    "num_embeddings": 1000,
    "embedding_dim": 128,
    "model_in_dim": 128,
    "dur_predictor_params": {
        "encoder_embed_dim": 128,
        "var_pred_hidden_dim": 128,
        "var_pred_kernel_size": 3,
        "var_pred_dropout": 0.5,
    },
}


def _conv_param(mod, name, k, cin, cout, use_bias=True):
    w = mod.param(f"{name}_w", nn.initializers.normal(0.01), (k, cin, cout))
    b = mod.param(f"{name}_b", nn.initializers.zeros, (cout,)) if use_bias else None
    return w, b


class ResBlock(nn.Module):
    channels: int
    kernel_size: int
    dilations: Tuple[int, ...] = (1, 3, 5)

    @nn.compact
    def __call__(self, x):
        c, k = self.channels, self.kernel_size
        for i, d in enumerate(self.dilations):
            w1, b1 = _conv_param(self, f"convs1_{i}", k, c, c)
            w2, b2 = _conv_param(self, f"convs2_{i}", k, c, c)
            xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
            xt = conv1d(xt, w1, b1, dilation=d, padding=(k * d - d) // 2)
            xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
            xt = conv1d(xt, w2, b2, dilation=1, padding=(k - 1) // 2)
            x = xt + x
        return x


class HiFiGANGenerator(nn.Module):
    cfg: Dict[str, Any]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x [B, T, model_in_dim] → wav [B, T * prod(upsample_rates)]."""
        c = self.cfg
        ch = c["upsample_initial_channel"]
        w, b = _conv_param(self, "conv_pre", 7, x.shape[-1], ch)
        x = conv1d(x, w, b, padding=3)
        n_kernels = len(c["resblock_kernel_sizes"])
        for i, (u, k) in enumerate(zip(c["upsample_rates"],
                                       c["upsample_kernel_sizes"])):
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            cin, cout = ch // (2 ** i), ch // (2 ** (i + 1))
            w, b = _conv_param(self, f"ups_{i}", k, cin, cout)
            x = conv_transpose1d(x, w, b, stride=u, padding=(k - u) // 2)
            xs = None
            for j, (rk, rd) in enumerate(zip(c["resblock_kernel_sizes"],
                                             c["resblock_dilation_sizes"])):
                r = ResBlock(cout, rk, tuple(rd),
                             name=f"resblocks_{i * n_kernels + j}")(x)
                xs = r if xs is None else xs + r
            x = xs / n_kernels
        x = jax.nn.leaky_relu(x)
        w, b = _conv_param(self, "conv_post", 7, x.shape[-1], 1)
        x = conv1d(x, w, b, padding=3)
        return jnp.tanh(x)[..., 0]


class VariancePredictor(nn.Module):
    cfg: Dict[str, Any]

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = self.cfg
        h, k = c["var_pred_hidden_dim"], c["var_pred_kernel_size"]
        w, b = _conv_param(self, "conv1", k, x.shape[-1], h)
        x = jax.nn.relu(conv1d(x, w, b, padding=(k - 1) // 2))
        x = LayerNorm(name="ln1")(x)
        x = nn.Dropout(c["var_pred_dropout"])(x, deterministic=deterministic)
        w, b = _conv_param(self, "conv2", k, h, h)
        # NOTE reference uses padding=1 for conv2 regardless of k (`fastspeech2.py:138`)
        x = jax.nn.relu(conv1d(x, w, b, padding=1))
        x = LayerNorm(name="ln2")(x)
        x = nn.Dropout(c["var_pred_dropout"])(x, deterministic=deterministic)
        return nn.Dense(1, name="proj")(x)[..., 0]  # [B, T] log-durations


def expand_by_durations(x: jnp.ndarray, dur: jnp.ndarray, max_frames: int
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Static-shape repeat_interleave: x [B, T, C], dur [B, T] int ≥ 0 →
    (expanded [B, max_frames, C], n_frames [B]). Frame f maps to the unit u with
    cumsum(dur)[u-1] <= f < cumsum(dur)[u] (searchsorted over the cumsum)."""
    csum = jnp.cumsum(dur, axis=1)  # [B, T]
    total = csum[:, -1]
    frames = jnp.arange(max_frames, dtype=jnp.int32)
    # unit index for each output frame: number of cumsum entries <= f
    idx = jnp.sum(frames[None, :, None] >= csum[:, None, :], axis=-1)  # [B, F]
    idx = jnp.minimum(idx, x.shape[1] - 1)
    out = jnp.take_along_axis(x, idx[..., None], axis=1)
    valid = frames[None, :] < total[:, None]
    return out * valid[..., None].astype(x.dtype), total


def expand_window_by_durations(x: jnp.ndarray, dur: jnp.ndarray,
                               start_frame: jnp.ndarray, window_frames: int
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Windowed repeat_interleave: materialize only output frames
    [start, start+window) of the full duration expansion. x [B, T, C],
    dur [B, T], start_frame [B] → (window [B, W, C], n_valid [B] frames of the
    window that lie before the sequence end). Streaming emission only needs the
    tail of the waveform; vocoding a bounded window (plus receptive-field
    context) instead of the whole prefix makes emission O(new) not O(total)."""
    csum = jnp.cumsum(dur, axis=1)                       # [B, T]
    total = csum[:, -1]
    frames = start_frame[:, None] + jnp.arange(window_frames)[None, :]  # [B, W]
    idx = jnp.sum(frames[:, :, None] >= csum[:, None, :], axis=-1)
    idx = jnp.minimum(idx, x.shape[1] - 1)
    out = jnp.take_along_axis(x, idx[..., None], axis=1)
    valid = frames < total[:, None]
    return out * valid[..., None].astype(x.dtype), \
        jnp.maximum(total - start_frame, 0)


class CodeGenerator(nn.Module):
    """Unit-code vocoder = embedding + duration predictor + HiFi-GAN."""

    cfg: Dict[str, Any]

    def setup(self):
        c = self.cfg
        self.dict_emb = nn.Embed(c["num_embeddings"], c["embedding_dim"],
                                 name="dict")
        self.dur_predictor = (VariancePredictor(c["dur_predictor_params"],
                                                name="dur_predictor")
                              if c.get("dur_predictor_params") else None)
        self.generator = HiFiGANGenerator(c, name="generator")

    def vocode_window(self, code: jnp.ndarray, dur: jnp.ndarray,
                      start_frame: jnp.ndarray, window_frames: int
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Vocode only expanded frames [start, start+window) of the duration
        expansion of `code` — O(window) generator compute for tail emission.
        Returns (wav [B, window*320], n_valid_frames [B])."""
        x = self.dict_emb(code)
        win, n_valid = expand_window_by_durations(x, dur, start_frame,
                                                  window_frames)
        return self.generator(win), n_valid

    def predict_durations(self, code: jnp.ndarray) -> jnp.ndarray:
        """code [B, T] → int durations [B, T]: clamp(round(exp(log_dur) - 1), 1)."""
        x = self.dict_emb(code)
        log_dur = self.dur_predictor(x, deterministic=True)
        return jnp.maximum(jnp.round(jnp.exp(log_dur) - 1.0), 1.0).astype(jnp.int32)

    def __call__(self, code: jnp.ndarray, dur: Optional[jnp.ndarray] = None,
                 max_frames: Optional[int] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """code [B, T] unit ids (0-based, vocoder-local — the framework maps
        dictionary ids to raw units before calling). If dur is None and a duration
        predictor exists, durations are predicted (dur_prediction=True path of
        `codehifigan.py:58-66`); otherwise each unit takes 1 frame.

        Returns (wav [B, max_frames*320], n_samples [B], dur [B, T]).
        """
        x = self.dict_emb(code)
        if dur is None:
            if self.dur_predictor is not None:
                log_dur = self.dur_predictor(x, deterministic=True)
                dur = jnp.maximum(jnp.round(jnp.exp(log_dur) - 1.0), 1.0
                                  ).astype(jnp.int32)
            else:
                dur = jnp.ones(code.shape, dtype=jnp.int32)
        if max_frames is None:
            max_frames = int(code.shape[1])
        x, n_frames = expand_by_durations(x, dur, max_frames)
        wav = self.generator(x)
        upsample = int(np.prod(self.cfg["upsample_rates"]))
        return wav, n_frames * upsample, dur
