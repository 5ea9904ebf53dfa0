"""HuBERT encoder (wav2vec2-style) for target-unit extraction — JAX port.

The reference preprocess pipeline extracts mHuBERT layer-11 features and
quantizes them with km-1000 (`preprocess_scripts/*`, SURVEY §2.8; checkpoint
`mhubert_base_vp_en_es_fr_it3.pt`). This module implements the Base
architecture natively so unit extraction runs on TPU:

  wav → conv feature extractor (7 layers, ×320 downsample, GroupNorm on layer 0,
  GELU) → LayerNorm → proj 512→768 → (+ grouped pos-conv k=128 g=16, GELU) →
  LayerNorm → 12 post-norm transformer layers → features from layer N.

Weights import from the released fairseq checkpoint via
train/checkpoint.import_hubert (structure-tested against a synthetic state dict;
the real checkpoint is a drop-in at `pretrain_models/mHuBERT/...`).
"""

from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from streamspeech_tpu.models.layers import LayerNorm, MultiHeadAttention
from streamspeech_tpu.ops.conv1d import conv1d

# wav2vec2/HuBERT Base conv feature extractor spec: (dim, kernel, stride)
BASE_CONV_LAYERS: Tuple[Tuple[int, int, int], ...] = (
    (512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2), (512, 3, 2),
    (512, 2, 2), (512, 2, 2))


class HubertFeatureExtractor(nn.Module):
    conv_layers: Tuple[Tuple[int, int, int], ...] = BASE_CONV_LAYERS
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        """wav [B, N] → [B, T, 512] (T = N // 320 for base)."""
        x = wav[:, :, None]
        in_ch = 1
        for i, (dim, k, s) in enumerate(self.conv_layers):
            w = self.param(f"conv{i}_w", nn.initializers.lecun_normal(),
                           (k, in_ch, dim))
            x = conv1d(x, w.astype(self.dtype), None, stride=s)
            if i == 0:
                x = nn.GroupNorm(num_groups=dim, epsilon=1e-5,
                                 dtype=self.dtype, name="group_norm")(x)
            x = jax.nn.gelu(x, approximate=False)
            in_ch = dim
        return x


class HubertEncoderLayer(nn.Module):
    """Post-norm transformer layer (wav2vec2 Base: layer_norm_first=False)."""

    embed_dim: int = 768
    ffn_dim: int = 3072
    heads: int = 12
    dtype: Any = jnp.float32

    def setup(self):
        self.self_attn = MultiHeadAttention(self.embed_dim, self.heads,
                                            dtype=self.dtype, name="self_attn")
        self.self_attn_layer_norm = LayerNorm(dtype=self.dtype,
                                                 name="self_attn_layer_norm")
        self.fc1 = nn.Dense(self.ffn_dim, dtype=self.dtype, name="fc1")
        self.fc2 = nn.Dense(self.embed_dim, dtype=self.dtype, name="fc2")
        self.final_layer_norm = LayerNorm(dtype=self.dtype,
                                             name="final_layer_norm")

    def __call__(self, x, key_valid=None):
        residual = x
        x, _ = self.self_attn(x, None, None, key_valid)
        x = self.self_attn_layer_norm(residual + x)
        residual = x
        x = self.fc2(jax.nn.gelu(self.fc1(x), approximate=False))
        return self.final_layer_norm(residual + x)


class HubertModel(nn.Module):
    embed_dim: int = 768
    ffn_dim: int = 3072
    heads: int = 12
    num_layers: int = 12
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    dtype: Any = jnp.float32

    def setup(self):
        self.feature_extractor = HubertFeatureExtractor(dtype=self.dtype,
                                                        name="feature_extractor")
        self.layer_norm_extract = LayerNorm(dtype=self.dtype,
                                               name="layer_norm_extract")
        self.post_extract_proj = nn.Dense(self.embed_dim, dtype=self.dtype,
                                          name="post_extract_proj")
        self.pos_conv_w = self.param(
            "pos_conv_w", nn.initializers.normal(0.02),
            (self.pos_conv_kernel, self.embed_dim // self.pos_conv_groups,
             self.embed_dim))
        self.pos_conv_b = self.param("pos_conv_b", nn.initializers.zeros,
                                     (self.embed_dim,))
        self.encoder_layer_norm = LayerNorm(dtype=self.dtype,
                                               name="encoder_layer_norm")
        self.layers = [HubertEncoderLayer(self.embed_dim, self.ffn_dim,
                                          self.heads, dtype=self.dtype,
                                          name=f"layers_{i}")
                       for i in range(self.num_layers)]

    def extract_features(self, wav: jnp.ndarray, output_layer: int = 11
                         ) -> jnp.ndarray:
        """wav [B, N] float in [-1, 1] → features after encoder layer
        `output_layer` (1-based like fairseq's --layer; 11 for mHuBERT km1000).
        """
        x = self.feature_extractor(wav)
        x = self.layer_norm_extract(x)
        x = self.post_extract_proj(x)

        # positional conv: padding 64 then trim one (even-kernel SAME trick)
        pos = conv1d(x, self.pos_conv_w.astype(self.dtype), self.pos_conv_b,
                     padding=self.pos_conv_kernel // 2,
                     groups=self.pos_conv_groups)
        pos = jax.nn.gelu(pos[:, : x.shape[1]], approximate=False)
        x = x + pos
        x = self.encoder_layer_norm(x)

        for layer in self.layers[:output_layer]:
            x = layer(x)
        return x

    def __call__(self, wav, output_layer: int = 11):
        # NOTE: initialize with output_layer = num_layers so ALL layer params
        # are created; shallower output_layer values at apply-time are fine.
        return self.extract_features(wav, output_layer)
