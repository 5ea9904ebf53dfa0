"""Chunk-based Conformer speech encoder (TPU-native rebuild).

Behavioral reference: `researches/chunk_unity/models/s2t_conformer.py:37-213` +
`researches/chunk_unity/modules/{convolution.py,conformer_layer.py}`:

  fbank [B, T, 80] → Conv1dSubsampler (2 × stride-2 chunk-causal conv + GLU, ×4
  downsample) → ×sqrt(d) → rel-pos table → Linear → dropout → N conformer layers
  (FFN·½ → rel-pos MHSA with chunk mask → conv module (chunk-causal depthwise,
  BatchNorm, swish) → FFN·½ → final LN).

Differences from the reference (deliberate, TPU-first):
- batch-first layout, static shapes, boolean `allowed` masks;
- chunk sizes are __call__ arguments (the reference mutates module attributes at
  runtime, `agent/speech_to_speech.streamspeech.agent.py:395-413`; here they are
  jit-static args so each (chunk, conv_chunk) pair is one compiled program);
- incremental encoding via KV/conv caches lives in runtime/streaming.py; the chunk
  attention mask makes prefix outputs invariant so both paths agree exactly.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from streamspeech_tpu.config import EncoderConfig
from streamspeech_tpu.ops.masks import chunk_allowed, lengths_to_mask
from streamspeech_tpu.ops.pos_encoding import rel_pos_encoding
from streamspeech_tpu.models.layers import (
    ChunkCausalConv,
    ConvolutionModule,
    FeedForward,
    RelPosMultiHeadAttention,
    MultiHeadAttention,
)


class Conv1dSubsampler(nn.Module):
    """2 × (chunk-causal conv stride 2 + GLU): 80 → conv_channels/2 → embed_dim.

    Channel plan mirrors `chunk_unity/modules/convolution.py:36-60`: layer i < last
    outputs conv_channels (GLU → /2); last layer outputs 2*embed_dim (GLU → embed_dim).
    """

    cfg: EncoderConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, conv_chunk_size: Optional[int]):
        c = self.cfg
        n = len(c.conv_kernel_sizes)
        in_ch = c.input_feat_per_channel * c.input_channels
        for i, k in enumerate(c.conv_kernel_sizes):
            out_ch = c.conv_channels if i < n - 1 else c.embed_dim * 2
            x = ChunkCausalConv(in_ch, out_ch, k, stride=2, use_bias=True,
                               dtype=self.dtype, name=f"conv_{i}")(x, conv_chunk_size)
            a, g = jnp.split(x, 2, axis=-1)
            x = a * jax.nn.sigmoid(g)
            in_ch = out_ch // 2
        return x

    @staticmethod
    def out_length(in_length):
        """((L - 1) / 2 + 1) floor, twice (`convolution.py:77-81`)."""
        out = in_length
        for _ in range(2):
            out = (out - 1) // 2 + 1
        return out


class ConformerLayer(nn.Module):
    """`chunk_unity/modules/conformer_layer.py:167-312` (rel_pos espnet attention)."""

    cfg: EncoderConfig
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.ffn1 = FeedForward(c.embed_dim, c.ffn_embed_dim, c.dropout,
                                dtype=self.dtype, name="ffn1")
        self.self_attn_layer_norm = nn.LayerNorm(dtype=self.dtype,
                                                 name="self_attn_layer_norm")
        self.self_attn_dropout = nn.Dropout(c.dropout)
        if c.pos_enc_type == "rel_pos":
            self.self_attn = RelPosMultiHeadAttention(
                c.embed_dim, c.attention_heads, c.dropout, dtype=self.dtype,
                name="self_attn")
        else:
            self.self_attn = MultiHeadAttention(
                c.embed_dim, c.attention_heads, c.dropout, dtype=self.dtype,
                name="self_attn")
        self.conv_module = ConvolutionModule(
            c.embed_dim, c.depthwise_conv_kernel_size, c.dropout, dtype=self.dtype,
            name="conv_module")
        self.ffn2 = FeedForward(c.embed_dim, c.ffn_embed_dim, c.dropout,
                                dtype=self.dtype, name="ffn2")
        self.final_layer_norm = nn.LayerNorm(dtype=self.dtype,
                                             name="final_layer_norm")

    def __call__(self, x, pos_emb, allowed, key_valid, conv_chunk_size,
                 deterministic: bool = True, use_running_stats: bool = True,
                 cache=None, q_offset: int = 0):
        residual = x
        x = residual + 0.5 * self.ffn1(x, deterministic)
        residual = x
        x = self.self_attn_layer_norm(x)
        if isinstance(self.self_attn, RelPosMultiHeadAttention):
            x, cache = self.self_attn(x, pos_emb, allowed, key_valid, cache,
                                      q_offset, deterministic)
        else:
            x, cache = self.self_attn(x, None, allowed, key_valid, cache,
                                      deterministic)
        x = self.self_attn_dropout(x, deterministic=deterministic)
        x = residual + x
        residual = x
        x = residual + self.conv_module(x, conv_chunk_size, deterministic,
                                        use_running_stats)
        residual = x
        x = residual + 0.5 * self.ffn2(x, deterministic)
        return self.final_layer_norm(x), cache


class ChunkConformerEncoder(nn.Module):
    """Full encoder. __call__ = offline/teacher-forcing path (whole utterance)."""

    cfg: EncoderConfig
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.subsample = Conv1dSubsampler(c, dtype=self.dtype, name="subsample")
        self.linear = nn.Dense(c.embed_dim, dtype=self.dtype, name="linear")
        self.layers = [ConformerLayer(c, dtype=self.dtype, name=f"layers_{i}")
                       for i in range(c.layers)]
        self.embed_scale = 1.0 if c.no_scale_embedding else math.sqrt(c.embed_dim)
        self.dropout_module = nn.Dropout(c.dropout)
        # rel-pos table buffer (constant, not a parameter)
        self.max_rel = c.max_source_positions

    def __call__(
        self,
        src_tokens: jnp.ndarray,     # [B, T, 80] fbank (already CMVN'd)
        src_lengths: jnp.ndarray,    # [B]
        chunk_size: Optional[int] = None,       # attention chunk (post-subsample)
        conv_chunk_size: Optional[int] = None,  # conv chunk (reference forces 8/16)
        deterministic: bool = True,
        use_running_stats: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (encoder_out [B, T', C], out_lengths [B])."""
        c = self.cfg
        x = self.subsample(src_tokens, conv_chunk_size)
        out_lengths = Conv1dSubsampler.out_length(src_lengths)
        t = x.shape[1]
        x = x * self.embed_scale

        pos_emb = None
        if c.pos_enc_type == "rel_pos":
            pos_emb = jnp.asarray(rel_pos_encoding(t, c.embed_dim),
                                  dtype=self.dtype)

        x = self.linear(x)
        x = self.dropout_module(x, deterministic=deterministic)

        allowed = None
        if chunk_size is not None and chunk_size < 999:
            allowed = chunk_allowed(t, chunk_size)
        elif c.unidirectional and chunk_size is not None:
            # chunk >= 999 with a unidirectional flag still means full context in
            # the reference (multichunk eval sets chunk=99999 → no mask)
            allowed = None
        key_valid = lengths_to_mask(out_lengths, t)

        for layer in self.layers:
            x, _ = layer(x, pos_emb, allowed, key_valid, conv_chunk_size,
                         deterministic, use_running_stats)
        return x, out_lengths
