"""Transformer stacks: T2U encoder, first-pass MT decoder, NAR unit-CTC decoder, CTC heads.

Behavioral references:
- T2U encoder: `researches/ctc_unity/modules/transformer_encoder.py:15-112`
  (UniTransformerEncoderNoEmb — pre-norm fairseq encoder layers, causal mask when
  unidirectional, final LN).
- MT decoder: `researches/ctc_unity/modules/transformer_decoder.py:39-419`
  (post-norm fairseq decoder layers, sinusoidal positions, streaming mask applied to
  CROSS-attention only; the layer routes `extra` into encoder_attn —
  `researches/ctc_unity/modules/transformer_layer.py:516`).
- NAR unit decoder: `researches/ctc_unity/modules/ctc_transformer_unit_decoder.py:25-267`
  (×upsample repeat of T2U states, pre-norm layers, causal self-attn, wait-k
  cross-attn mask, CTC projection; positional-embedding quirk documented below).
- CTC heads: `fairseq/fairseq/models/speech_to_speech/modules/ctc_decoder.py:11`.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from streamspeech_tpu.config import DecoderConfig, UnitDecoderConfig
from streamspeech_tpu.ops.masks import causal_allowed, waitk_allowed
from streamspeech_tpu.ops.pos_encoding import sinusoidal_embedding
from streamspeech_tpu.models.layers import LayerNorm, KVCache, MultiHeadAttention

PAD = 1  # fairseq padding index


def fairseq_positions(tokens: jnp.ndarray, padding_idx: int = PAD) -> jnp.ndarray:
    """Position ids à la `fairseq/fairseq/utils.py:256-266`: non-pad tokens get
    padding_idx + their 1-based position among non-pads; pads get padding_idx."""
    mask = (tokens != padding_idx).astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + padding_idx


def token_embedding_init(rng, shape, dtype=jnp.float32):
    """fairseq Embedding init: N(0, d^-0.5), padding row zeroed."""
    emb = jax.random.normal(rng, shape, dtype) * (shape[1] ** -0.5)
    return emb.at[PAD].set(0.0)


def pack_units(units: jnp.ndarray, n_frames_per_step: int, vocab_size: int,
               offset: int = 4) -> jnp.ndarray:
    """Pack n consecutive unit ids into one base-V token id
    (`fairseq/fairseq/data/audio/speech_to_speech_dataset.py:88-104`):
    packed = offset + Σ_i (u_i - offset) · V^(n-1-i) over each group of n
    units — the FIRST unit of a group is the most-significant digit
    (speech_to_speech_dataset.py:96 `scale = V^(n-1-i)`), matching what
    StackedEmbedding's digit unpack reconstructs in original order.
    units: [..., T] with T divisible by n (pad/truncate beforehand)."""
    if n_frames_per_step <= 1:
        return units
    t = units.shape[-1]
    g = units.reshape(units.shape[:-1] + (t // n_frames_per_step,
                                          n_frames_per_step)) - offset
    scale = vocab_size ** jnp.arange(n_frames_per_step - 1, -1, -1,
                                     dtype=units.dtype)
    return jnp.sum(g * scale, axis=-1) + offset


def unpack_units(packed: jnp.ndarray, n_frames_per_step: int, vocab_size: int,
                 offset: int = 4) -> jnp.ndarray:
    """Inverse of pack_units: packed [..., T] → raw units [..., T*n] in
    original temporal order (the decode-side step before vocoding — the
    reference unpacks via StackedEmbedding's digit expansion,
    `modules/stacked_embedding.py:31-47`). Ids below `offset` (specials)
    are passed through in every slot, like StackedEmbedding's mask."""
    if n_frames_per_step <= 1:
        return packed
    v = jnp.asarray(vocab_size, packed.dtype)
    mask = packed >= offset
    x = packed - offset
    digits = []
    for i in range(n_frames_per_step - 1, -1, -1):
        d = (x // (v ** i)) % v
        digits.append(jnp.where(mask, d + offset, packed))
    return jnp.stack(digits, axis=-1).reshape(
        packed.shape[:-1] + (packed.shape[-1] * n_frames_per_step,))


class StackedEmbedding(nn.Module):
    """Embeds packed stacked-unit tokens
    (`fairseq/fairseq/models/speech_to_speech/modules/stacked_embedding.py:12`):
    the packed id's base-V digits are embedded individually, concatenated and
    projected back to embed_dim. num_stacked == 1 degenerates to a plain table."""

    num_embeddings: int
    embed_dim: int
    num_stacked: int = 1
    offset: int = 4
    dtype: Any = jnp.float32

    def setup(self):
        self.weight = self.param("embedding", token_embedding_init,
                                 (self.num_embeddings, self.embed_dim))
        if self.num_stacked > 1:
            self.project_in_dim = nn.Dense(self.embed_dim, use_bias=False,
                                           dtype=self.dtype,
                                           name="project_in_dim")

    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        table = self.weight.astype(self.dtype)
        if self.num_stacked == 1:
            return jnp.take(table, tokens, axis=0)
        v = self.num_embeddings - self.offset
        mask = tokens >= self.offset
        digits = []
        cum = jnp.zeros_like(tokens)
        for i in range(1, self.num_stacked + 1):
            div = v ** i
            nxt = jnp.remainder(tokens - self.offset - cum, div)
            cum = cum + nxt
            nxt = nxt // (div // v)
            digits.append(jnp.where(mask, nxt + self.offset, tokens))
        stacked = jnp.stack(digits[::-1], axis=-1)         # [..., n]
        emb = jnp.take(table, stacked, axis=0)             # [..., n, C]
        emb = emb.reshape(emb.shape[:-2] + (self.num_stacked * self.embed_dim,))
        return self.project_in_dim(emb)


class TransformerFFN(nn.Module):
    ffn_dim: int
    embed_dim: int
    dropout: float = 0.0
    activation_dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.ffn_dim, dtype=self.dtype, name="fc1")(x)
        x = jax.nn.relu(x)
        x = nn.Dropout(self.activation_dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="fc2")(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class TransformerEncoderLayer(nn.Module):
    """fairseq encoder layer (pre- or post-norm)."""

    embed_dim: int
    ffn_dim: int
    num_heads: int
    dropout: float = 0.0
    normalize_before: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.self_attn = MultiHeadAttention(self.embed_dim, self.num_heads,
                                            self.dropout, dtype=self.dtype,
                                            name="self_attn")
        self.self_attn_layer_norm = LayerNorm(dtype=self.dtype,
                                                 name="self_attn_layer_norm")
        self.ffn = TransformerFFN(self.ffn_dim, self.embed_dim, self.dropout,
                                  self.dropout, dtype=self.dtype, name="ffn")
        self.final_layer_norm = LayerNorm(dtype=self.dtype,
                                             name="final_layer_norm")
        self.dropout_module = nn.Dropout(self.dropout)

    def __call__(self, x, allowed=None, key_valid=None, deterministic=True,
                 cache: Optional[KVCache] = None):
        residual = x
        if self.normalize_before:
            x = self.self_attn_layer_norm(x)
        x, cache = self.self_attn(x, None, allowed, key_valid, cache, deterministic)
        x = self.dropout_module(x, deterministic=deterministic)
        x = residual + x
        if not self.normalize_before:
            x = self.self_attn_layer_norm(x)
        residual = x
        if self.normalize_before:
            x = self.final_layer_norm(x)
        x = residual + self.ffn(x, deterministic)
        if not self.normalize_before:
            x = self.final_layer_norm(x)
        return x, cache


class UniTransformerEncoder(nn.Module):
    """T2U synthesizer encoder over MT decoder states (no embeddings, pre-norm,
    causal when unidirectional). `transformer_encoder.py:15-77`."""

    embed_dim: int
    ffn_dim: int
    num_heads: int
    num_layers: int
    dropout: float = 0.0
    unidirectional: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.layers = [
            TransformerEncoderLayer(self.embed_dim, self.ffn_dim, self.num_heads,
                                    self.dropout, normalize_before=True,
                                    dtype=self.dtype, name=f"layers_{i}")
            for i in range(self.num_layers)
        ]
        self.layer_norm = LayerNorm(dtype=self.dtype, name="layer_norm")

    def __call__(self, x, key_valid=None, deterministic=True):
        t = x.shape[1]
        allowed = causal_allowed(t) if self.unidirectional else None
        for layer in self.layers:
            x, _ = layer(x, allowed, key_valid, deterministic)
        return self.layer_norm(x)

    def step(self, x_new, caches, deterministic=True):
        """Incremental: x_new [B, S, C] continues the sequence; caches is a list of
        per-layer KVCache. Exact because the stack is causal."""
        new_caches = []
        x = x_new
        for layer, cache in zip(self.layers, caches):
            x, cache = layer(x, None, None, deterministic, cache)
            new_caches.append(cache)
        return self.layer_norm(x), new_caches


class UniTransformerEncoderWithEmb(nn.Module):
    """T2U encoder over re-embedded MT OUTPUT tokens — the cascade variant's
    standalone incremental-TTS front
    (`researches/ctc_unity/modules/transformer_encoder.py:147-240`, used by
    `streamspeech_model_cascade.py:270-375` with the MT embedding table)."""

    embed_dim: int
    ffn_dim: int
    num_heads: int
    num_layers: int
    vocab_size: int
    dropout: float = 0.0
    unidirectional: bool = True
    max_positions: int = 1024
    dtype: Any = jnp.float32

    def setup(self):
        self.embed_tokens = self.param("embed_tokens", token_embedding_init,
                                       (self.vocab_size, self.embed_dim))
        self.pos_table = jnp.asarray(
            sinusoidal_embedding(self.max_positions, self.embed_dim, PAD))
        self.embed_scale = math.sqrt(self.embed_dim)
        self.layers = [
            TransformerEncoderLayer(self.embed_dim, self.ffn_dim, self.num_heads,
                                    self.dropout, normalize_before=True,
                                    dtype=self.dtype, name=f"layers_{i}")
            for i in range(self.num_layers)
        ]
        self.layer_norm = LayerNorm(dtype=self.dtype, name="layer_norm")
        self.dropout_module = nn.Dropout(self.dropout)

    def __call__(self, tokens, deterministic=True):
        positions = fairseq_positions(tokens)
        x = self.embed_scale * jnp.take(self.embed_tokens, tokens, axis=0)
        x = x + jnp.take(self.pos_table, positions, axis=0)
        x = self.dropout_module(x, deterministic=deterministic)
        key_valid = tokens != PAD
        allowed = causal_allowed(tokens.shape[1]) if self.unidirectional else None
        for layer in self.layers:
            x, _ = layer(x, allowed, key_valid, deterministic)
        return self.layer_norm(x)


class TransformerDecoderLayer(nn.Module):
    """fairseq decoder layer; `extra["streaming_mask"]` routes to cross-attention
    (`transformer_layer.py:516`), here the ``allowed_cross`` argument."""

    embed_dim: int
    ffn_dim: int
    num_heads: int
    dropout: float = 0.0
    attention_dropout: float = 0.0
    activation_dropout: float = 0.0
    normalize_before: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.self_attn = MultiHeadAttention(self.embed_dim, self.num_heads,
                                            self.attention_dropout, dtype=self.dtype,
                                            name="self_attn")
        self.self_attn_layer_norm = LayerNorm(dtype=self.dtype,
                                                 name="self_attn_layer_norm")
        self.encoder_attn = MultiHeadAttention(self.embed_dim, self.num_heads,
                                               self.attention_dropout,
                                               dtype=self.dtype, name="encoder_attn")
        self.encoder_attn_layer_norm = LayerNorm(dtype=self.dtype,
                                                    name="encoder_attn_layer_norm")
        self.ffn = TransformerFFN(self.ffn_dim, self.embed_dim, self.dropout,
                                  self.activation_dropout, dtype=self.dtype,
                                  name="ffn")
        self.final_layer_norm = LayerNorm(dtype=self.dtype,
                                             name="final_layer_norm")
        self.dropout_module = nn.Dropout(self.dropout)

    def __call__(self, x, enc, allowed_self=None, allowed_cross=None,
                 self_valid=None, enc_valid=None, deterministic=True,
                 self_cache: Optional[KVCache] = None,
                 cross_cache: Optional[KVCache] = None,
                 self_causal: bool = False):
        residual = x
        if self.normalize_before:
            x = self.self_attn_layer_norm(x)
        x, self_cache = self.self_attn(x, None, allowed_self, self_valid,
                                       self_cache, deterministic,
                                       causal=self_causal)
        x = self.dropout_module(x, deterministic=deterministic)
        x = residual + x
        if not self.normalize_before:
            x = self.self_attn_layer_norm(x)

        residual = x
        if self.normalize_before:
            x = self.encoder_attn_layer_norm(x)
        if cross_cache is not None:
            x, _ = self.encoder_attn(x, None, allowed_cross, enc_valid,
                                     cross_cache, deterministic,
                                     cache_is_cross=True)
        else:
            x, _ = self.encoder_attn(x, enc, allowed_cross, enc_valid, None,
                                     deterministic)
        x = self.dropout_module(x, deterministic=deterministic)
        x = residual + x
        if not self.normalize_before:
            x = self.encoder_attn_layer_norm(x)

        residual = x
        if self.normalize_before:
            x = self.final_layer_norm(x)
        x = residual + self.ffn(x, deterministic)
        if not self.normalize_before:
            x = self.final_layer_norm(x)
        return x, self_cache

    def fill_cross(self, enc_new: jnp.ndarray, cross_cache: KVCache) -> KVCache:
        return self.encoder_attn.fill_cross_cache(enc_new, cross_cache)


class AugTransformerDecoderLayer(nn.Module):
    """Decoder layer with DUAL cross-attention
    (`fairseq/fairseq/modules/transformer_layer_aug.py:150-265`):
    encoder_attn over the primary encoder output, encoder_attn2 over the
    auxiliary one, merged "sequential" (two residual sublayers, each with its
    own layer norm — the default) or "parallel" (averaged before the
    residual). Eval-mode dropnet ratios: sequential [1, 1], parallel
    [0.5, 0.5] (`get_dropnet_ratio`)."""

    embed_dim: int
    ffn_dim: int
    num_heads: int
    dropout: float = 0.0
    merge_type: str = "sequential"  # | "parallel"
    normalize_before: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.self_attn = MultiHeadAttention(self.embed_dim, self.num_heads,
                                            0.0, dtype=self.dtype,
                                            name="self_attn")
        self.self_attn_layer_norm = LayerNorm(dtype=self.dtype,
                                              name="self_attn_layer_norm")
        self.encoder_attn = MultiHeadAttention(self.embed_dim, self.num_heads,
                                               0.0, dtype=self.dtype,
                                               name="encoder_attn")
        self.encoder_attn_layer_norm = LayerNorm(
            dtype=self.dtype, name="encoder_attn_layer_norm")
        self.encoder_attn2 = MultiHeadAttention(self.embed_dim, self.num_heads,
                                                0.0, dtype=self.dtype,
                                                name="encoder_attn2")
        self.encoder_attn_layer_norm2 = LayerNorm(
            dtype=self.dtype, name="encoder_attn_layer_norm2")
        self.ffn = TransformerFFN(self.ffn_dim, self.embed_dim, self.dropout,
                                  0.0, dtype=self.dtype, name="ffn")
        self.final_layer_norm = LayerNorm(dtype=self.dtype,
                                          name="final_layer_norm")
        self.dropout_module = nn.Dropout(self.dropout)

    def _cross(self, attn, ln, x, enc, enc_valid, deterministic):
        residual = x
        if self.normalize_before:
            x = ln(x)
        x, _ = attn(x, enc, None, enc_valid, None, deterministic)
        x = self.dropout_module(x, deterministic=deterministic)
        return residual, x, ln

    def __call__(self, x, enc, enc_aug, allowed_self=None, self_valid=None,
                 enc_valid=None, enc_aug_valid=None, deterministic=True,
                 self_causal: bool = False):
        residual = x
        if self.normalize_before:
            x = self.self_attn_layer_norm(x)
        x, _ = self.self_attn(x, None, allowed_self, self_valid, None,
                              deterministic, causal=self_causal)
        x = self.dropout_module(x, deterministic=deterministic)
        x = residual + x
        if not self.normalize_before:
            x = self.self_attn_layer_norm(x)

        if self.merge_type == "sequential":
            residual, x, ln = self._cross(self.encoder_attn,
                                          self.encoder_attn_layer_norm,
                                          x, enc, enc_valid, deterministic)
            x = residual + x
            if not self.normalize_before:
                x = ln(x)
            residual, x, ln = self._cross(self.encoder_attn2,
                                          self.encoder_attn_layer_norm2,
                                          x, enc_aug, enc_aug_valid,
                                          deterministic)
            x = residual + x
            if not self.normalize_before:
                x = ln(x)
        else:  # parallel
            residual = x
            if self.normalize_before:
                x = self.encoder_attn_layer_norm(x)
            x1, _ = self.encoder_attn(x, enc, None, enc_valid, None,
                                      deterministic)
            x2, _ = self.encoder_attn2(x, enc_aug, None, enc_aug_valid, None,
                                       deterministic)
            x1 = self.dropout_module(x1, deterministic=deterministic)
            x2 = self.dropout_module(x2, deterministic=deterministic)
            x = residual + 0.5 * x1 + 0.5 * x2
            if not self.normalize_before:
                x = self.encoder_attn_layer_norm(x)

        residual = x
        if self.normalize_before:
            x = self.final_layer_norm(x)
        x = residual + self.ffn(x, deterministic)
        if not self.normalize_before:
            x = self.final_layer_norm(x)
        return x


class AugTransformerUnitDecoder(nn.Module):
    """AR unit decoder with augmented cross-attention over the speech encoder
    (`fairseq/fairseq/models/speech_to_speech/modules/transformer_decoder_aug.py:14-121`,
    enabled by --synthesizer-augmented-cross-attention in UnitY,
    `s2s_conformer_unity.py:258-263`: primary = speech encoder out, aug = T2U
    encoder out)."""

    cfg: DecoderConfig
    merge_type: str = "sequential"
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.embed_tokens = self.param("embed_tokens", token_embedding_init,
                                       (c.vocab_size, c.embed_dim))
        self.pos_table = jnp.asarray(
            sinusoidal_embedding(c.max_target_positions, c.embed_dim, PAD))
        self.embed_scale = 1.0 if c.no_scale_embedding else math.sqrt(c.embed_dim)
        self.layers = [
            AugTransformerDecoderLayer(
                c.embed_dim, c.ffn_embed_dim, c.attention_heads, c.dropout,
                merge_type=self.merge_type,
                normalize_before=c.normalize_before, dtype=self.dtype,
                name=f"layers_{i}")
            for i in range(c.layers)
        ]
        self.final_layer_norm = (LayerNorm(dtype=self.dtype, name="layer_norm")
                                 if c.normalize_before else None)
        self.dropout_module = nn.Dropout(c.dropout)

    def __call__(self, prev_output_tokens, enc, enc_aug, enc_valid=None,
                 enc_aug_valid=None, deterministic=True):
        s = prev_output_tokens.shape[1]
        positions = fairseq_positions(prev_output_tokens)
        x = self.embed_scale * jnp.take(self.embed_tokens,
                                        prev_output_tokens, axis=0)
        x = x + jnp.take(self.pos_table, positions, axis=0)
        x = self.dropout_module(x, deterministic=deterministic)
        self_valid = prev_output_tokens != PAD
        for layer in self.layers:
            x = layer(x, enc, enc_aug, None, self_valid, enc_valid,
                      enc_aug_valid, deterministic, self_causal=True)
        if self.final_layer_norm is not None:
            x = self.final_layer_norm(x)
        return x @ self.embed_tokens.T.astype(x.dtype), x


class TransformerDecoder(nn.Module):
    """First-pass MT text decoder (post-norm by default, matching the multitask
    decoder arch `s2s_transformer.py:582-607`)."""

    cfg: DecoderConfig
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.embed_tokens = self.param("embed_tokens", token_embedding_init,
                                       (c.vocab_size, c.embed_dim))
        self.pos_table = jnp.asarray(
            sinusoidal_embedding(c.max_target_positions, c.embed_dim, PAD))
        self.embed_scale = 1.0 if c.no_scale_embedding else math.sqrt(c.embed_dim)
        self.layers = [
            TransformerDecoderLayer(
                c.embed_dim, c.ffn_embed_dim, c.attention_heads, c.dropout,
                attention_dropout=0.0, activation_dropout=0.0,
                normalize_before=c.normalize_before, dtype=self.dtype,
                name=f"layers_{i}")
            for i in range(c.layers)
        ]
        self.final_layer_norm = (LayerNorm(dtype=self.dtype, name="layer_norm")
                                 if c.normalize_before else None)
        self.dropout_module = nn.Dropout(c.dropout)
        # BASE expert layers interleaved at the reference's insertion points
        # (fairseq inserts BaseLayer at ((i+1)*decoder_layers)//(base_layers+1)
        # into the layer list when args.base_layers > 0): base layer i runs
        # after the first `pos` transformer layers.
        if getattr(c, "base_layers", 0):
            from streamspeech_tpu.models.moe import BASELayer

            self.base_positions = [((i + 1) * c.layers) // (c.base_layers + 1)
                                   for i in range(c.base_layers)]
            self.base_layer_mods = [
                BASELayer(embed_dim=c.embed_dim, ffn_dim=c.ffn_embed_dim,
                          num_experts=c.base_num_experts, dtype=self.dtype,
                          name=f"base_layers_{i}")
                for i in range(c.base_layers)]
        else:
            self.base_positions = []
            self.base_layer_mods = []

    def _apply_base(self, x, after_n_layers: int, deterministic: bool):
        for pos, mod in zip(self.base_positions, self.base_layer_mods):
            if pos == after_n_layers:
                x = mod(x, deterministic=deterministic)
        return x

    def embed(self, tokens, positions):
        x = self.embed_scale * jnp.take(self.embed_tokens, tokens, axis=0)
        return x + jnp.take(self.pos_table, positions, axis=0)

    def output_layer(self, x):
        return x @ self.embed_tokens.T.astype(x.dtype)

    def extract_features(
        self,
        prev_output_tokens: jnp.ndarray,   # [B, S]
        enc: jnp.ndarray,                  # [B, T, Ce]
        enc_valid: Optional[jnp.ndarray] = None,
        allowed_cross: Optional[jnp.ndarray] = None,  # [B?, S, T] streaming mask
        deterministic: bool = True,
    ) -> jnp.ndarray:
        c = self.cfg
        s = prev_output_tokens.shape[1]
        positions = fairseq_positions(prev_output_tokens)
        x = self.embed(prev_output_tokens, positions)
        x = self.dropout_module(x, deterministic=deterministic)
        self_valid = prev_output_tokens != PAD
        x = self._apply_base(x, 0, deterministic)
        for j, layer in enumerate(self.layers):
            x, _ = layer(x, enc, None, allowed_cross, self_valid,
                         enc_valid, deterministic, self_causal=True)
            x = self._apply_base(x, j + 1, deterministic)
        if self.final_layer_norm is not None:
            x = self.final_layer_norm(x)
        return x

    def __call__(self, prev_output_tokens, enc, enc_valid=None,
                 allowed_cross=None, deterministic=True):
        x = self.extract_features(prev_output_tokens, enc, enc_valid,
                                  allowed_cross, deterministic)
        return self.output_layer(x), x

    def step(self, tokens_new, position_offset, self_caches, cross_caches,
             cross_valid=None, allowed_cross=None):
        """Incremental decode: tokens_new [B, S_new]; position_offset = number of
        tokens already decoded. cross_caches hold projected encoder K/V (growing
        as chunks arrive; validity from cache.index unless a per-example
        cross_valid [B, T] is given — needed for padded batched decoding).
        Returns (logits, features, self_caches')."""
        b, s = tokens_new.shape
        off = jnp.asarray(position_offset, jnp.int32)
        if off.ndim == 1:
            off = off[:, None]  # per-stream decode positions (batched serving)
        positions = PAD + 1 + off + jnp.arange(s, dtype=jnp.int32)[None]
        x = self.embed(tokens_new, jnp.broadcast_to(positions, (b, s)))
        new_self = []
        x = self._apply_base(x, 0, True)
        for j, (layer, sc, cc) in enumerate(zip(self.layers, self_caches,
                                                cross_caches)):
            x, sc = layer(x, None, None, allowed_cross, None, cross_valid,
                          True, sc, cc)
            new_self.append(sc)
            # greedy per-token routing at inference keeps the incremental
            # step identical to the offline forward (streaming exactness)
            x = self._apply_base(x, j + 1, True)
        if self.final_layer_norm is not None:
            x = self.final_layer_norm(x)
        return self.output_layer(x), x, new_self

    def fill_cross_caches(self, enc_new, cross_caches):
        return [layer.fill_cross(enc_new, cc)
                for layer, cc in zip(self.layers, cross_caches)]


def unit_decoder_positions(pos_table: jnp.ndarray, batch: int, time: int
                           ) -> jnp.ndarray:
    """Reference quirk (kept for checkpoint parity): the NAR unit decoder calls
    `embed_positions(x[:, :, 0])` on a [T', B] FLOAT tensor
    (`ctc_transformer_unit_decoder.py:178-183`), so fairseq's make_positions runs
    over the batch axis — every timestep of batch element b receives the constant
    embedding pe[padding_idx + 1 + b]. With batch 1 (inference) this is a single
    constant vector pe[2]. We reproduce exactly that."""
    idx = PAD + 1 + jnp.arange(batch, dtype=jnp.int32)
    pe = jnp.take(pos_table, idx, axis=0)  # [B, C]
    return jnp.broadcast_to(pe[:, None, :], (batch, time, pe.shape[-1]))


class CTCTransformerUnitDecoder(nn.Module):
    """NAR upsampling unit decoder: repeat each T2U state ×upsample, run pre-norm
    decoder layers with causal self-attn + wait-k cross-attn, project to unit-CTC
    logits through the shared stacked embedding."""

    cfg: UnitDecoderConfig
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.embed_tokens = self.param("embed_tokens", token_embedding_init,
                                       (c.vocab_size, c.embed_dim))
        self.pos_table = jnp.asarray(
            sinusoidal_embedding(c.max_target_positions, c.embed_dim, PAD))
        layer_cls = TransformerDecoderLayer
        if getattr(c, "remat", False):
            # backward-pass rematerialization at the hot T = mt_len×upsample
            # shape (see EncoderConfig.remat); statics = (deterministic,
            # self_causal) — python control flow inside the layer. Argnums
            # = call-site positional index + 1 (module instance in slot 0);
            # the rematted calls pass every argument positionally.
            layer_cls = nn.remat(TransformerDecoderLayer,
                                 static_argnums=(7, 10))
        self.layers = [
            layer_cls(
                c.embed_dim, c.ffn_embed_dim, c.attention_heads, c.dropout,
                attention_dropout=c.dropout, activation_dropout=c.dropout,
                normalize_before=True, dtype=self.dtype, name=f"layers_{i}")
            for i in range(c.layers)
        ]
        self.layer_norm = LayerNorm(dtype=self.dtype, name="layer_norm")
        self.dropout_module = nn.Dropout(c.dropout)
        # stacked-units output (`ctc_transformer_unit_decoder.py:40-49,95-106`)
        self.out_proj_n_frames = (
            nn.Dense(c.embed_dim * c.n_frames_per_step, use_bias=False,
                     dtype=self.dtype, name="out_proj_n_frames")
            if c.n_frames_per_step > 1 else None)

    def _unit_logits(self, x):
        c = self.cfg
        if self.out_proj_n_frames is not None:
            b, t, d = x.shape
            x = self.out_proj_n_frames(x).reshape(b, t * c.n_frames_per_step, d)
        return x @ self.embed_tokens.T.astype(x.dtype)

    def upsample(self, enc: jnp.ndarray) -> jnp.ndarray:
        """[B, T, C] → [B, T*upsample, C] (repeat each frame; `:154-159`)."""
        return jnp.repeat(enc, self.cfg.ctc_upsample_rate, axis=1)

    def __call__(
        self,
        enc: jnp.ndarray,                  # [B, T_mt, C] T2U encoder out
        enc_valid: Optional[jnp.ndarray] = None,  # [B, T_mt]
        src_wait: Optional[int] = None,    # k2
        src_step: Optional[int] = None,    # n2
        allowed_cross: Optional[jnp.ndarray] = None,  # overrides wait-k mask
        deterministic: bool = True,
        serving_positions: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (unit logits [B, T_mt*up, V], features).

        serving_positions: the positional quirk (unit_decoder_positions) gives
        batch row b the constant embedding pe[2+b]; the reference only ever
        runs inference at batch 1, i.e. pe[2]. Batched serving/generation sets
        this flag so EVERY row gets the batch-1 value pe[2] — each stream then
        matches a single-stream run exactly. Training keeps the per-row quirk
        for reference gradient parity."""
        c = self.cfg
        b, t_mt, _ = enc.shape
        x = self.upsample(enc)
        t_up = x.shape[1]
        pos = unit_decoder_positions(self.pos_table,
                                     1 if serving_positions else b, t_up)
        x = x + pos.astype(x.dtype)  # [1,T,C] broadcasts over rows when serving
        x = self.dropout_module(x, deterministic=deterministic)

        self_valid = None
        if enc_valid is not None:
            self_valid = jnp.repeat(enc_valid, c.ctc_upsample_rate, axis=1)
        if allowed_cross is None and src_step is not None:
            allowed_cross = waitk_allowed(t_up, t_mt, src_wait or 0, src_step,
                                          src_step * c.ctc_upsample_rate)
        # self-attention is pure causality at T = t_mt*upsample (the hot shape
        # of the train step — docs/training.md): declare it via self_causal so
        # the fused Pallas kernel applies; the fallback builds the identical
        # causal_allowed(t_up) mask inside MultiHeadAttention.
        for layer in self.layers:
            # all-positional call so the remat wrapper's static_argnums
            # (deterministic, self_causal) resolve
            x, _ = layer(x, enc, None, allowed_cross, self_valid,
                         enc_valid, deterministic, None, None, True)
        x = self.layer_norm(x)
        return self._unit_logits(x), x

    def step(self, enc_new, self_caches, cross_caches, deterministic=True):
        """Incremental NAR continuation: upsample only the NEW T2U states (the
        reference slices x[prev_key_length:], `:163-175`), attend self-causally over
        the cached prefix and cross over all T2U states seen so far."""
        c = self.cfg
        b, s_new, _ = enc_new.shape
        x = self.upsample(enc_new)
        t_new = x.shape[1]
        x = x + unit_decoder_positions(self.pos_table, b, t_new).astype(x.dtype)
        new_self = []
        for layer, sc, cc in zip(self.layers, self_caches, cross_caches):
            # all-positional (incl. self_causal=False) so the remat wrapper's
            # static_argnums resolve when cfg.remat is on
            x, sc = layer(x, None, None, None, None, None, True, sc, cc,
                          False)
            new_self.append(sc)
        x = self.layer_norm(x)
        return self._unit_logits(x), x, new_self

    def fill_cross_caches(self, enc_new, cross_caches):
        return [layer.fill_cross(enc_new, cc)
                for layer, cc in zip(self.layers, cross_caches)]


class CTCHead(nn.Module):
    """Linear CTC projection over encoder states
    (`fairseq/fairseq/models/speech_to_speech/modules/ctc_decoder.py:11`)."""

    vocab_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.vocab_size, dtype=self.dtype, name="proj")(x)


class CTCHeadWithEncoder(nn.Module):
    """CTC head preceded by extra transformer encoder layers — the reference's
    CTCDecoderWithTransformerLayer
    (`researches/ctc_unity/modules/ctc_decoder_with_transformer_layer.py:14`),
    selected when the multitask yaml gives the aux task encoder layers > 0."""

    vocab_size: int
    embed_dim: int
    ffn_dim: int
    num_heads: int
    num_layers: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    def setup(self):
        self.layers = [
            TransformerEncoderLayer(self.embed_dim, self.ffn_dim,
                                    self.num_heads, self.dropout,
                                    normalize_before=True, dtype=self.dtype,
                                    name=f"layers_{i}")
            for i in range(self.num_layers)
        ]
        self.layer_norm = LayerNorm(dtype=self.dtype, name="layer_norm")
        self.proj = nn.Dense(self.vocab_size, dtype=self.dtype, name="proj")

    def __call__(self, x, key_valid=None, deterministic: bool = True):
        for layer in self.layers:
            x, _ = layer(x, None, key_valid, deterministic)
        return self.proj(self.layer_norm(x))
