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
- ``encode_block`` processes ONE new chunk with ring/KV caches instead of the
  reference's full re-encode per policy call (`agent/...agent.py:433` — O(T²) per
  utterance there). The chunk attention mask makes prefix outputs invariant, so
  both paths produce identical numerics (tested in tests/test_streaming.py).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from streamspeech_tpu.config import EncoderConfig
from streamspeech_tpu.ops.masks import chunk_allowed, lengths_to_mask
from streamspeech_tpu.ops.pos_encoding import (
    rel_pos_encoding,
    sinusoidal_embedding,
)
from streamspeech_tpu.models.layers import (
    LayerNorm,
    ChunkCausalConv,
    ConvolutionModule,
    FeedForward,
    KVCache,
    MultiHeadAttention,
    RelPosMultiHeadAttention,
    RotaryMultiHeadAttention,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EncoderStreamState:
    """All device-side state for incremental encoding (static shapes).

    sub_ctx:    left-context tails for the 2 subsampler convs (input-rate frames).
    conv_ctx:   per-layer post-GLU tails for the depthwise convs.
    kv:         per-layer attention KV caches (capacity = max encoder frames).
    pos:        encoder frames emitted so far (attention absolute offset).
    """

    sub_ctx: Tuple[jnp.ndarray, ...]
    conv_ctx: Tuple[jnp.ndarray, ...]
    kv: Tuple[KVCache, ...]
    pos: jnp.ndarray


class Conv1dSubsampler(nn.Module):
    """2 × (chunk-causal conv stride 2 + GLU): 80 → conv_channels/2 → embed_dim.

    Channel plan mirrors `chunk_unity/modules/convolution.py:36-60`: layer i < last
    outputs conv_channels (GLU → /2); last layer outputs 2*embed_dim (GLU → embed_dim).
    """

    cfg: EncoderConfig
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        n = len(c.conv_kernel_sizes)
        in_ch = c.input_feat_per_channel * c.input_channels
        convs = []
        for i, k in enumerate(c.conv_kernel_sizes):
            out_ch = c.conv_channels if i < n - 1 else c.embed_dim * 2
            convs.append(ChunkCausalConv(in_ch, out_ch, k, stride=2,
                                         use_bias=True, dtype=self.dtype,
                                         name=f"conv_{i}"))
            in_ch = out_ch // 2
        self.convs = convs

    def __call__(self, x: jnp.ndarray, conv_chunk_size: Optional[int]):
        for conv in self.convs:
            x = conv(x, conv_chunk_size)
            a, g = jnp.split(x, 2, axis=-1)
            x = a * jax.nn.sigmoid(g)
        return x

    def step(self, x_block, ctxs, conv_chunk_size, valid_len=None):
        """x_block [B, Tb, F] (Tb divisible by 4); ctxs = per-conv input tails.

        valid_len (traced int, final partial block only): number of REAL frames in
        the block. Offline, the conv's internal right zero-padding feeds the next
        conv with hard zeros; a zero-padded block instead produces bias+GLU(0) ≠ 0
        at intermediate levels, so frames past ceil(valid/2) per level are zeroed
        to match the offline computation exactly.
        """
        new_ctxs = []
        for conv, ctx in zip(self.convs, ctxs):
            x_block, new_ctx = conv.step(
                jnp.concatenate([ctx, x_block], axis=1), conv_chunk_size)
            new_ctxs.append(new_ctx)
            a, g = jnp.split(x_block, 2, axis=-1)
            x_block = a * jax.nn.sigmoid(g)
            if valid_len is not None:
                valid_len = -(-valid_len // 2)  # ceil(valid / stride)
                r = jnp.arange(x_block.shape[1], dtype=jnp.int32)
                if jnp.ndim(valid_len) == 0:
                    keep = (r < valid_len)[None, :, None]
                else:  # per-example [B] (batched lockstep serving)
                    keep = (r[None, :] < valid_len[:, None])[:, :, None]
                x_block = x_block * keep.astype(x_block.dtype)
        return x_block, tuple(new_ctxs)

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
        self.self_attn_layer_norm = LayerNorm(dtype=self.dtype,
                                                 name="self_attn_layer_norm")
        self.self_attn_dropout = nn.Dropout(c.dropout)
        if c.pos_enc_type == "rel_pos":
            self.self_attn = RelPosMultiHeadAttention(
                c.embed_dim, c.attention_heads, c.dropout, dtype=self.dtype,
                name="self_attn")
        elif c.pos_enc_type == "rope":
            # `chunk_unity/modules/conformer_layer.py:213-219`
            self.self_attn = RotaryMultiHeadAttention(
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
        self.final_layer_norm = LayerNorm(dtype=self.dtype,
                                             name="final_layer_norm")

    def _attend(self, x, pos_emb, allowed, key_valid, cache, q_offset,
                deterministic):
        if isinstance(self.self_attn,
                      (RelPosMultiHeadAttention, RotaryMultiHeadAttention)):
            return self.self_attn(x, pos_emb, allowed, key_valid, cache,
                                  q_offset, deterministic)
        return self.self_attn(x, None, allowed, key_valid, cache, deterministic)

    def __call__(self, x, pos_emb, allowed, key_valid, conv_chunk_size,
                 deterministic: bool = True, use_running_stats: bool = True):
        residual = x
        x = residual + 0.5 * self.ffn1(x, deterministic)
        residual = x
        x = self.self_attn_layer_norm(x)
        x, _ = self._attend(x, pos_emb, allowed, key_valid, None, 0,
                            deterministic)
        x = self.self_attn_dropout(x, deterministic=deterministic)
        x = residual + x
        residual = x
        x = residual + self.conv_module(x, conv_chunk_size, deterministic,
                                        use_running_stats)
        residual = x
        x = residual + 0.5 * self.ffn2(x, deterministic)
        return self.final_layer_norm(x)

    def step(self, x, pos_emb, allowed, kv, conv_ctx, q_offset, conv_chunk_size,
             frame_valid=None):
        """Incremental block step (eval mode). Returns (y, kv', conv_ctx')."""
        residual = x
        x = residual + 0.5 * self.ffn1(x, True)
        residual = x
        x = self.self_attn_layer_norm(x)
        x, kv = self._attend(x, pos_emb, allowed, None, kv, q_offset, True)
        x = residual + x
        residual = x
        y, conv_ctx = self.conv_module.step(x, conv_ctx, conv_chunk_size,
                                            frame_valid)
        x = residual + y
        residual = x
        x = residual + 0.5 * self.ffn2(x, True)
        return self.final_layer_norm(x), kv, conv_ctx


class ChunkConformerEncoder(nn.Module):
    """Full encoder. __call__ = offline/teacher-forcing path (whole utterance);
    ``init_stream_state``/``encode_block`` = exact incremental path."""

    cfg: EncoderConfig
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.subsample = Conv1dSubsampler(c, dtype=self.dtype, name="subsample")
        self.linear = nn.Dense(c.embed_dim, dtype=self.dtype, name="linear")
        layer_cls = ConformerLayer
        if getattr(c, "remat", False):
            # per-layer rematerialization: only the layer INPUT is kept for
            # the backward pass; intermediates are recomputed. The step is
            # HBM-bound (docs/training.md), so the saved activation traffic
            # outweighs the recompute. statics = (conv_chunk_size,
            # deterministic, use_running_stats) — python control flow;
            # argnums = call-site positional index + 1 (the module
            # instance occupies slot 0 in flax's lifted fn).
            # Only __call__ is transformed — the streaming .step path (which
            # never differentiates) stays plain.
            layer_cls = nn.remat(ConformerLayer, static_argnums=(5, 6, 7))
        self.layers = [layer_cls(c, dtype=self.dtype, name=f"layers_{i}")
                       for i in range(c.layers)]
        self.embed_scale = 1.0 if c.no_scale_embedding else math.sqrt(c.embed_dim)
        self.dropout_module = nn.Dropout(c.dropout)
        # abs mode adds fairseq sinusoidal positions to the subsampled frames
        # BEFORE self.linear (`chunk_unity/models/s2t_conformer.py:134-137`);
        # padded frames get the padding row, matching make_positions
        self.abs_pos_table = (
            jnp.asarray(sinusoidal_embedding(
                c.max_source_positions + 2, c.embed_dim, 1))
            if c.pos_enc_type == "abs" else None)
        # speaker-embedding projection (`s2s_conformer.py:44-47`): concat the
        # target-speaker vector to every frame and project back to embed_dim
        self.spk_emb_proj = (nn.Dense(c.embed_dim, dtype=self.dtype,
                                      name="spk_emb_proj")
                             if c.speaker_embed_dim else None)

    def __call__(
        self,
        src_tokens: jnp.ndarray,     # [B, T, 80] fbank (already CMVN'd)
        src_lengths: jnp.ndarray,    # [B]
        chunk_size: Optional[int] = None,       # attention chunk (post-subsample)
        conv_chunk_size: Optional[int] = None,  # conv chunk (reference forces 8/16)
        deterministic: bool = True,
        use_running_stats: bool = True,
        tgt_speaker: Optional[jnp.ndarray] = None,  # [B, speaker_embed_dim]
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
        elif self.abs_pos_table is not None:
            valid = jnp.arange(t, dtype=jnp.int32)[None, :] < \
                out_lengths[:, None]
            rows = jnp.where(valid, 2 + jnp.arange(t, dtype=jnp.int32)[None], 1)
            x = x + jnp.take(self.abs_pos_table, rows, axis=0).astype(x.dtype)

        x = self.linear(x)
        x = self.dropout_module(x, deterministic=deterministic)

        allowed = None
        if chunk_size is not None and chunk_size < 999:
            allowed = chunk_allowed(t, chunk_size)
        key_valid = lengths_to_mask(out_lengths, t)

        for layer in self.layers:
            x = layer(x, pos_emb, allowed, key_valid, conv_chunk_size,
                      deterministic, use_running_stats)
        if self.spk_emb_proj is not None and tgt_speaker is not None:
            spk = jnp.broadcast_to(tgt_speaker[:, None, :],
                                   (x.shape[0], x.shape[1],
                                    tgt_speaker.shape[-1]))
            x = self.spk_emb_proj(jnp.concatenate([x, spk.astype(x.dtype)], -1))
        return x, out_lengths

    def pre_layers(self, src_tokens, src_lengths, conv_chunk_size=None):
        """Frontend only (subsample → scale → abs-pos → linear), i.e.
        ``__call__`` up to the layer loop — used by
        parallel/pipeline.conformer_pipeline_forward to stage the layer
        stack over a pipeline mesh axis. Eval mode (no dropout).
        Returns (x [B, T', C], out_lengths [B])."""
        c = self.cfg
        x = self.subsample(src_tokens, conv_chunk_size)
        out_lengths = Conv1dSubsampler.out_length(src_lengths)
        t = x.shape[1]
        x = x * self.embed_scale
        if c.pos_enc_type != "rel_pos" and self.abs_pos_table is not None:
            valid = jnp.arange(t, dtype=jnp.int32)[None, :] < \
                out_lengths[:, None]
            rows = jnp.where(valid, 2 + jnp.arange(t, dtype=jnp.int32)[None], 1)
            x = x + jnp.take(self.abs_pos_table, rows, axis=0).astype(x.dtype)
        x = self.linear(x)
        return x, out_lengths

    # ------------------------------------------------------------------
    # incremental path
    # ------------------------------------------------------------------

    def init_stream_state(self, batch: int, max_frames: int) -> EncoderStreamState:
        """max_frames = encoder-frame KV capacity (post-subsample)."""
        c = self.cfg
        h = c.attention_heads
        dh = c.embed_dim // h
        sub_ctx = []
        in_ch = c.input_feat_per_channel * c.input_channels
        n = len(c.conv_kernel_sizes)
        for i, k in enumerate(c.conv_kernel_sizes):
            sub_ctx.append(jnp.zeros((batch, k // 2, in_ch), self.dtype))
            out_ch = c.conv_channels if i < n - 1 else c.embed_dim * 2
            in_ch = out_ch // 2
        conv_pad = c.depthwise_conv_kernel_size // 2
        conv_ctx = tuple(jnp.zeros((batch, conv_pad, c.embed_dim), self.dtype)
                         for _ in range(c.layers))
        kv = tuple(KVCache.create(batch, max_frames, h, dh, self.dtype)
                   for _ in range(c.layers))
        return EncoderStreamState(sub_ctx=tuple(sub_ctx), conv_ctx=conv_ctx,
                                  kv=kv, pos=jnp.zeros((), jnp.int32))

    def encode_block(
        self,
        block: jnp.ndarray,            # [B, Tb, 80], Tb = 4 * chunk frames
        state: EncoderStreamState,
        chunk_size: int,
        conv_chunk_size: int,
        valid_len=None,                # real frames in a zero-padded final block
    ) -> Tuple[jnp.ndarray, EncoderStreamState]:
        """Encode one new block (the streaming hot path; one jit program).

        Preconditions: Tb divisible by 4 and by 4*conv_chunk; the block is one or
        more whole attention chunks (chunk_size | Tb/4)."""
        c = self.cfg
        x, sub_ctx = self.subsample.step(block, state.sub_ctx, conv_chunk_size,
                                         valid_len)
        s = x.shape[1]
        x = x * self.embed_scale
        if self.abs_pos_table is not None:
            abs_i = state.pos + jnp.arange(s, dtype=jnp.int32)   # absolute
            rows = jnp.broadcast_to(2 + abs_i[None, :],
                                    (x.shape[0], s))
            if valid_len is not None and jnp.ndim(valid_len) == 1:
                end = state.pos + -(-valid_len // 4)
                rows = jnp.where(abs_i[None, :] < end[:, None], rows, 1)
            x = x + jnp.take(self.abs_pos_table, rows, axis=0).astype(x.dtype)
        x = self.linear(x)

        max_frames = state.kv[0].max_len
        pos_emb = None
        if c.pos_enc_type == "rel_pos":
            table = jnp.asarray(rel_pos_encoding(max_frames + s, c.embed_dim),
                                dtype=self.dtype)
            # slice so table[0] ↔ relative position (pos + s - 1)
            start = (max_frames + s - 1) - (state.pos + s - 1)
            pos_emb = jax.lax.dynamic_slice(
                table, (start, 0), (s + max_frames, c.embed_dim))

        # intra-block chunk mask against cached keys: query i (abs pos+i) may see
        # key j (absolute) iff j < ((pos+i)//chunk + 1)*chunk
        q_abs = state.pos + jnp.arange(s, dtype=jnp.int32)[:, None]
        j_abs = jnp.arange(max_frames, dtype=jnp.int32)[None, :]
        allowed = j_abs < (q_abs // chunk_size + 1) * chunk_size

        # Per-example valid_len ([B], batched lockstep serving): a stream whose
        # final partial block rides inside the shared full block produces
        # garbage frames after its true end WITHIN the same attention/conv
        # chunk. Mask them as attention keys and as depthwise-conv taps so each
        # stream's real frames match its single-stream encoding exactly.
        frame_valid = None
        if valid_len is not None and jnp.ndim(valid_len) == 1:
            out_valid = -(-valid_len // 4)      # two stride-2 subsample convs
            enc_end = state.pos + out_valid                      # [B] absolute
            allowed = allowed[None] & (j_abs[None] < enc_end[:, None, None])
            frame_valid = (state.pos + jnp.arange(s, dtype=jnp.int32))[None, :] \
                < enc_end[:, None]                               # [B, s]

        new_kv: List[KVCache] = []
        new_conv: List[jnp.ndarray] = []
        for layer, kv, cc in zip(self.layers, state.kv, state.conv_ctx):
            x, kv, cc = layer.step(x, pos_emb, allowed, kv, cc, state.pos,
                                   conv_chunk_size, frame_valid)
            new_kv.append(kv)
            new_conv.append(cc)
        new_state = EncoderStreamState(sub_ctx=sub_ctx, conv_ctx=tuple(new_conv),
                                       kv=tuple(new_kv), pos=state.pos + s)
        return x, new_state
