"""Core flax building blocks: attention (abs + relative-position), FFN, convolutions.

Batch-first [B, T, C] layout throughout (the reference uses T-major fairseq layout;
batch-first maps better onto XLA fusion and keeps the lane dimension contiguous).

All attention modules take boolean ``allowed`` masks (True = may attend) and an
optional functional KV cache so the same module serves offline (full-sequence) and
incremental (chunk/token step) execution with identical numerics.

Reference behaviours implemented here:
- fairseq MultiheadAttention with additive streaming/chunk masks
  (`researches/ctc_unity/modules/multihead_attention.py:451,711-733`)
- espnet RelPositionMultiHeadedAttention with the rel-shift trick
  (`researches/uni_unity/modules/espnet_multihead_attention.py:110-209`)
- conformer FFN / convolution modules (`researches/chunk_unity/modules/conformer_layer.py`)
- ChunkCausalConv1d (`researches/chunk_unity/modules/chunk_causal_conv1d.py:13-68`)
  re-expressed as a masked-tap convolution: out[t] = sum_d w[d] * x[t*s - pad + d]
  with taps masked beyond t's chunk boundary — identical output, no unfold, and each
  tap is one MXU matmul (full conv) or one VPU FMA (depthwise).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch.nn.LayerNorm parity: flax defaults to eps=1e-6, torch (and the
# reference fairseq stack) to 1e-5. All reference-parity modules use this.
LayerNorm = functools.partial(nn.LayerNorm, epsilon=1e-5)


NEG_INF = -1e9  # large-negative instead of -inf: avoids NaN rows for fully-masked
# queries (padding targets), matching torch softmax(-inf row) → NaN avoided by the
# reference via padding-mask bookkeeping; we use -1e9 and rely on downstream masking.


def _pallas_ok(t: int, head_dim: int) -> bool:
    """Use the fused rel-pos attention kernel when on a real TPU backend and the
    shapes are worth it / tile-compatible."""
    import os

    if os.environ.get("STREAMSPEECH_DISABLE_PALLAS"):
        return False
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    return backend == "tpu" and t >= 256 and t % 128 == 0 and head_dim % 8 == 0


def _masked_pallas_ok(t: int, head_dim: int) -> bool:
    """Gate for the fused causal masked-attention kernel (pallas_attention.py
    masked_attention): unlike the rel-pos kernel, T is padded to the tile
    internally, so only a worth-it floor and a head-dim alignment apply.
    STREAMSPEECH_DISABLE_PALLAS_MASKED disables just this kernel (ablation
    knob for scripts/profile_train.py — the rel-pos encoder kernel stays)."""
    import os

    if os.environ.get("STREAMSPEECH_DISABLE_PALLAS"):
        return False
    if os.environ.get("STREAMSPEECH_DISABLE_PALLAS_MASKED"):
        return False
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    return backend == "tpu" and t >= 256 and head_dim % 8 == 0


def _bias_pallas_ok(s: int, head_dim: int) -> bool:
    """Gate for the fused arbitrary-bias attention kernel (pallas_attention.py
    bias_attention — carries the whole mask as a [B,S,T] additive bias, used
    for the unit decoder's CTC-streaming-mask cross-attention at S=1200).
    Worth it only at large query counts; STREAMSPEECH_DISABLE_PALLAS_CROSS
    disables just this kernel (profile ablation knob)."""
    import os

    if os.environ.get("STREAMSPEECH_DISABLE_PALLAS"):
        return False
    if os.environ.get("STREAMSPEECH_DISABLE_PALLAS_CROSS"):
        return False
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    return backend == "tpu" and s >= 512 and head_dim % 8 == 0


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    """Fixed-capacity KV buffer for incremental decoding (static shapes under jit).

    k, v: [B, T_max, H, Dh]; index: scalar int32 = number of valid positions.
    """

    k: jnp.ndarray
    v: jnp.ndarray
    index: jnp.ndarray

    @classmethod
    def create(cls, batch: int, max_len: int, num_heads: int, head_dim: int,
               dtype=jnp.float32, per_example_index: bool = False) -> "KVCache":
        return cls(
            k=jnp.zeros((batch, max_len, num_heads, head_dim), dtype),
            v=jnp.zeros((batch, max_len, num_heads, head_dim), dtype),
            index=jnp.zeros((batch,) if per_example_index else (), jnp.int32),
        )

    @property
    def max_len(self) -> int:
        return self.k.shape[1]

    def truncate(self, new_len: jnp.ndarray) -> "KVCache":
        """Prune the cache to ``new_len`` valid positions (whole-word KV truncation,
        `agent/speech_to_speech.streamspeech.agent.py:554-574`). Buffers are kept;
        only the index moves — stale entries are overwritten on the next append."""
        return dataclasses.replace(self, index=jnp.minimum(self.index, new_len))


def _append_kv(cache: KVCache, k_new: jnp.ndarray, v_new: jnp.ndarray
               ) -> Tuple[KVCache, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Write S new positions at cache.index; returns (cache', k_all, v_all, valid).

    cache.index may be a scalar (all batch rows aligned — the single-stream
    fast path) or per-example [B] (multi-stream serving where each stream's
    decode position differs); the per-example path vmaps the slice update and
    valid becomes [B, T_max]."""
    s = k_new.shape[1]
    if cache.index.ndim == 0:
        k = jax.lax.dynamic_update_slice(cache.k, k_new.astype(cache.k.dtype),
                                         (0, cache.index, 0, 0))
        v = jax.lax.dynamic_update_slice(cache.v, v_new.astype(cache.v.dtype),
                                         (0, cache.index, 0, 0))
        new_index = cache.index + s
        valid = jnp.arange(cache.max_len, dtype=jnp.int32) < new_index
    else:
        upd = jax.vmap(lambda buf, new, i: jax.lax.dynamic_update_slice(
            buf, new, (i, 0, 0)))
        k = upd(cache.k, k_new.astype(cache.k.dtype), cache.index)
        v = upd(cache.v, v_new.astype(cache.v.dtype), cache.index)
        new_index = cache.index + s
        valid = jnp.arange(cache.max_len, dtype=jnp.int32)[None, :] < \
            new_index[:, None]
    return dataclasses.replace(cache, k=k, v=v, index=new_index), k, v, valid


def _attend(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
            bias: Optional[jnp.ndarray], scale: float,
            dropout: Optional[nn.Dropout] = None,
            deterministic: bool = True) -> jnp.ndarray:
    """q [B,S,H,D], k/v [B,T,H,D], bias broadcastable to [B,H,S,T] → [B,S,H,D].

    Dropout (if given) applies to the attention probabilities, matching fairseq
    MHA (`multihead_attention.py:747` attn_probs = dropout(attn_weights))."""
    scores = jnp.einsum("bshd,bthd->bhst", q * scale, k,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        scores = scores + bias
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    if dropout is not None:
        probs = dropout(probs, deterministic=deterministic)
    return jnp.einsum("bhst,bthd->bshd", probs, v)


def mask_to_bias(allowed: Optional[jnp.ndarray], key_valid: Optional[jnp.ndarray] = None
                 ) -> Optional[jnp.ndarray]:
    """allowed: bool broadcastable to [B,H,S,T] (e.g. [S,T] or [B,1,S,T]);
    key_valid: [B,T] or [T] bool. Returns additive float32 bias or None."""
    bias = None
    if allowed is not None:
        a = allowed
        if a.ndim == 2:        # [S, T] shared across batch+heads
            a = a[None, None]
        elif a.ndim == 3:      # [B, S, T] per-example (e.g. streaming mask)
            a = a[:, None]
        bias = jnp.where(a, 0.0, NEG_INF).astype(jnp.float32)
    if key_valid is not None:
        kv = key_valid
        if kv.ndim == 1:
            kv = kv[None]
        b2 = jnp.where(kv[:, None, None, :], 0.0, NEG_INF).astype(jnp.float32)
        bias = b2 if bias is None else bias + b2
    return bias


class MultiHeadAttention(nn.Module):
    """fairseq-style MHA (abs positions handled outside). Self- or cross-attention."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    bias: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        d = self.embed_dim
        self.q_proj = nn.Dense(d, use_bias=self.bias, dtype=self.dtype, name="q_proj")
        self.k_proj = nn.Dense(d, use_bias=self.bias, dtype=self.dtype, name="k_proj")
        self.v_proj = nn.Dense(d, use_bias=self.bias, dtype=self.dtype, name="v_proj")
        self.out_proj = nn.Dense(d, use_bias=self.bias, dtype=self.dtype,
                                 name="out_proj")
        self.dropout_module = nn.Dropout(self.dropout)

    def __call__(
        self,
        query: jnp.ndarray,               # [B, S, C]
        key_value: Optional[jnp.ndarray] = None,  # [B, T, C]; None = self-attn
        allowed: Optional[jnp.ndarray] = None,
        key_valid: Optional[jnp.ndarray] = None,
        cache: Optional[KVCache] = None,
        deterministic: bool = True,
        cache_is_cross: bool = False,
        causal: bool = False,
    ):
        """cache semantics: for SELF-attention (cache_is_cross=False) the new
        queries' K/V are appended before attending; for CROSS-attention
        (cache_is_cross=True) the cache holds pre-projected encoder K/V (filled
        by fill_cross_cache) and is read-only here.

        ``causal=True`` (no-cache self-attention only) declares the self mask
        is pure lower-triangular causality; on TPU at worthwhile T this routes
        to the fused Pallas kernel (ops/pallas_attention.py masked_attention —
        the mask is computed in-kernel from iota, no [T,T] tensor in HBM, and
        attention-prob dropout is fused), otherwise the causal mask is built
        here and the XLA path below is numerically identical."""
        h = self.num_heads
        dh = self.embed_dim // h
        scale = dh ** -0.5
        b, s, _ = query.shape
        kv_in = query if key_value is None else key_value

        q = self.q_proj(query).reshape(b, s, h, dh)

        if cache is not None and not cache_is_cross and key_value is None:
            # incremental self-attention: append new K/V, attend over prefix
            k_new = self.k_proj(kv_in).reshape(b, s, h, dh)
            v_new = self.v_proj(kv_in).reshape(b, s, h, dh)
            cache, k, v, valid = _append_kv(cache, k_new, v_new)
            bias = mask_to_bias(allowed, valid)
            out = _attend(q, k, v, bias, scale, self.dropout_module, deterministic)
        elif cache is not None:
            # cached cross-attention: encoder K/V already in the cache (filled by
            # caller via fill_cross_cache); attend over valid prefix.
            r = jnp.arange(cache.max_len, dtype=jnp.int32)
            valid = (r < cache.index if cache.index.ndim == 0
                     else r[None, :] < cache.index[:, None])
            bias = mask_to_bias(allowed, valid if key_valid is None else key_valid)
            out = _attend(q, cache.k, cache.v, bias, scale, self.dropout_module,
                          deterministic)
        else:
            t = kv_in.shape[1]
            k = self.k_proj(kv_in).reshape(b, t, h, dh)
            v = self.v_proj(kv_in).reshape(b, t, h, dh)
            import os as _os
            pallas_train = bool(_os.environ.get("STREAMSPEECH_PALLAS_TRAIN"))
            if (causal and key_value is None and allowed is None
                    and (deterministic or pallas_train)
                    and _masked_pallas_ok(t, dh)):
                out = self._causal_pallas(q, k, v, key_valid, scale,
                                          deterministic)
                out = self.out_proj(out.reshape(b, s, self.embed_dim))
                return (out, None)
            if causal and allowed is None:
                from streamspeech_tpu.ops.masks import causal_allowed

                allowed = causal_allowed(s)
            bias = mask_to_bias(allowed, key_valid)
            # Route to the fused bias kernel only for a genuine per-query mask
            # ([*, 1, S, T], e.g. the CTC streaming mask) — a key-valid-only
            # [B, 1, 1, T] bias materializes no [S,T] tensor under XLA, so the
            # kernel buys nothing there and the shape would mis-broadcast.
            if (bias is not None and bias.shape[1] == 1 and bias.shape[-2] == s
                    and (deterministic or pallas_train)
                    and _bias_pallas_ok(s, dh)):
                out = self._bias_pallas(q, k, v, bias, scale, deterministic)
                out = self.out_proj(out.reshape(b, s, self.embed_dim))
                return (out, None)
            out = _attend(q, k, v, bias, scale, self.dropout_module, deterministic)

        out = self.out_proj(out.reshape(b, s, self.embed_dim))
        return (out, cache) if cache is not None else (out, None)

    def _causal_pallas(self, q, k, v, key_valid, scale, deterministic):
        """Fused causal self-attention via the Pallas masked_attention kernel.
        q/k/v: [B, S, H, Dh]. Pads S to the 128 tile (padded keys masked via
        the [B, T] validity bias; padded query rows are sliced off), fuses
        attention-prob dropout in training (same Bernoulli(1-p)/(1-p)
        semantics as nn.Dropout, different RNG stream — matches the rel-pos
        kernel's contract). Returns [B, S, H, Dh] in the input dtype."""
        from streamspeech_tpu.ops.pallas_attention import (
            masked_attention_trainable,
        )

        b, s, h, dh = q.shape
        t_pad = -(-s // 128) * 128
        if key_valid is None:
            kvb = jnp.zeros((b, s), jnp.float32)
        else:
            kv2 = key_valid if key_valid.ndim == 2 else jnp.broadcast_to(
                key_valid[None], (b, s))
            kvb = jnp.where(kv2, 0.0, NEG_INF).astype(jnp.float32)
        if t_pad != s:
            kvb = jnp.pad(kvb, ((0, 0), (0, t_pad - s)),
                          constant_values=NEG_INF)
            pad4 = ((0, 0), (0, t_pad - s), (0, 0), (0, 0))
            q, k, v = (jnp.pad(a, pad4) for a in (q, k, v))
        rate = 0.0 if deterministic else float(self.dropout)
        seed = None
        if rate > 0.0:
            seed = jax.random.randint(
                self.make_rng("dropout"), (1, 1), 0,
                jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
        out = masked_attention_trainable(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), kvb[:, None, :], seed, scale, True,
            128, rate)
        return out.transpose(0, 2, 1, 3)[:, :s].astype(v.dtype)

    def _bias_pallas(self, q, k, v, bias, scale, deterministic):
        """Fused arbitrary-bias cross-attention via the Pallas bias_attention
        kernel (ops/pallas_attention.py) — the unit decoder's CTC-streaming-mask
        cross-attention at S = mt_len×25 = 1200 (reference
        researches/ctc_unity/modules/transformer_decoder.py streaming mask).

        q: [B, S, H, Dh]; k/v: [B, T, H, Dh]; bias: [B|1, 1, S, T] additive
        f32 carrying the whole mask (streaming mask + key validity). Pads S
        and T to the 128 tile with NEG_INF bias (padded key columns can't be
        attended; padded query rows are sliced off), fuses attention-prob
        dropout in training (same Bernoulli(1-p)/(1-p) semantics as
        nn.Dropout, different RNG stream — the masked/rel-pos kernels'
        contract). Returns [B, S, H, Dh] in the input dtype."""
        from streamspeech_tpu.ops.pallas_attention import (
            bias_attention_trainable,
        )

        b, s, h, dh = q.shape
        t = k.shape[1]
        b3 = jnp.broadcast_to(bias[:, 0], (b, s, t)).astype(jnp.float32)
        s_pad = -(-s // 128) * 128
        t_pad = -(-t // 128) * 128
        if s_pad != s or t_pad != t:
            b3 = jnp.pad(b3, ((0, 0), (0, s_pad - s), (0, t_pad - t)),
                         constant_values=NEG_INF)
            q = jnp.pad(q, ((0, 0), (0, s_pad - s), (0, 0), (0, 0)))
            k = jnp.pad(k, ((0, 0), (0, t_pad - t), (0, 0), (0, 0)))
            v = jnp.pad(v, ((0, 0), (0, t_pad - t), (0, 0), (0, 0)))
        rate = 0.0 if deterministic else float(self.dropout)
        seed = None
        if rate > 0.0:
            seed = jax.random.randint(
                self.make_rng("dropout"), (1, 1), 0,
                jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
        out = bias_attention_trainable(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), b3, seed, scale, 128, rate)
        return out.transpose(0, 2, 1, 3)[:, :s].astype(v.dtype)

    def fill_cross_cache(self, key_value: jnp.ndarray, cache: KVCache) -> KVCache:
        """Project encoder states once and append into a cross-attention cache."""
        b, t, _ = key_value.shape
        h, dh = self.num_heads, self.embed_dim // self.num_heads
        k = self.k_proj(key_value).reshape(b, t, h, dh)
        v = self.v_proj(key_value).reshape(b, t, h, dh)
        cache, _, _, _ = _append_kv(cache, k, v)
        return cache


class RelPosMultiHeadAttention(nn.Module):
    """espnet RelPositionMultiHeadedAttention (Transformer-XL style), batch-first.

    ``pos_emb``: [R, C] relative-position table covering r = rmax ... rmin
    (descending), where for offline self-attention R = 2T-1 and rmax = T-1.
    For incremental use, pass ``q_offset`` = absolute position of the first query
    and a table covering r = (q_offset + S - 1) ... (q_offset + S - 1 - (R-1)).
    bd[i, j] is gathered at table index (rmax - (i_abs - j)).
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    def setup(self):
        d = self.embed_dim
        self.q_proj = nn.Dense(d, dtype=self.dtype, name="q_proj")
        self.k_proj = nn.Dense(d, dtype=self.dtype, name="k_proj")
        self.v_proj = nn.Dense(d, dtype=self.dtype, name="v_proj")
        self.out_proj = nn.Dense(d, dtype=self.dtype, name="out_proj")
        self.linear_pos = nn.Dense(d, use_bias=False, dtype=self.dtype,
                                   name="linear_pos")
        h, dh = self.num_heads, d // self.num_heads
        self.pos_bias_u = self.param("pos_bias_u", nn.initializers.xavier_uniform(),
                                     (h, dh))
        self.pos_bias_v = self.param("pos_bias_v", nn.initializers.xavier_uniform(),
                                     (h, dh))
        self.dropout_module = nn.Dropout(self.dropout)

    def __call__(
        self,
        x: jnp.ndarray,                   # [B, S, C] queries (and new keys)
        pos_emb: jnp.ndarray,             # [R, C]
        allowed: Optional[jnp.ndarray] = None,
        key_valid: Optional[jnp.ndarray] = None,
        cache: Optional[KVCache] = None,
        q_offset: int = 0,
        deterministic: bool = True,
    ):
        h = self.num_heads
        dh = self.embed_dim // h
        scale = dh ** -0.5
        b, s, _ = x.shape

        q = self.q_proj(x).reshape(b, s, h, dh)
        k_new = self.k_proj(x).reshape(b, s, h, dh)
        v_new = self.v_proj(x).reshape(b, s, h, dh)

        if cache is not None:
            cache, k, v, valid = _append_kv(cache, k_new, v_new)
            key_valid = valid if key_valid is None else key_valid
        else:
            k, v = k_new, v_new
        t = k.shape[1]

        p = self.linear_pos(pos_emb).reshape(-1, h, dh)  # [R, H, Dh]
        r = p.shape[0]
        rmax = q_offset + s - 1  # table index 0 ↔ relative position rmax

        q_u = q + self.pos_bias_u[None, None]
        q_v = q + self.pos_bias_v[None, None]

        # Fused Pallas path (TPU, no-cache full self-attention): ~30x faster
        # forward and ~140x faster fwd+bwd than the XLA path below at T≈1k by
        # never materializing bd_full [B,H,T,2T-1]. Eval uses it by default;
        # training uses it when STREAMSPEECH_PALLAS_TRAIN=1 — attention-prob
        # dropout is FUSED into the kernel (the mask is regenerated in the
        # backward from a scalar seed; same Bernoulli(1-p)/(1-p) semantics as
        # nn.Dropout, different RNG stream than the XLA path).
        import os as _os
        pallas_train = bool(_os.environ.get("STREAMSPEECH_PALLAS_TRAIN"))
        if (cache is None and (deterministic or pallas_train) and s == t
                and r == 2 * t - 1 and _pallas_ok(t, dh)):
            from streamspeech_tpu.ops.pallas_attention import (
                relpos_attention_trainable,
            )

            bias = mask_to_bias(allowed, key_valid)
            if bias is None:
                bias = jnp.zeros((1, 1, t, t), jnp.float32)
            bias = jnp.broadcast_to(bias, (b,) + bias.shape[1:])
            block_q = 128
            bq = min(block_q, t)
            while t % bq != 0:
                bq //= 2
            w_pad = -(-(t + bq - 1) // 128) * 128
            r_pad = (t - bq) + w_pad
            p_bhd = p.transpose(1, 0, 2)
            if p_bhd.shape[1] < r_pad:
                p_bhd = jnp.pad(p_bhd,
                                ((0, 0), (0, r_pad - p_bhd.shape[1]), (0, 0)))
            rate = 0.0 if deterministic else float(self.dropout)
            seed = None
            if rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1, 1), 0,
                    jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
            out = relpos_attention_trainable(
                q_u.transpose(0, 2, 1, 3).astype(jnp.float32),
                q_v.transpose(0, 2, 1, 3).astype(jnp.float32),
                k.transpose(0, 2, 1, 3).astype(jnp.float32),
                v.transpose(0, 2, 1, 3).astype(jnp.float32),
                p_bhd.astype(jnp.float32), bias, seed, scale, block_q, rate)
            out = out.transpose(0, 2, 1, 3).astype(x.dtype)
            out = self.out_proj(out.reshape(b, s, self.embed_dim))
            return (out, None)

        # content score (matrix a+c) and position score (matrix b+d)
        ac = jnp.einsum("bshd,bthd->bhst", q_u, k,
                        preferred_element_type=jnp.float32)
        bd_full = jnp.einsum("bshd,rhd->bhsr", q_v, p,
                             preferred_element_type=jnp.float32)
        # gather: bd[i, j] = bd_full[i, rmax - (q_offset + i - j)]
        i_idx = jnp.arange(s, dtype=jnp.int32)[:, None]
        j_idx = jnp.arange(t, dtype=jnp.int32)[None, :]
        u = rmax - (q_offset + i_idx - j_idx)
        u = jnp.clip(u, 0, r - 1)
        bd = jnp.take_along_axis(bd_full, u[None, None].repeat(h, 1), axis=-1)

        scores = (ac + bd) * scale
        bias = mask_to_bias(allowed, key_valid)
        if bias is not None:
            scores = scores + bias
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        probs = self.dropout_module(probs, deterministic=deterministic)
        out = jnp.einsum("bhst,bthd->bshd", probs, v)
        out = self.out_proj(out.reshape(b, s, self.embed_dim))
        return (out, cache) if cache is not None else (out, None)


def _rope_cos_sin(positions: jnp.ndarray, dim: int, base: float = 10000.0
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for GPT-NeoX-style rotary embedding over the FULL head
    dim (reference rotary_ndims = d_k,
    `researches/uni_unity/modules/espnet_multihead_attention.py:225`).
    positions [...,] int/float → cos, sin [..., dim] with the duplicated
    half-frequency layout of `rotary_positional_embedding.py:32`
    (emb = cat(freqs, freqs))."""
    inv_freq = 1.0 / (base ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
                ) -> jnp.ndarray:
    """x [..., D] with cos/sin broadcastable to x; rotate_half convention
    (`fairseq/fairseq/modules/rotary_positional_embedding.py:38-50`)."""
    d2 = x.shape[-1] // 2
    rotated = jnp.concatenate([-x[..., d2:], x[..., :d2]], axis=-1)
    return (x * cos + rotated * sin).astype(x.dtype)


class RotaryMultiHeadAttention(nn.Module):
    """espnet RotaryPositionMultiHeadedAttention
    (`researches/uni_unity/modules/espnet_multihead_attention.py:212-276`):
    abs-position MHA where q/k are rotated per their absolute positions
    before the dot product; full-head-dim rotation, base 10000.

    Reference quirk matched exactly: rotation is applied to the RAW INPUT
    viewed as (.., H, Dh) BEFORE the q/k projections (`:246-263` — query/key
    are rotated, then ``forward_qkv`` projects), and v comes from the
    unrotated input. Incremental use stays exact for any chunking: the
    rotated-input keys depend only on their own ABSOLUTE position, so they
    cache cleanly (the reference only runs this offline, offset 0)."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    rope_base: float = 10000.0
    dtype: Any = jnp.float32

    def setup(self):
        d = self.embed_dim
        self.q_proj = nn.Dense(d, dtype=self.dtype, name="q_proj")
        self.k_proj = nn.Dense(d, dtype=self.dtype, name="k_proj")
        self.v_proj = nn.Dense(d, dtype=self.dtype, name="v_proj")
        self.out_proj = nn.Dense(d, dtype=self.dtype, name="out_proj")
        self.dropout_module = nn.Dropout(self.dropout)

    def __call__(
        self,
        x: jnp.ndarray,                   # [B, S, C] queries (and new keys)
        pos_emb: Optional[jnp.ndarray] = None,  # unused (rope needs no table)
        allowed: Optional[jnp.ndarray] = None,
        key_valid: Optional[jnp.ndarray] = None,
        cache: Optional[KVCache] = None,
        q_offset=0,
        deterministic: bool = True,
    ):
        h = self.num_heads
        dh = self.embed_dim // h
        scale = dh ** -0.5
        b, s, _ = x.shape

        # absolute positions of the new queries/keys: the pre-append cache
        # write index when caching (queries ARE the new keys), else q_offset
        if cache is not None:
            base = (cache.index if cache.index.ndim == 0
                    else cache.index[:, None])  # [] or [B,1]
        else:
            base = q_offset
        new_pos = base + jnp.arange(s, dtype=jnp.int32)
        cos, sin = _rope_cos_sin(new_pos, dh, self.rope_base)
        # broadcast over heads: [.., S, 1, D]
        cos, sin = cos[..., :, None, :], sin[..., :, None, :]
        if cos.ndim == 3:  # unbatched positions
            cos, sin = cos[None], sin[None]
        # reference order: rotate the raw input per-head, THEN project q/k
        x_rot = _apply_rope(x.reshape(b, s, h, dh), cos, sin) \
            .reshape(b, s, self.embed_dim)
        q = self.q_proj(x_rot).reshape(b, s, h, dh)
        k_new = self.k_proj(x_rot).reshape(b, s, h, dh)
        v_new = self.v_proj(x).reshape(b, s, h, dh)

        if cache is not None:
            cache, k, v, valid = _append_kv(cache, k_new, v_new)
            key_valid = valid if key_valid is None else key_valid
        else:
            k, v = k_new, v_new

        bias = mask_to_bias(allowed, key_valid)
        out = _attend(q, k, v, bias, scale, self.dropout_module, deterministic)
        out = self.out_proj(out.reshape(b, s, self.embed_dim))
        return (out, cache) if cache is not None else (out, None)


class FeedForward(nn.Module):
    """Conformer macaron FFN: LN → W1 → swish → drop → W2 → drop
    (`conformer_layer.py:121-161`)."""

    embed_dim: int
    ffn_dim: int
    dropout: float = 0.0
    activation: str = "swish"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = jax.nn.silu if self.activation == "swish" else jax.nn.relu
        x = LayerNorm(name="layer_norm", dtype=self.dtype)(x)
        x = nn.Dense(self.ffn_dim, dtype=self.dtype, name="w_1")(x)
        x = act(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="w_2")(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


# ---------------------------------------------------------------------------
# Chunk-causal convolution
# ---------------------------------------------------------------------------


def chunk_tap_allowed(t_out: int, kernel_size: int, stride: int,
                      chunk_size: Optional[int]) -> jnp.ndarray:
    """[t_out, kernel_size] bool: tap d of output t reads input u = t*s - pad + d;
    allowed iff u < (t*s // chunk + 1) * chunk (plus bounds handled by zero-pad).
    chunk_size None/>=999 → all taps allowed (symmetric same-pad conv, the
    reference's non-chunked branch)."""
    pad = kernel_size // 2
    if chunk_size is None or chunk_size >= 999:
        return jnp.ones((t_out, kernel_size), dtype=bool)
    tpos = jnp.arange(t_out, dtype=jnp.int32)[:, None] * stride
    u = tpos - pad + jnp.arange(kernel_size, dtype=jnp.int32)[None, :]
    chunk_end = (tpos // chunk_size + 1) * chunk_size
    return u < chunk_end


def chunk_causal_conv1d(
    x: jnp.ndarray,            # [B, T, Cin]
    weight: jnp.ndarray,       # [K, Cin, Cout] (full) or [K, C] (depthwise)
    bias: Optional[jnp.ndarray],
    stride: int,
    chunk_size: Optional[int],
    depthwise: bool = False,
) -> jnp.ndarray:
    """Masked-tap formulation of ChunkCausalConv1d (`chunk_causal_conv1d.py:39-68`).

    Output length = floor((T + 2*pad - K)/stride) + 1 (same as the reference).
    Each tap d contributes x[t*s - pad + d] @ W[d], masked where the tap would
    cross t's chunk boundary. Taps are static python-loop unrolled: K matmuls on
    the MXU (full conv) or K fused FMAs on the VPU (depthwise).
    """
    b, t_in, cin = x.shape
    k = weight.shape[0]
    pad = k // 2
    t_out = (t_in + 2 * pad - k) // stride + 1
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    allowed = chunk_tap_allowed(t_out, k, stride, chunk_size)

    out = None
    base = jnp.arange(t_out, dtype=jnp.int32) * stride
    for d in range(k):
        xd = jax.lax.dynamic_slice_in_dim(xp, d, (t_out - 1) * stride + 1, axis=1)
        if stride > 1:
            xd = xd[:, ::stride]
        xd = xd * allowed[None, :, d:d + 1].astype(xd.dtype)
        contrib = xd * weight[d][None, None, :] if depthwise else xd @ weight[d]
        out = contrib if out is None else out + contrib
    del base
    if bias is not None:
        out = out + bias
    return out


def chunk_causal_conv1d_step(
    x_ctx: jnp.ndarray,        # [B, pad + Tb, Cin]: left-context then new block
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    stride: int,
    chunk_size: Optional[int],
    depthwise: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Incremental block step of chunk_causal_conv1d.

    Preconditions: the block's first frame sits at an absolute input position that
    is a multiple of chunk_size (blocks are whole chunks), and Tb % stride == 0.
    The chunk-boundary tap mask is then phase-invariant, so outputs equal the
    corresponding rows of the offline convolution (the prefix-invariance property
    the reference obtains by re-running the whole conv each chunk).

    Returns (out [B, Tb/stride, Cout], new_ctx [B, pad, Cin]).
    """
    k = weight.shape[0]
    pad = k // 2
    tb = x_ctx.shape[1] - pad
    t_out = tb // stride
    new_ctx = x_ctx[:, -pad:] if pad > 0 else x_ctx[:, :0]
    xp = jnp.pad(x_ctx, ((0, 0), (0, pad), (0, 0)))
    if chunk_size is None or chunk_size >= 999:
        allowed = jnp.ones((t_out, k), dtype=bool)
    else:
        tpos = jnp.arange(t_out, dtype=jnp.int32)[:, None] * stride
        u = tpos - pad + jnp.arange(k, dtype=jnp.int32)[None, :]
        allowed = u < (tpos // chunk_size + 1) * chunk_size
    out = None
    for d in range(k):
        xd = jax.lax.dynamic_slice_in_dim(xp, d, (t_out - 1) * stride + 1, axis=1)
        if stride > 1:
            xd = xd[:, ::stride]
        xd = xd * allowed[None, :, d:d + 1].astype(xd.dtype)
        contrib = xd * weight[d][None, None, :] if depthwise else xd @ weight[d]
        out = contrib if out is None else out + contrib
    if bias is not None:
        out = out + bias
    return out, new_ctx


class ChunkCausalConv(nn.Module):
    """flax wrapper holding the conv parameters in reference layout."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    use_bias: bool = True
    depthwise: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        if self.depthwise:
            assert self.in_channels == self.out_channels
            self.weight = self.param("weight", nn.initializers.lecun_normal(),
                                     (self.kernel_size, self.in_channels))
        else:
            self.weight = self.param(
                "weight", nn.initializers.lecun_normal(),
                (self.kernel_size, self.in_channels, self.out_channels))
        self.bias = (self.param("bias", nn.initializers.zeros,
                                (self.out_channels,)) if self.use_bias else None)

    def __call__(self, x, chunk_size: Optional[int]):
        b = None if self.bias is None else self.bias.astype(self.dtype)
        return chunk_causal_conv1d(x, self.weight.astype(self.dtype), b,
                                   self.stride, chunk_size, self.depthwise)

    def step(self, x_ctx, chunk_size: Optional[int]):
        """Incremental block step; x_ctx = [left ctx (k//2), new block]."""
        b = None if self.bias is None else self.bias.astype(self.dtype)
        return chunk_causal_conv1d_step(x_ctx, self.weight.astype(self.dtype), b,
                                        self.stride, chunk_size, self.depthwise)

    @property
    def ctx_len(self) -> int:
        return self.kernel_size // 2


class ConvolutionModule(nn.Module):
    """Conformer convolution module (`conformer_layer.py:23-118`):
    LN → pointwise(2C) → GLU → chunk-causal depthwise(k=31) → BatchNorm → swish →
    pointwise(C) → dropout. BatchNorm uses running stats in eval mode, which is what
    makes incremental chunk processing exact (SURVEY.md §7 hard-parts)."""

    embed_dim: int
    depthwise_kernel_size: int = 31
    dropout: float = 0.0
    dtype: Any = jnp.float32

    def setup(self):
        c = self.embed_dim
        self.layer_norm = LayerNorm(name="layer_norm", dtype=self.dtype)
        self.pointwise_conv1 = nn.Dense(2 * c, use_bias=False, dtype=self.dtype,
                                        name="pointwise_conv1")
        self.depthwise_conv = ChunkCausalConv(
            c, c, self.depthwise_kernel_size, stride=1, use_bias=False,
            depthwise=True, dtype=self.dtype, name="depthwise_conv")
        self.batch_norm = nn.BatchNorm(momentum=0.9, epsilon=1e-5,
                                       dtype=self.dtype, name="batch_norm")
        self.pointwise_conv2 = nn.Dense(c, use_bias=False, dtype=self.dtype,
                                        name="pointwise_conv2")
        self.dropout_module = nn.Dropout(self.dropout)

    def _pre(self, x):
        x = self.layer_norm(x)
        x = self.pointwise_conv1(x)
        a, g = jnp.split(x, 2, axis=-1)
        return a * jax.nn.sigmoid(g)  # GLU over channel dim

    def _post(self, x, deterministic, use_running_stats):
        x = self.batch_norm(x, use_running_average=use_running_stats)
        x = jax.nn.silu(x)
        x = self.pointwise_conv2(x)
        return self.dropout_module(x, deterministic=deterministic)

    def __call__(self, x, chunk_size: Optional[int], deterministic: bool = True,
                 use_running_stats: bool = True):
        x = self._pre(x)
        x = self.depthwise_conv(x, chunk_size)
        return self._post(x, deterministic, use_running_stats)

    def step(self, x_new, conv_ctx, chunk_size: Optional[int], frame_valid=None):
        """Incremental: conv_ctx holds the previous post-GLU activations
        [B, k//2, C]. Returns (y, new_ctx). Eval mode (running BN stats).

        frame_valid [B, S] (batched lockstep serving): positions past a
        stream's true end must read as ZERO conv taps — exactly what the
        single-stream step sees from the conv's internal right zero-padding —
        so the post-GLU activations (≠0 for zero inputs: GLU(bias)) are masked
        before the depthwise conv."""
        x = self._pre(x_new)
        if frame_valid is not None:
            x = x * frame_valid[:, :, None].astype(x.dtype)
        x_ctx = jnp.concatenate([conv_ctx, x], axis=1)
        x, new_ctx = self.depthwise_conv.step(x_ctx, chunk_size)
        return self._post(x, True, True), new_ctx
