"""Synthetic tiny configs and batches (the analogue of fairseq's benchmark dummy
tasks, `fairseq/fairseq/benchmark/dummy_speech.py`) — used by tests, the
multi-chip dry-run, and bench.py."""

from __future__ import annotations

from typing import Dict

import numpy as np

from streamspeech_tpu.config import StreamSpeechConfig


def tiny_config(vocab_text: int = 32, vocab_units: int = 24,
                upsample: int = 4) -> StreamSpeechConfig:
    cfg = StreamSpeechConfig.simul_s2st()
    cfg.encoder.layers = 2
    cfg.encoder.embed_dim = 32
    cfg.encoder.ffn_embed_dim = 64
    cfg.encoder.attention_heads = 2
    cfg.encoder.conv_channels = 64
    cfg.encoder.depthwise_conv_kernel_size = 7
    cfg.mt_decoder.layers = 2
    cfg.mt_decoder.embed_dim = 32
    cfg.mt_decoder.ffn_embed_dim = 64
    cfg.mt_decoder.attention_heads = 2
    cfg.mt_decoder.vocab_size = vocab_text
    cfg.unit_decoder.layers = 1
    cfg.unit_decoder.embed_dim = 32
    cfg.unit_decoder.ffn_embed_dim = 64
    cfg.unit_decoder.attention_heads = 2
    cfg.unit_decoder.ctc_upsample_rate = upsample
    cfg.unit_decoder.vocab_size = vocab_units
    cfg.synthesizer_encoder_layers = 1
    cfg.source_unigram_vocab = vocab_text
    cfg.ctc_target_unigram_vocab = vocab_text
    return cfg


def full_config() -> StreamSpeechConfig:
    """The real simul-s2st architecture (train.simul-s2st.sh): 12L conformer d256,
    4L MT decoder d512 h8, 2L T2U, 2L unit decoder, upsample 25, units 1000+blank,
    text vocab 6000 (spm_unigram6000 files have 5996 pieces + 4 specials)."""
    cfg = StreamSpeechConfig.simul_s2st()
    cfg.encoder.layers = 12
    cfg.mt_decoder.vocab_size = 6000
    cfg.unit_decoder.vocab_size = 1005  # 4 specials + 1000 units + <blank>
    cfg.source_unigram_vocab = 6000
    cfg.ctc_target_unigram_vocab = 6000
    return cfg


def synthetic_batch(cfg: StreamSpeechConfig, batch: int = 4, frames: int = 64,
                    mt_len: int = 8, units_len: int = 12, text_len: int = 6,
                    seed: int = 0) -> Dict[str, np.ndarray]:
    # HOST numpy throughout: plain numpy args passed to a jit call are
    # inlined into the execute RPC for free through this environment's
    # remote tunnel, while each eager `jnp.asarray` here is its own ~31 ms
    # transfer RPC (CLAUDE.md RPC discipline). Callers that need explicit
    # mesh placement `jax.device_put` the whole dict in one call.
    rng = np.random.RandomState(seed)
    vt = cfg.mt_decoder.vocab_size
    vu = cfg.unit_decoder.vocab_size
    mt_prev = rng.randint(4, vt, size=(batch, mt_len)).astype(np.int32)
    mt_prev[:, 0] = 2  # eos-prefixed prev tokens (fairseq convention)
    mt_tgt = np.roll(mt_prev, -1, axis=1)
    mt_tgt[:, -1] = 2
    return {
        "src_tokens":
            rng.randn(batch, frames, cfg.encoder.input_feat_per_channel)
            .astype(np.float32),
        "src_lengths":
            rng.randint(frames // 2, frames + 1, size=(batch,)).astype(np.int32),
        "prev_output_tokens_mt": mt_prev,
        "mt_targets": mt_tgt,
        "target_units":
            rng.randint(4, vu - 1, size=(batch, units_len)).astype(np.int32),
        "target_unit_lengths": np.full((batch,), units_len, dtype=np.int32),
        "src_text":
            rng.randint(4, vt, size=(batch, text_len)).astype(np.int32),
        "src_text_lengths": np.full((batch,), text_len, dtype=np.int32),
        "tgt_text":
            rng.randint(4, vt, size=(batch, text_len)).astype(np.int32),
        "tgt_text_lengths": np.full((batch,), text_len, dtype=np.int32),
        "n2": np.int32(2),
    }
