"""Wav2Vec2-CTC ASR model — the ASR-BLEU transcriber architecture.

The reference's ASR-BLEU toolkit downloads per-language wav2vec2-CTC checkpoints
and transcribes predicted wavs via viterbi over CTC emissions
(`asr_bleu/utils.py:47-270`, `asr_bleu/asr_model_cfgs.json`). This module
provides the same model natively: the wav2vec2/HuBERT encoder
(models/hubert.py) + a character-CTC projection, with an importer for released
fairseq Wav2Vec2Ctc checkpoints (`w2v_encoder.w2v_model.*` + `w2v_encoder.proj`).

Usage with the evaluator's ASR_BLEU scorer:

    asr = Wav2Vec2CTC(vocab_size=32)
    variables = import_wav2vec2_ctc("checkpoint.pt")
    scorer = ASRBLEUScorer(asr_fn=make_wav2vec2_asr_fn(asr, variables, letters))
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from streamspeech_tpu.models.hubert import HubertModel
from streamspeech_tpu.ops.ctc import ctc_collapse


class Wav2Vec2CTC(nn.Module):
    vocab_size: int
    embed_dim: int = 768
    ffn_dim: int = 3072
    heads: int = 12
    num_layers: int = 12
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = HubertModel(self.embed_dim, self.ffn_dim, self.heads,
                                   self.num_layers, dtype=self.dtype,
                                   name="encoder")
        self.proj = nn.Dense(self.vocab_size, dtype=self.dtype, name="proj")

    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        """wav [B, N] → CTC emissions [B, T, V]."""
        feats = self.encoder.extract_features(wav,
                                              output_layer=self.num_layers)
        return self.proj(feats)


def import_wav2vec2_ctc(path: str) -> Dict:
    """Released fairseq Wav2Vec2Ctc .pt → variables for Wav2Vec2CTC."""
    import tempfile

    import torch

    from streamspeech_tpu.train.checkpoint import _linear, import_hubert

    state = torch.load(path, map_location="cpu", weights_only=False)
    sd = state["model"] if "model" in state else state
    # encoder weights live under w2v_encoder.w2v_model.*; strip the prefix and
    # reuse the HuBERT importer
    inner = {k[len("w2v_encoder.w2v_model."):]: v for k, v in sd.items()
             if k.startswith("w2v_encoder.w2v_model.")}
    with tempfile.NamedTemporaryFile(suffix=".pt") as f:
        torch.save({"model": inner}, f.name)
        enc = import_hubert(f.name)
    params = {"encoder": enc["params"],
              "proj": _linear(sd, "w2v_encoder.proj", {})}
    return {"params": params}


def make_wav2vec2_asr_fn(model: Wav2Vec2CTC, variables: Dict,
                         letters: List[str], blank: int = 0
                         ) -> Callable:
    """ASR backend for eval.quality.ASRBLEUScorer: wav → text via greedy CTC
    (letter vocab with "|" as the word separator, fairseq convention)."""

    @jax.jit
    def emissions(v, wav):
        return jnp.argmax(model.apply(v, wav), axis=-1)

    def asr_fn(wav, sample_rate: int = 16000) -> str:
        wav = np.asarray(wav, np.float32)
        n = max((len(wav) // 320) * 320, 320)
        ids = np.asarray(emissions(variables, jnp.asarray(wav[None, :n])))[0]
        tokens, _ = ctc_collapse(ids, blank=blank)
        text = "".join(letters[t] if t < len(letters) else "" for t in tokens)
        return text.replace("|", " ").strip()

    return asr_fn
