"""Offline generation: ASR/ST CTC greedy + MT beam search + NAR unit CTC.

Behavioral reference: `researches/ctc_unity/sequence_generator_multi_decoder_ctc.py:15-331`
(the generator behind fairseq-generate for --task speech_to_speech_ctc) and the
fairseq beam search (`fairseq/fairseq/sequence_generator.py`): cumulative
log-probs, never select pad, EOS finalization with length-normalized scores
(score / len^lenpen), beam candidates 2*beam per step.

TPU design: the beam lives in the batch dimension of one jitted incremental step
(KV caches of shape [beam, ...]); beam reordering gathers cache rows. The NAR
unit pass is a single full-sequence forward (it is non-autoregressive).
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from streamspeech_tpu.models.layers import KVCache
from streamspeech_tpu.models.streamspeech import StreamSpeechModel
from streamspeech_tpu.ops.ctc import ctc_collapse

PAD, EOS, UNK = 1, 2, 3


@dataclass
class BeamHypothesis:
    tokens: List[int]
    score: float


def _gather_cache(cache: KVCache, order: jnp.ndarray) -> KVCache:
    import dataclasses

    return dataclasses.replace(cache, k=cache.k[order], v=cache.v[order])


def block_repeat_ngrams(lp: np.ndarray, hyps, ngram: int):
    """Ban tokens that would complete an already-seen n-gram — the pure-numpy
    equivalent of the reference's CUDA ngram_repeat_block extension
    (`fairseq/fairseq/clib/cuda/ngram_repeat_block_cuda*`; fairseq
    sequence_generator --no-repeat-ngram-size)."""
    if ngram <= 0:
        return lp
    for b, hyp in enumerate(hyps):
        if len(hyp) < ngram - 1:
            continue
        prefix = tuple(hyp[-(ngram - 1):]) if ngram > 1 else tuple()
        for i in range(len(hyp) - ngram + 1):
            if tuple(hyp[i:i + ngram - 1]) == prefix:
                lp[b, hyp[i + ngram - 1]] = -np.inf
    return lp


class OfflineGenerator:
    """Greedy/beam offline inference over the full model."""

    def __init__(self, model: StreamSpeechModel, variables: Dict,
                 beam: int = 1, max_len: int = 200, len_penalty: float = 1.0,
                 max_enc_frames: int = 1024, no_repeat_ngram_size: int = 0):
        self.model = model
        self.variables = {"params": variables["params"],
                          "batch_stats": variables.get("batch_stats", {})}
        self.beam = beam
        self.max_len = max_len
        self.len_penalty = len_penalty
        self.max_enc_frames = max_enc_frames
        self.no_repeat_ngram_size = no_repeat_ngram_size
        self._build_programs()

    # -- override points (EnsembleGenerator vmaps these over a member axis) --

    def _make_caches(self, batch: int, length: int, h: int, dh: int,
                     layers: int) -> List[KVCache]:
        return [KVCache.create(batch, length, h, dh) for _ in range(layers)]

    def _repeat_beam(self, enc: jnp.ndarray, beam: int) -> jnp.ndarray:
        return jnp.repeat(enc, beam, axis=0)

    def _reorder(self, cache: KVCache, order: jnp.ndarray) -> KVCache:
        return _gather_cache(cache, order)

    def _build_programs(self):
        model = self.model

        @functools.partial(jax.jit, static_argnames=("chunk", "conv_chunk"))
        def encode(variables, src, src_len, chunk, conv_chunk):
            enc, lens = model.apply(variables, src, src_len, chunk, conv_chunk,
                                    method=StreamSpeechModel.encode)
            asr = jnp.argmax(model.apply(
                variables, enc, method=lambda m, e: m.source_unigram_head(e)),
                axis=-1)
            st = jnp.argmax(model.apply(
                variables, enc, method=lambda m, e: m.ctc_target_unigram_head(e)),
                axis=-1)
            return enc, lens, asr, st

        self._encode = encode

        @jax.jit
        def fill_cross(variables, enc, cross):
            return model.apply(variables, enc, cross,
                               method=StreamSpeechModel.mt_fill_cross)

        self._fill_cross = fill_cross

        @jax.jit
        def mt_step_logits(variables, tokens, offset, self_c, cross_c):
            logits, _, self_c = model.apply(
                variables, tokens, offset, self_c, cross_c,
                method=StreamSpeechModel.mt_decoder_step)
            return jax.nn.log_softmax(logits[:, -1].astype(jnp.float32)), self_c

        self._mt_step = mt_step_logits

        @jax.jit
        def synthesize(variables, mt_tokens, enc_buf, enc_len):
            ids, logits = model.apply(variables, mt_tokens, enc_buf, enc_len,
                                      method=StreamSpeechModel.synthesize_units)
            return ids

        self._synthesize = synthesize

    # ------------------------------------------------------------------

    def beam_search_mt(self, enc: jnp.ndarray, enc_len: int) -> List[BeamHypothesis]:
        """enc [1, T, C] → beam hypotheses (sorted best-first, no EOS token)."""
        beam = self.beam
        c = self.model.cfg.mt_decoder
        h, dh = c.attention_heads, c.embed_dim // c.attention_heads
        t_enc = enc.shape[-2]
        self_c = self._make_caches(beam, self.max_len + 2, h, dh, c.layers)
        cross = self._make_caches(beam, t_enc, h, dh, c.layers)
        enc_beam = self._repeat_beam(enc, beam)
        cross = self._fill_cross(self.variables, enc_beam, cross)
        # enc rows beyond enc_len are padding: truncate the cache index so the
        # attention's key-validity mask hides them (KVCache.truncate).
        cross = [kv.truncate(jnp.asarray(enc_len, jnp.int32)) for kv in cross]

        tokens = np.full((beam, 1), EOS, np.int32)
        scores = np.full((beam,), -1e9, np.float64)
        scores[0] = 0.0
        alive = np.ones((beam,), bool)
        finished: List[BeamHypothesis] = []
        hyps: List[List[int]] = [[] for _ in range(beam)]

        for step in range(self.max_len):
            lp, self_c = self._mt_step(self.variables,
                                       jnp.asarray(tokens),
                                       jnp.asarray(step, jnp.int32),
                                       self_c, cross)
            lp = np.asarray(lp, np.float64)  # [beam, V]
            lp[:, PAD] = -np.inf
            lp = block_repeat_ngrams(lp, hyps, self.no_repeat_ngram_size)
            total = scores[:, None] + lp
            total[~alive] = -np.inf
            if step == 0:
                total[1:] = -np.inf  # all beams identical at step 0
            flat = total.reshape(-1)
            top = np.argpartition(-flat, 2 * beam)[: 2 * beam]
            top = top[np.argsort(-flat[top])]
            new_tokens, new_scores, new_order, new_hyps = [], [], [], []
            for cand in top:
                b, v = divmod(int(cand), lp.shape[1])
                if v == EOS:
                    norm = flat[cand] / ((step + 1) ** self.len_penalty)
                    finished.append(BeamHypothesis(hyps[b][:], float(norm)))
                    continue
                new_tokens.append(v)
                new_scores.append(flat[cand])
                new_order.append(b)
                new_hyps.append(hyps[b] + [v])
                if len(new_tokens) == beam:
                    break
            if not new_tokens or len(finished) >= beam:
                break
            while len(new_tokens) < beam:
                new_tokens.append(PAD)
                new_scores.append(-np.inf)
                new_order.append(0)
                new_hyps.append([])
            order = jnp.asarray(new_order, jnp.int32)
            self_c = [self._reorder(kv, order) for kv in self_c]
            tokens = np.asarray(new_tokens, np.int32)[:, None]
            scores = np.asarray(new_scores, np.float64)
            alive = np.isfinite(scores)
            hyps = new_hyps

        if not finished:
            best = int(np.argmax(scores))
            finished = [BeamHypothesis(hyps[best],
                                       float(scores[best] /
                                             max(len(hyps[best]), 1)
                                             ** self.len_penalty))]
        finished.sort(key=lambda x: -x.score)
        return finished

    # ------------------------------------------------------------------

    def generate_batch_greedy(self, feats_list, chunk_size: Optional[int] = None,
                              conv_chunk_size: Optional[int] = None,
                              max_tokens: int = 64):
        """Batched greedy offline inference (beam=1): pads a whole batch, runs
        one encode + one scanned greedy decode + one NAR pass — the throughput
        path for dataset-scale offline evaluation (fairseq-generate batches the
        same way; the beam>1 path stays per-utterance)."""
        b = len(feats_list)
        t = max(f.shape[0] for f in feats_list)
        pad_t = -(-t // 32) * 32
        src = np.zeros((b, pad_t, feats_list[0].shape[1]), np.float32)
        lens = np.zeros((b,), np.int32)
        for i, f in enumerate(feats_list):
            src[i, : f.shape[0]] = f
            lens[i] = f.shape[0]
        chunk = 99999 if chunk_size is None else chunk_size
        conv_chunk = 99999 if conv_chunk_size is None else conv_chunk_size
        enc, enc_lens, asr_ids, st_ids = self._encode(
            self.variables, jnp.asarray(src), jnp.asarray(lens),
            chunk=chunk, conv_chunk=conv_chunk)

        # batched scanned greedy decode over KV caches
        c = self.model.cfg.mt_decoder
        h, dh = c.attention_heads, c.embed_dim // c.attention_heads
        self_c = [KVCache.create(b, max_tokens + 2, h, dh)
                  for _ in range(c.layers)]
        cross = [KVCache.create(b, enc.shape[1], h, dh)
                 for _ in range(c.layers)]
        cross = self._fill_cross(self.variables, enc, cross)
        # per-example key validity (the cache index is shared batch-wide, but
        # padded encoder rows must be masked per example)
        cross_valid = jnp.arange(enc.shape[1])[None, :] < \
            jnp.asarray(enc_lens)[:, None]
        first = jnp.full((b,), EOS, jnp.int32)
        toks, emitted, hit_eos, _ = self.model.apply(
            self.variables, first, jnp.asarray(0, jnp.int32),
            jnp.asarray(max_tokens, jnp.int32), self_c, cross, max_tokens,
            cross_valid, method=StreamSpeechModel.mt_decode_greedy)
        toks = np.asarray(toks)
        emitted = np.asarray(emitted)

        s_pad = -(-int(emitted.max() + 1) // 8) * 8
        prev = np.full((b, s_pad), PAD, np.int32)
        prev[:, 0] = EOS
        for i in range(b):
            prev[i, 1: emitted[i] + 1] = toks[i, : emitted[i]]
        unit_ids = self._synthesize(self.variables, jnp.asarray(prev), enc,
                                    jnp.asarray(enc_lens))
        up = self.model.cfg.unit_decoder.ctc_upsample_rate
        unit_blank = self.model.cfg.unit_decoder.vocab_size - 1
        results = []
        for i in range(b):
            e = int(enc_lens[i])
            asr_tokens, _ = ctc_collapse(np.asarray(asr_ids[i])[:e], blank=0)
            st_tokens, _ = ctc_collapse(np.asarray(st_ids[i])[:e], blank=0)
            ids = np.asarray(unit_ids[i])[: (emitted[i] + 1) * up]
            units, _ = ctc_collapse(ids, blank=unit_blank, pad=PAD)
            units = [u for u in units if 4 <= u < unit_blank]
            results.append({
                "asr_tokens": asr_tokens,
                "st_tokens": st_tokens,
                "mt_tokens": toks[i, : emitted[i]].tolist(),
                "units": units,
            })
        return results

    def generate(self, feats: np.ndarray, chunk_size: Optional[int] = None,
                 conv_chunk_size: Optional[int] = None) -> Dict:
        """Full offline pass on one utterance: returns dict with asr/st token
        lists, MT hypothesis, and unit sequence (dictionary ids)."""
        t = feats.shape[0]
        pad_t = -(-t // 32) * 32
        src = np.zeros((1, pad_t, feats.shape[1]), np.float32)
        src[0, :t] = feats
        chunk = 99999 if chunk_size is None else chunk_size
        conv_chunk = 99999 if conv_chunk_size is None else conv_chunk_size
        enc, lens, asr_ids, st_ids = self._encode(
            self.variables, jnp.asarray(src), jnp.asarray([t], jnp.int32),
            chunk=chunk, conv_chunk=conv_chunk)
        enc_len = int(lens[0])
        asr_tokens, _ = ctc_collapse(np.asarray(asr_ids[0])[:enc_len], blank=0)
        st_tokens, _ = ctc_collapse(np.asarray(st_ids[0])[:enc_len], blank=0)

        hyps = self.beam_search_mt(enc, enc_len)
        mt_tokens = hyps[0].tokens

        # bucket the MT prefix to multiples of 8 to bound jit shape diversity
        s = len(mt_tokens) + 1
        s_pad = -(-s // 8) * 8
        prev = np.full((1, s_pad), PAD, np.int32)
        prev[0, 0] = EOS
        prev[0, 1:s] = mt_tokens
        unit_ids = self._synthesize(self.variables, jnp.asarray(prev),
                                    enc, jnp.asarray(enc_len))
        up = self.model.cfg.unit_decoder.ctc_upsample_rate
        unit_blank = self.model.cfg.unit_decoder.vocab_size - 1
        ids = np.asarray(unit_ids[0])[: s * up]
        units, _ = ctc_collapse(ids, blank=unit_blank, pad=PAD)
        units = [u for u in units if 4 <= u < unit_blank]
        return {
            "asr_tokens": asr_tokens,
            "st_tokens": st_tokens,
            "mt_tokens": mt_tokens,
            "mt_score": hyps[0].score,
            "units": units,
        }


def stack_variables(variables_list: List[Dict]) -> Dict:
    """Stack N same-architecture variable pytrees on a new leading member
    axis. Raises on structure mismatch (members must share one arch, the
    same contract as fairseq's load_model_ensemble)."""
    clean = [{"params": v["params"],
              "batch_stats": v.get("batch_stats", {})} for v in variables_list]
    ref = jax.tree.structure(clean[0])
    for i, v in enumerate(clean[1:], 1):
        if jax.tree.structure(v) != ref:
            raise ValueError(f"ensemble member {i} has a different parameter "
                             "structure than member 0")
    return jax.tree.map(lambda *xs: jnp.stack(xs), *clean)


class EnsembleGenerator(OfflineGenerator):
    """N-checkpoint ensemble decoding.

    Reference semantics: fairseq's EnsembleModel
    (`fairseq/fairseq/sequence_generator.py:744-850` forward_decoder /
    `checkpoint_utils.py:288` load_model_ensemble): every member runs its own
    encoder and per-step decoder log-probs; members combine in PROBABILITY
    space — logsumexp over members minus log(N). The CTC heads (ASR/ST aux
    and the NAR unit decoder) average the same way before argmax.

    TPU design: the reference loops N torch modules per step; here member
    params are STACKED on a leading axis and every program is `jax.vmap`ed
    over it, so ONE jitted dispatch computes all N members (the member loop
    becomes a batched matmul on the MXU). KV caches carry the member axis
    ([N, beam, T, H, Dh]); beam reordering gathers along axis 1.
    """

    def __init__(self, model: StreamSpeechModel, variables_list: List[Dict],
                 **kw):
        if not variables_list:
            raise ValueError("ensemble needs at least one member")
        self.n_models = len(variables_list)
        super().__init__(model, stack_variables(variables_list), **kw)

    # -- hooks: caches/enc carry a leading member axis ---------------------

    def _make_caches(self, batch, length, h, dh, layers):
        base = [KVCache.create(batch, length, h, dh) for _ in range(layers)]
        return [jax.tree.map(lambda *xs: jnp.stack(xs), *([kv] * self.n_models))
                for kv in base]

    def _repeat_beam(self, enc, beam):
        return jnp.repeat(enc, beam, axis=1)  # enc [N, 1, T, C] -> [N, beam, T, C]

    def _reorder(self, cache, order):
        import dataclasses

        return dataclasses.replace(cache, k=cache.k[:, order],
                                   v=cache.v[:, order])

    def _build_programs(self):
        model = self.model
        log_n = math.log(float(self.n_models))

        @functools.partial(jax.jit, static_argnames=("chunk", "conv_chunk"))
        def encode(variables, src, src_len, chunk, conv_chunk):
            def enc_one(v):
                enc, lens = model.apply(v, src, src_len, chunk, conv_chunk,
                                        method=StreamSpeechModel.encode)
                asr = jax.nn.log_softmax(model.apply(
                    v, enc, method=lambda m, e: m.source_unigram_head(e)
                ).astype(jnp.float32))
                st = jax.nn.log_softmax(model.apply(
                    v, enc, method=lambda m, e: m.ctc_target_unigram_head(e)
                ).astype(jnp.float32))
                return enc, lens, asr, st

            enc, lens, asr, st = jax.vmap(enc_one)(variables)
            # enc lengths depend only on src_len (static downsampling) —
            # identical across members; CTC heads average member probs
            asr_ids = jnp.argmax(jax.nn.logsumexp(asr, axis=0), axis=-1)
            st_ids = jnp.argmax(jax.nn.logsumexp(st, axis=0), axis=-1)
            return enc, lens[0], asr_ids, st_ids

        self._encode = encode

        @jax.jit
        def fill_cross(variables, enc, cross):
            return jax.vmap(lambda v, e, cc: model.apply(
                v, e, cc, method=StreamSpeechModel.mt_fill_cross)
            )(variables, enc, cross)

        self._fill_cross = fill_cross

        @jax.jit
        def mt_step_logits(variables, tokens, offset, self_c, cross_c):
            def step_one(v, sc, cc):
                logits, _, sc = model.apply(
                    v, tokens, offset, sc, cc,
                    method=StreamSpeechModel.mt_decoder_step)
                return jax.nn.log_softmax(
                    logits[:, -1].astype(jnp.float32)), sc

            lp, self_c = jax.vmap(step_one)(variables, self_c, cross_c)
            return jax.nn.logsumexp(lp, axis=0) - log_n, self_c

        self._mt_step = mt_step_logits

        @jax.jit
        def synthesize(variables, mt_tokens, enc_buf, enc_len):
            def syn_one(v, e):
                _, logits = model.apply(v, mt_tokens, e, enc_len,
                                        method=StreamSpeechModel.synthesize_units)
                return jax.nn.log_softmax(logits.astype(jnp.float32))

            lp = jax.vmap(syn_one)(variables, enc_buf)
            return jnp.argmax(jax.nn.logsumexp(lp, axis=0), axis=-1)

        self._synthesize = synthesize

    def generate_batch_greedy(self, feats_list, chunk_size=None,
                              conv_chunk_size=None, max_tokens: int = 64):
        """The batched greedy path argmaxes INSIDE a scanned model method, so
        member probs cannot be averaged post hoc — ensemble decoding runs the
        per-utterance beam path instead (fairseq-generate with an ensemble
        pays the same N-model cost per step)."""
        return [self.generate(f, chunk_size, conv_chunk_size)
                for f in feats_list]
