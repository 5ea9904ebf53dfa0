"""Hidden Markov Transformer (HMT) — simultaneous text MT with latent
translating moments (ICLR'23), the reference's text-MT research baseline.

Behavioral reference: `researches/hmt/hmt_model.py:794-1014` and
`researches/hmt/hmt_label_smoothed_cross_entropy.py:53-330`:

- Every target position i has K candidate translating moments
  cands[i, k] = first_read + i + k (`hmt_model.py:1001-1005`), clamped to the
  source length.
- The decoder runs all K states in parallel (target embeddings repeated ×K);
  state (i, k) cross-attends to the first cands[i,k] source tokens and
  self-attends to states of previous tokens with moments ≤ its own.
- Transition head: p(translate now | keep reading) from
  cat(decoder state, cumulative-mean encoder state at the moment)
  (`hmt_model.py:826-855`); the last state must translate.
- Training: HMM forward algorithm marginalizing over monotone state paths
  (emission = target log-prob per state), + per-state CE, + expected-latency
  loss (`hmt_label_smoothed_cross_entropy.py:142-241,296-330`).

JAX notes: the alpha recursion is a lax.scan over target positions; everything
else is batched einsum/masking with static shapes.
"""

from __future__ import annotations


from typing import Any, Dict, Optional, Tuple

import flax.linen as nn

from streamspeech_tpu.models.layers import LayerNorm
import jax
import jax.numpy as jnp

from streamspeech_tpu.config import DecoderConfig
from streamspeech_tpu.models.transformer import (
    PAD,
    TransformerDecoderLayer,
    UniTransformerEncoderWithEmb,
    fairseq_positions,
    sinusoidal_embedding,
    token_embedding_init,
)

NEG = -1e9


def build_cands(tgt_len: int, first_read: int, k: int) -> jnp.ndarray:
    """[tgt_len, K]: translating moment candidates (source tokens read)."""
    i = jnp.arange(tgt_len, dtype=jnp.int32)[:, None]
    return first_read + i + jnp.arange(k, dtype=jnp.int32)[None, :]


class HMTDecoder(nn.Module):
    cfg: DecoderConfig
    first_read: int = 3
    cands_per_token: int = 4
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.embed_tokens = self.param("embed_tokens", token_embedding_init,
                                       (c.vocab_size, c.embed_dim))
        self.pos_table = jnp.asarray(
            sinusoidal_embedding(c.max_target_positions, c.embed_dim, PAD))
        self.embed_scale = c.embed_dim ** 0.5
        self.layers = [
            TransformerDecoderLayer(c.embed_dim, c.ffn_embed_dim,
                                    c.attention_heads, c.dropout,
                                    normalize_before=True, dtype=self.dtype,
                                    name=f"layers_{i}")
            for i in range(c.layers)
        ]
        self.layer_norm = LayerNorm(dtype=self.dtype, name="layer_norm")
        self.transition_proj = nn.Dense(2, use_bias=False, dtype=self.dtype,
                                        name="transition_proj")
        self.dropout_module = nn.Dropout(c.dropout)

    def __call__(self, prev_output_tokens, enc, src_lengths,
                 deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Returns (emission logits [B,S,K,V], transition logits [B,S,K,2],
        cands [S,K])."""
        c = self.cfg
        k = self.cands_per_token
        b, s = prev_output_tokens.shape
        t_src = enc.shape[1]
        cands = build_cands(s, self.first_read, k)           # [S, K]
        flat_cands = cands.reshape(-1)                       # [S*K]

        positions = fairseq_positions(prev_output_tokens)
        x = self.embed_scale * jnp.take(self.embed_tokens, prev_output_tokens,
                                        axis=0)
        x = x + jnp.take(self.pos_table, positions, axis=0)
        x = jnp.repeat(x, k, axis=1)                         # [B, S*K, C]
        x = self.dropout_module(x, deterministic=deterministic)

        # self-attn: (i,k) sees (i',k') iff i' < i and cands' <= cands, or self
        tok_idx = jnp.repeat(jnp.arange(s, dtype=jnp.int32), k)
        sk = s * k
        same = jnp.eye(sk, dtype=bool)
        earlier = tok_idx[None, :] < tok_idx[:, None]
        moment_ok = flat_cands[None, :] <= flat_cands[:, None]
        allowed_self = same | (earlier & moment_ok)

        # cross-attn: (i,k) sees source j < cands[i,k] (padding via enc_valid)
        j = jnp.arange(t_src, dtype=jnp.int32)[None, :]
        allowed_cross = j < flat_cands[:, None]
        enc_valid = j < src_lengths[:, None]

        self_valid = jnp.repeat(prev_output_tokens != PAD, k, axis=1)
        for layer in self.layers:
            x, _ = layer(x, enc, allowed_self, allowed_cross, self_valid,
                         enc_valid, deterministic)
        x = self.layer_norm(x)

        emission = (x @ self.embed_tokens.T.astype(x.dtype)).reshape(
            b, s, k, c.vocab_size)

        # transition features: decoder state + cumulative-mean encoder state at
        # the (clamped) moment (`hmt_model.py:826-841`)
        cummean = jnp.cumsum(enc, axis=1) / jnp.arange(
            1, t_src + 1, dtype=enc.dtype)[None, :, None]
        moment = jnp.clip(jnp.minimum(flat_cands, src_lengths[:, None]) - 1,
                          0, t_src - 1)                      # [B, S*K]
        gathered = jnp.take_along_axis(cummean, moment[..., None], axis=1)
        trans = self.transition_proj(jnp.concatenate([x, gathered], axis=-1))
        trans = trans.reshape(b, s, k, 2)
        # the last state must translate: mask its "keep reading" logit
        last = jnp.arange(k) == k - 1
        trans = jnp.where(last[None, None, :, None] &
                          (jnp.arange(2) == 0)[None, None, None, :], NEG, trans)
        return emission, trans, cands


class HMTModel(nn.Module):
    """Unidirectional text encoder + HMT decoder (`hmt_transformer` arch)."""

    src_vocab: int
    decoder_cfg: DecoderConfig
    encoder_layers: int = 6
    first_read: int = 3
    cands_per_token: int = 4
    dtype: Any = jnp.float32

    def setup(self):
        d = self.decoder_cfg
        self.encoder = UniTransformerEncoderWithEmb(
            d.embed_dim, d.ffn_embed_dim, d.attention_heads,
            self.encoder_layers, self.src_vocab, d.dropout,
            unidirectional=True, dtype=self.dtype, name="encoder")
        self.decoder = HMTDecoder(d, self.first_read, self.cands_per_token,
                                  dtype=self.dtype, name="decoder")

    def __call__(self, src_tokens, src_lengths, prev_output_tokens,
                 deterministic: bool = True):
        enc = self.encoder(src_tokens, deterministic)
        return self.decoder(prev_output_tokens, enc, src_lengths, deterministic)


# ---------------------------------------------------------------------------
# criterion (HMM forward algorithm + per-state CE + expected latency)
# ---------------------------------------------------------------------------


def _construct_transition(trans_lprob: jnp.ndarray) -> jnp.ndarray:
    """log P(reach state k at token i) = trans[..,k,1] + Σ_{k'<k} trans[..,k',0]
    (`hmt_label_smoothed_cross_entropy.py:156-176`)."""
    not_t = trans_lprob[..., 0]
    cum = jnp.cumsum(not_t, axis=-1)
    cum = jnp.pad(cum[..., :-1], ((0, 0), (0, 0), (1, 0)))
    return trans_lprob[..., 1] + cum  # [B, S, K]


def _alpha_scan(ctp, gt_lprob, cands_clamped):
    """Forward algorithm over target positions. ctp/gt_lprob: [B, S, K];
    cands_clamped: [B, S, K]. Returns alphas [B, S, K]."""
    b, s, k = ctp.shape

    def body(alpha, inputs):
        ctp_i, gt_i, c_prev, c_cur = inputs  # [B,K] each
        # transition matrix [B, K_prev, K_cur], monotone: c_prev <= c_cur
        m = ctp_i[:, None, :].repeat(k, 1)
        mono = c_prev[:, :, None] <= c_cur[:, None, :]
        m = jnp.where(mono, m, NEG)
        m = m - jax.scipy.special.logsumexp(m, axis=-1, keepdims=True)
        new_alpha = jax.scipy.special.logsumexp(
            alpha[:, :, None] + m, axis=1) + gt_i
        return new_alpha, new_alpha

    alpha0 = ctp[:, 0] + gt_lprob[:, 0]
    if s == 1:
        return alpha0[:, None]
    _, rest = jax.lax.scan(
        body, alpha0,
        (ctp[:, 1:].transpose(1, 0, 2), gt_lprob[:, 1:].transpose(1, 0, 2),
         cands_clamped[:, :-1].transpose(1, 0, 2),
         cands_clamped[:, 1:].transpose(1, 0, 2)))
    return jnp.concatenate([alpha0[:, None], rest.transpose(1, 0, 2)], axis=1)


def hmt_loss(emission, trans, cands, targets, src_lengths,
             label_smoothing: float = 0.1, latency_weight: float = 1.0
             ) -> Dict[str, jnp.ndarray]:
    """emission [B,S,K,V], trans [B,S,K,2], cands [S,K], targets [B,S]."""
    b, s, k, v = emission.shape
    lprobs = jax.nn.log_softmax(emission.astype(jnp.float32), axis=-1)
    trans_lprob = jax.nn.log_softmax(trans.astype(jnp.float32), axis=-1)
    valid = targets != PAD

    gt = jnp.take_along_axis(
        lprobs, targets[:, :, None, None].repeat(k, 2), axis=-1)[..., 0]
    ctp = _construct_transition(trans_lprob)
    cands_b = jnp.minimum(cands[None], src_lengths[:, None, None])  # [B,S,K]

    alphas = _alpha_scan(ctp, gt, cands_b)
    tgt_lens = jnp.sum(valid, axis=1)
    last_alpha = jnp.take_along_axis(
        alphas, (tgt_lens - 1)[:, None, None].repeat(k, 2), axis=1)[:, 0]
    hmm_nll = -jnp.sum(jax.scipy.special.logsumexp(last_alpha, axis=-1))

    # per-state CE (`CE_loss`): label-smoothed, averaged over states
    nll = -gt
    smooth = -jnp.sum(lprobs, axis=-1)
    eps_i = label_smoothing / v
    ce = ((1 - label_smoothing) * nll + eps_i * smooth)
    ce = jnp.sum(ce * valid[:, :, None]) / k

    # expected latency (`Latency_loss`): E_path[cands - ideal]
    ideal = jnp.minimum(
        cands[None, :, 0:1] , src_lengths[:, None, None])      # first_read + i
    delay = (cands_b - ideal).astype(jnp.float32)
    occ_alphas = _alpha_scan(ctp, jnp.zeros_like(gt), cands_b)
    occupancy = jnp.exp(occ_alphas)
    lat = occupancy * delay * valid[:, :, None]
    lat = lat / jnp.clip(tgt_lens, 1, s)[:, None, None]
    latency = jnp.abs(jnp.sum(lat))

    loss = hmm_nll + ce + latency_weight * latency
    return {"loss": loss, "hmm_nll": hmm_nll, "state_ce": ce,
            "latency": latency,
            "sample_size": jnp.maximum(jnp.sum(valid), 1)}


from streamspeech_tpu.registry import AGENTS


@AGENTS.register("hmt_text")
class HMTAgent:
    """Simultaneous inference policy (`agent/mt/hmt_sim_sequence_generator.py`
    role): at target position i with n source tokens read, the active state is
    k = n - first_read - i; READ while the transition head prefers reading and
    k < K-1, else WRITE the argmax token."""

    source_type = "text"
    target_type = "text"

    def __init__(self, model: HMTModel, variables, src_dict, tgt_dict,
                 max_len: int = 100):
        from streamspeech_tpu.agents.base import AgentStates

        self.model = model
        self.variables = variables
        self.src_dict = src_dict
        self.tgt_dict = tgt_dict
        self.max_len = max_len
        self.states = AgentStates()

        @jax.jit
        def step(variables, src, src_len, prev, pos):
            em, tr, _ = model.apply(variables, src, src_len, prev)
            return (jnp.argmax(em[0, pos], axis=-1),
                    jax.nn.log_softmax(tr.astype(jnp.float32), -1)[0, pos])

        self._step = step
        self.reset()

    def reset(self):
        self.states.reset()
        self.hyp = []

    def push(self, segment):
        self.states.update_source(segment)

    def pop(self):
        from streamspeech_tpu.agents.base import (EmptySegment, ReadAction,
                                                  TextSegment, WriteAction)

        action = self.policy()
        if action.is_read():
            return EmptySegment(finished=self.states.target_finished)
        seg = action.content
        self.states.update_target(seg)
        return seg

    def pushpop(self, segment):
        self.push(segment)
        return self.pop()

    def policy(self):
        from streamspeech_tpu.agents.base import ReadAction, TextSegment, \
            WriteAction

        fr = self.model.first_read
        kk = self.model.cands_per_token
        n_src = len(self.states.source)
        i = len(self.hyp)
        finished = self.states.source_finished
        k = n_src - fr - i
        if not finished and k < 0:
            return ReadAction()
        k = max(0, min(k, kk - 1)) if not finished else kk - 1

        src_ids = [self.src_dict.index(w) for w in self.states.source] or \
            [self.src_dict.eos()]
        import numpy as np

        m = -(-len(src_ids) // 8) * 8
        src = np.full((1, m), PAD, np.int32)
        src[0, :len(src_ids)] = src_ids
        pm = -(-(i + 1) // 8) * 8
        prev = np.full((1, pm), PAD, np.int32)
        prev[0, 0] = self.tgt_dict.eos()
        prev[0, 1:i + 1] = self.hyp
        tok_k, tr_k = self._step(self.variables, jnp.asarray(src),
                                 jnp.asarray([len(src_ids)], jnp.int32),
                                 jnp.asarray(prev), jnp.asarray(i, jnp.int32))
        translate = finished or float(tr_k[k, 1]) >= float(tr_k[k, 0]) or \
            k >= kk - 1
        if not translate:
            return ReadAction()
        nxt = int(tok_k[k])
        done = finished and (nxt == self.tgt_dict.eos() or
                             len(self.hyp) + 1 >= self.max_len)
        if nxt == self.tgt_dict.eos():
            self.states.target_finished = True
            return WriteAction(TextSegment(content="", finished=True),
                               finished=True)
        self.hyp.append(nxt)
        if done:
            self.states.target_finished = True
        return WriteAction(TextSegment(content=self.tgt_dict[nxt],
                                       finished=done), finished=done)


# ---------------------------------------------------------------------------
# offline beam generation
# ---------------------------------------------------------------------------


_BEAM_STEP_CACHE: Dict[int, Tuple[Any, Any]] = {}


def _beam_step_program(model: HMTModel):
    """One jitted program per model instance, cached so repeated generate
    calls reuse compilations (configs are mutable dataclasses — not
    lru_cache-able; the value holds the model so its id stays unique)."""
    hit = _BEAM_STEP_CACHE.get(id(model))
    if hit is not None and hit[0] is model:
        return hit[1]
    kk = model.cands_per_token

    @jax.jit
    def _step(variables, src, src_len, prev, pos):
        em, tr, _ = model.apply(variables, src, src_len, prev)
        tp = jax.nn.softmax(tr.astype(jnp.float32), -1)[:, pos]      # [B,K,2]
        ok = tp[:, :, 1] >= 0.5
        sel = jnp.where(jnp.any(ok, axis=1), jnp.argmax(ok, axis=1), kk - 1)
        lp = jax.nn.log_softmax(em.astype(jnp.float32), -1)[:, pos]  # [B,K,V]
        lp = jnp.take_along_axis(lp, sel[:, None, None], axis=1)[:, 0]
        return lp, sel

    _BEAM_STEP_CACHE[id(model)] = (model, _step)
    return _step


def hmt_beam_generate(model: HMTModel, variables, src_ids, beam_size: int = 5,
                      max_len: int = 100, len_penalty: float = 1.0,
                      min_len: int = 1, eos: int = 2, pad: int = PAD):
    """Offline HMT beam search (`agent/mt/hmt_sequence_generator.py:207-728`).

    Per beam row at each step, the active HMM state is the FIRST candidate
    whose transition head says translate (p >= 0.5, `:443` next_selected_idx;
    the last state is forced to translate by the model); emission log-probs
    are gathered at that state and stepped with fairseq beam mechanics:
    2*beam candidate expansion, EOS hypotheses finalized with score /
    (len ** len_penalty) (`fairseq/sequence_generator.py` semantics), pad
    never selected, EOS banned before ``min_len`` and forced at ``max_len``.

    Returns a list of (tokens: List[int] without EOS, score: float), best
    first. Beams are batched through one jitted program per (src-bucket,
    prev-bucket) shape; all outputs fetched with one device_get per step.
    """
    import numpy as np

    kk = model.cands_per_token
    _step = _beam_step_program(model)

    bsz = beam_size
    n_src = len(src_ids)
    msrc = -(-max(n_src, 1) // 8) * 8
    src = np.full((bsz, msrc), pad, np.int32)
    src[:, :n_src] = src_ids
    src_len = np.full((bsz,), n_src, np.int32)

    tokens = np.full((bsz, max_len + 2), pad, np.int32)
    tokens[:, 0] = eos  # fairseq convention: prev starts with EOS
    scores = np.zeros((bsz,), np.float64)
    scores[1:] = -np.inf  # step 0: all beams identical — keep only row 0
    finalized = []  # (score_normalized, tokens)

    for step_i in range(max_len + 1):
        pm = -(-(step_i + 1) // 8) * 8
        prev = np.full((bsz, pm), pad, np.int32)
        prev[:, :step_i + 1] = tokens[:, :step_i + 1]
        lp, _sel = jax.device_get(_step(
            variables, src, src_len, prev, jnp.asarray(step_i, jnp.int32)))
        lp = lp.astype(np.float64)
        lp[:, pad] = -np.inf
        if step_i < min_len:
            lp[:, eos] = -np.inf
        if step_i >= max_len:
            keep = lp[:, eos].copy()
            lp[:] = -np.inf
            lp[:, eos] = keep
        cand = scores[:, None] + lp                     # [B, V]
        flat = cand.reshape(-1)
        top = np.argsort(-flat)[: 2 * bsz]
        new_rows = []
        for f in top:
            b, t = divmod(int(f), lp.shape[1])
            sc = flat[f]
            if not np.isfinite(sc):
                continue
            if t == eos:
                norm = sc / float((step_i + 1) ** len_penalty)
                finalized.append((norm, tokens[b, 1:step_i + 1].tolist()))
            elif len(new_rows) < bsz:
                new_rows.append((b, t, sc))
        if len(finalized) >= bsz or not new_rows:
            break
        order = np.asarray([b for b, _, _ in new_rows], np.int32)
        tokens = tokens[order]
        tokens[:, step_i + 1] = [t for _, t, _ in new_rows]
        scores = np.asarray([sc for _, _, sc in new_rows], np.float64)
        if len(new_rows) < bsz:  # pad dead rows (keep shapes static)
            k = bsz - len(new_rows)
            tokens = np.concatenate([tokens, tokens[-1:].repeat(k, 0)], 0)
            scores = np.concatenate([scores, np.full((k,), -np.inf)])
    finalized.sort(key=lambda x: -x[0])
    return [(toks, float(sc)) for sc, toks in finalized[:bsz]]


# ---------------------------------------------------------------------------
# simultaneous beam generation
# ---------------------------------------------------------------------------


def _sim_step_program(model: HMTModel):
    """Jitted per-step program for the sim beam: emission log-probs and
    transition probs for ALL candidate states at target position ``pos``,
    with cross-attention clipped to the first ``num_read`` source tokens
    (the unidirectional encoder makes full-encode + length-clamp exactly
    equal to the reference's partial-encoder slicing,
    `hmt_sim_sequence_generator.py:755-771`)."""
    hit = _BEAM_STEP_CACHE.get(("sim", id(model)))
    if hit is not None and hit[0] is model:
        return hit[1]

    @jax.jit
    def _step(variables, src, num_read, prev, pos):
        em, tr, _ = model.apply(variables, src, num_read, prev)
        lp = jax.nn.log_softmax(em.astype(jnp.float32), -1)[:, pos]  # [B,K,V]
        tp = jax.nn.softmax(tr.astype(jnp.float32), -1)[:, pos]      # [B,K,2]
        return lp, tp

    _BEAM_STEP_CACHE[("sim", id(model))] = (model, _step)
    return _step


def hmt_sim_beam_generate(model: HMTModel, variables, src_ids,
                          src_finished: bool,
                          prefix_tokens=None, num_read_start: int = 1,
                          beam_size: int = 5, max_len: int = 100,
                          len_penalty: float = 1.0, min_len: int = 1,
                          eos: int = 2, pad: int = PAD, step_fn=None):
    """SIMULTANEOUS beam search with HMM read-states per hypothesis — the
    port of `agent/mt/hmt_sim_sequence_generator.py:206-753` onto the JAX
    HMT model. Decoding interleaves READs with beam WRITE steps:

    - while ``num_read - first_read - step < 0`` the generator must READ
      (`:434-436`); when the low-boundary state's translate probability is
      below 0.5 it keeps READing within the candidate window (`:464-470`);
    - each beam row then translates from its FIRST state with
      p(translate) >= 0.5, transitions for states already passed by the
      running-max read being masked to 0 (`:456-461, 486-489`);
    - when more source is wanted but none is available and the source is
      unfinished, ``return_read_flag`` forces EOS (`:438-440, 472-481`) so
      the caller can commit the stable tokens and READ;
    - standard fairseq beam mechanics otherwise: 2x-beam candidate
      expansion, EOS finalization with score/len**penalty, per-row reorder
      of the read trace (`:422-431`).

    Returns (finalized, return_read_flag, num_read) where finalized is a
    best-first list of (tokens WITHOUT the forced/natural EOS, score,
    reads) and ``reads[i]`` is the running-max source tokens read when
    token i was emitted — the READ/WRITE trace
    (tests/test_hmt.py compares it against an independent python port).

    ``step_fn(prev [B,S], pos, num_read) -> (lprobs [B,K,V], tprobs
    [B,K,2])`` overrides the model program (testing with constructed HMMs).
    """
    import numpy as np

    fr, kk = model.first_read, model.cands_per_token
    if step_fn is None:
        _step = _sim_step_program(model)
        n_src = len(src_ids)
        msrc = -(-max(n_src, 1) // 8) * 8
        src = np.full((beam_size, msrc), pad, np.int32)
        src[:, :n_src] = src_ids

        def step_fn(prev, pos, num_read):
            lp, tp = jax.device_get(_step(
                variables, src,
                np.full((beam_size,), num_read, np.int32),
                prev, jnp.asarray(pos, jnp.int32)))
            return lp, tp
    else:
        n_src = len(src_ids)

    bsz = beam_size
    tokens = np.full((bsz, max_len + 2), pad, np.int32)
    tokens[:, 0] = eos
    start = 0
    if prefix_tokens:
        tokens[:, 1:len(prefix_tokens) + 1] = prefix_tokens
        start = len(prefix_tokens)
    scores = np.zeros((bsz,), np.float64)
    scores[1:] = -np.inf
    reads = np.zeros((bsz, max_len + 2), np.int32)
    n_reads = start
    finalized = []
    num_read = min(max(num_read_start, 1), n_src)
    return_read_flag = False

    step_i = start
    while step_i < max_len + 1:
        finish_read = num_read >= n_src
        if num_read - fr - step_i < 0 and not finish_read:
            num_read += 1
            continue
        if num_read - fr - step_i < 0 and finish_read and not src_finished:
            return_read_flag = True

        pm = -(-(step_i + 1) // 8) * 8
        prev = np.full((bsz, pm), pad, np.int32)
        prev[:, :step_i + 1] = tokens[:, :step_i + 1]
        lp, tp = step_fn(prev, step_i, num_read)
        lp = np.asarray(lp, np.float64)
        tp = np.asarray(tp, np.float64)

        # running-max read monotonicity: states whose candidate moment lies
        # before what a row has already read cannot be selected (`:456-461`)
        cands_row = np.minimum(fr + step_i + np.arange(kk), n_src)  # [K]
        if n_reads > start or start > 0:
            prev_read = reads[:, n_reads - 1] if n_reads > 0 else \
                np.zeros((bsz,), np.int32)
            t_masked = np.where(cands_row[None, :] < prev_read[:, None],
                                0.0, tp[:, :, 1])
        else:
            t_masked = tp[:, :, 1]

        k_low = num_read - fr - step_i
        if (k_low < kk and not finish_read
                and t_masked[0, max(k_low, 0)] < 0.5):
            num_read += 1
            continue
        if (k_low < kk and not src_finished and not return_read_flag
                and finish_read and t_masked[0, max(k_low, 0)] < 0.5):
            return_read_flag = True

        ok = t_masked >= 0.5                             # [B, K]
        sel = np.where(ok.any(1), ok.argmax(1), 0)       # first True (`:486`)
        row_lp = np.take_along_axis(lp, sel[:, None, None].repeat(
            lp.shape[2], 2), axis=1)[:, 0]               # [B, V]

        read_now = np.maximum(
            np.full((bsz,), num_read, np.int32),
            reads[:, n_reads - 1] if n_reads > 0
            else np.zeros((bsz,), np.int32))
        row_lp[:, pad] = -np.inf
        if return_read_flag:
            keep = row_lp[:, eos].copy()
            row_lp[:] = -np.inf
            row_lp[:, eos] = keep
        if step_i < min_len:
            row_lp[:, eos] = -np.inf
        if step_i >= max_len:
            keep = row_lp[:, eos].copy()
            row_lp[:] = -np.inf
            row_lp[:, eos] = keep

        cand = scores[:, None] + row_lp
        flat = cand.reshape(-1)
        top = np.argsort(-flat)[: 2 * bsz]
        new_rows = []
        for f in top:
            b, t = divmod(int(f), row_lp.shape[1])
            sc = flat[f]
            if not np.isfinite(sc):
                continue
            if t == eos:
                norm = sc / float((step_i + 1) ** len_penalty)
                finalized.append((norm, tokens[b, 1:step_i + 1].tolist(),
                                  reads[b, :n_reads].tolist()))
            elif len(new_rows) < bsz:
                new_rows.append((b, t, sc))
        if len(finalized) >= bsz or not new_rows:
            break
        order = np.asarray([b for b, _, _ in new_rows], np.int32)
        tokens = tokens[order]
        tokens[:, step_i + 1] = [t for _, t, _ in new_rows]
        reads = reads[order]
        reads[:, n_reads] = read_now[order]
        n_reads += 1
        scores = np.asarray([sc for _, _, sc in new_rows], np.float64)
        if len(new_rows) < bsz:
            k = bsz - len(new_rows)
            tokens = np.concatenate([tokens, tokens[-1:].repeat(k, 0)], 0)
            reads = np.concatenate([reads, reads[-1:].repeat(k, 0)], 0)
            scores = np.concatenate([scores, np.full((k,), -np.inf)])
        step_i += 1

    finalized.sort(key=lambda x: -x[0])
    out = [(toks, float(sc), rd) for sc, toks, rd in finalized[:bsz]]
    return out, return_read_flag, num_read


@AGENTS.register("hmt_text_beam")
class HMTSimBeamAgent(HMTAgent):
    """Simultaneous HMT agent with BEAM decoding — the quality path between
    the greedy sim agent and the offline beam: each policy call re-runs the
    sim beam over the available source with the committed hypothesis as the
    beam prefix; tokens decoded before the generator demanded more source
    are committed and written (`agent/mt/hmt_sim_sequence_generator.py`
    semantics; READ surfaces as return_read_flag)."""

    def __init__(self, model, variables, src_dict, tgt_dict,
                 beam_size: int = 5, max_len: int = 100):
        super().__init__(model, variables, src_dict, tgt_dict,
                         max_len=max_len)
        self.beam_size = beam_size

    def reset(self):
        super().reset()
        self._num_read = 1

    def policy(self):
        from streamspeech_tpu.agents.base import (ReadAction, TextSegment,
                                                  WriteAction)

        finished = self.states.source_finished
        src_ids = [self.src_dict.index(w) for w in self.states.source] or \
            [self.src_dict.eos()]
        out, need_read, self._num_read = hmt_sim_beam_generate(
            self.model, self.variables, src_ids, finished,
            prefix_tokens=list(self.hyp), num_read_start=self._num_read,
            beam_size=self.beam_size, max_len=self.max_len,
            eos=self.tgt_dict.eos())
        if not out:
            if finished:
                self.states.target_finished = True
                return WriteAction(TextSegment(content="", finished=True),
                                   finished=True)
            return ReadAction()
        toks = out[0][0]
        new = toks[len(self.hyp):]
        if need_read and not finished:
            if not new:
                return ReadAction()
            self.hyp.extend(new)
            return WriteAction(TextSegment(
                content=" ".join(self.tgt_dict[t] for t in new),
                finished=False), finished=False)
        # finalized naturally (EOS with the available source)
        self.hyp.extend(new)
        done = finished
        if done:
            self.states.target_finished = True
        return WriteAction(TextSegment(
            content=" ".join(self.tgt_dict[t] for t in new),
            finished=done), finished=done)
