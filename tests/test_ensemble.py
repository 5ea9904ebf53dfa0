"""Ensemble decoding (fairseq EnsembleModel semantics,
`fairseq/fairseq/sequence_generator.py:744-850`): per-step log-probs averaged
in probability space over N members; CTC heads averaged the same way.

Key properties (VERDICT r3 item 10's done-bar):
- an ensemble of two IDENTICAL checkpoints decodes exactly like the single
  model (logsumexp of identical probs minus log 2 is the identity);
- differing checkpoints change scores, and the ensemble step is the true
  prob-space average of the members' steps.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamspeech_tpu.generation import (EnsembleGenerator, OfflineGenerator,
                                         stack_variables)
from streamspeech_tpu.models.layers import KVCache
from streamspeech_tpu.models.streamspeech import StreamSpeechModel, init_params
from streamspeech_tpu.train.synthetic import tiny_config


def doctor(variables):
    """Zero the MT/unit special-token embedding rows so EOS/PAD rarely argmax
    — an undoctored tiny random model decodes the empty sequence and the
    exactness assertions below would be vacuous (CLAUDE.md; same trick as
    tests/test_batched_eval.py::doctor_params)."""
    p = variables["params"]
    p["mt_decoder"]["embed_tokens"] = \
        p["mt_decoder"]["embed_tokens"].at[:4].set(0.0)
    p["unit_decoder"]["embed_tokens"] = \
        p["unit_decoder"]["embed_tokens"].at[:4].set(0.0).at[-1].set(0.0)
    return variables


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    model = StreamSpeechModel(cfg)
    va = doctor(init_params(model, jax.random.PRNGKey(0)))
    vb = doctor(init_params(model, jax.random.PRNGKey(7)))
    return cfg, model, va, vb


def test_identical_members_match_single(setup):
    cfg, model, va, _ = setup
    rng = np.random.RandomState(3)
    feats = rng.randn(64, 80).astype(np.float32)
    single = OfflineGenerator(model, va, beam=2, max_len=8).generate(feats)
    assert single["mt_tokens"], "vacuous: doctored model must emit MT tokens"
    ens = EnsembleGenerator(model, [va, va], beam=2, max_len=8).generate(feats)
    assert ens["mt_tokens"] == single["mt_tokens"]
    assert ens["asr_tokens"] == single["asr_tokens"]
    assert ens["st_tokens"] == single["st_tokens"]
    assert ens["units"] == single["units"]
    assert ens["mt_score"] == pytest.approx(single["mt_score"], abs=1e-4)


def test_differing_members_change_scores(setup):
    cfg, model, va, vb = setup
    rng = np.random.RandomState(4)
    feats = rng.randn(64, 80).astype(np.float32)
    sa = OfflineGenerator(model, va, beam=2, max_len=8).generate(feats)
    sb = OfflineGenerator(model, vb, beam=2, max_len=8).generate(feats)
    ens = EnsembleGenerator(model, [va, vb], beam=2, max_len=8).generate(feats)
    assert ens["mt_score"] != pytest.approx(sa["mt_score"], abs=1e-9)
    assert ens["mt_score"] != pytest.approx(sb["mt_score"], abs=1e-9)


def test_step_is_prob_space_average(setup):
    """The ensemble's first MT step must equal logsumexp(members) - log N —
    checked against the members' own jitted steps on identical fresh caches."""
    cfg, model, va, vb = setup
    rng = np.random.RandomState(5)
    feats = rng.randn(64, 80).astype(np.float32)
    t = feats.shape[0]
    src = feats[None]
    lens = np.asarray([t], np.int32)

    def first_lp(gen, variables):
        enc, enc_len, _, _ = gen._encode(
            gen.variables, jnp.asarray(src), jnp.asarray(lens),
            chunk=99999, conv_chunk=99999)
        c = model.cfg.mt_decoder
        h, dh = c.attention_heads, c.embed_dim // c.attention_heads
        self_c = gen._make_caches(1, 8, h, dh, c.layers)
        cross = gen._make_caches(1, enc.shape[-2], h, dh, c.layers)
        cross = gen._fill_cross(gen.variables, enc, cross)
        cross = [kv.truncate(jnp.asarray(int(enc_len[0]), jnp.int32))
                 for kv in cross]
        lp, _ = gen._mt_step(gen.variables, jnp.asarray([[2]], np.int32),
                             jnp.asarray(0, jnp.int32), self_c, cross)
        return np.asarray(lp, np.float64)

    ga = OfflineGenerator(model, va, beam=1, max_len=8)
    gb = OfflineGenerator(model, vb, beam=1, max_len=8)
    ge = EnsembleGenerator(model, [va, vb], beam=1, max_len=8)
    lpa, lpb, lpe = first_lp(ga, va), first_lp(gb, vb), first_lp(ge, None)
    want = np.logaddexp(lpa, lpb) - np.log(2.0)
    np.testing.assert_allclose(lpe, want, atol=2e-5)
    # averaging in prob space, not logit space: must differ from the mean
    assert not np.allclose(lpe, (lpa + lpb) / 2, atol=1e-3)


def test_stack_variables_rejects_mismatch(setup):
    cfg, model, va, _ = setup
    other = StreamSpeechModel(tiny_config(vocab_text=40))
    vo = init_params(other, jax.random.PRNGKey(1))
    # same tree structure but different leaf shapes -> stack raises ValueError
    with pytest.raises(ValueError):
        stack_variables([va, vo])


def test_batch_greedy_falls_back_to_beam_path(setup):
    cfg, model, va, vb = setup
    rng = np.random.RandomState(6)
    feats = [rng.randn(64, 80).astype(np.float32),
             rng.randn(48, 80).astype(np.float32)]
    ge = EnsembleGenerator(model, [va, vb], beam=1, max_len=8)
    outs = ge.generate_batch_greedy(feats, max_tokens=8)
    for f, got in zip(feats, outs):
        single = ge.generate(f)
        assert got["mt_tokens"] == single["mt_tokens"]
