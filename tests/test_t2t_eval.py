"""Text-to-text evaluation path (VERDICT r1 Missing #3 / Next #4): the wait-k
and HMT text agents wired through SentenceLevelEvaluator with token-unit
latency, plus the t2t CLI."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamspeech_tpu.config import DecoderConfig
from streamspeech_tpu.dictionary import Dictionary
from streamspeech_tpu.eval.evaluator import SentenceLevelEvaluator
from streamspeech_tpu.eval.instance import TextToTextInstance


def tiny_dec(vocab):
    return DecoderConfig(vocab_size=vocab, embed_dim=32, ffn_embed_dim=64,
                         layers=2, attention_heads=2)


def make_dict(words):
    d = Dictionary()
    for w in words:
        d.add_symbol(w)
    return d


SRC = ["a b c d e f", "b c a a"]
REF = ["x y z w", "y x"]


@pytest.fixture(scope="module")
def dicts():
    return (make_dict("a b c d e f".split()), make_dict("x y z w".split()))


def test_text_instance_send_and_delays():
    ins = TextToTextInstance(0, "a b c", "x y")
    segs = [ins.send_source(), ins.send_source(), ins.send_source(),
            ins.send_source()]
    assert [s.content for s in segs[:3]] == ["a", "b", "c"]
    assert segs[2].finished and segs[3].is_empty
    assert ins.source_length == 3
    assert ins.step_to_delay() == 3  # tokens, not ms


def test_waitk_text_agent_through_evaluator(dicts, tmp_path):
    from streamspeech_tpu.models.text_mt import TextMTModel, WaitkTextAgent

    src_dict, tgt_dict = dicts
    model = TextMTModel(len(src_dict), tiny_dec(len(tgt_dict)),
                        encoder_layers=2)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.full((1, 8), 4, jnp.int32),
                           jnp.full((1, 4), 4, jnp.int32))
    agent = WaitkTextAgent(model, variables, src_dict, tgt_dict, waitk=2,
                           max_len=8)
    ev = SentenceLevelEvaluator(agent, quality_metrics=["BLEU"],
                                output_dir=str(tmp_path))
    scores = ev(SRC, REF)
    assert "AL" in scores and "AP" in scores
    for i, ins in ev.instances.items():
        assert isinstance(ins, TextToTextInstance)
        assert ins.finish_prediction
        assert len(ins.delays) >= 1, "wait-k must emit tokens"
        # token-unit delays: bounded by the source token count, k ≤ first delay
        assert all(1 <= d <= ins.source_length for d in ins.delays)
        assert ins.delays[0] >= 2
    assert np.isfinite(scores["AL"])
    # AP > 1 is legitimate when the hypothesis over-generates vs the reference
    assert scores["AP"] > 0


def test_hmt_agent_through_evaluator(dicts):
    from streamspeech_tpu.models.hmt import HMTAgent, HMTModel

    src_dict, tgt_dict = dicts
    model = HMTModel(len(src_dict), tiny_dec(len(tgt_dict)), encoder_layers=2,
                     first_read=2, cands_per_token=3)
    variables = model.init(jax.random.PRNGKey(1),
                           jnp.full((1, 8), 4, jnp.int32),
                           jnp.full((1,), 8, jnp.int32),
                           jnp.full((1, 4), 4, jnp.int32))
    # doctor: zero special-token embedding rows so random argmax is not EOS
    # (vacuity guard, same trick as tests/test_batched_eval.doctor_params)
    emb = variables["params"]["decoder"]["embed_tokens"]
    variables["params"]["decoder"]["embed_tokens"] = emb.at[:4].set(0.0)
    agent = HMTAgent(model, variables, src_dict, tgt_dict, max_len=8)
    ev = SentenceLevelEvaluator(agent, quality_metrics=[])
    scores = ev(SRC, REF)
    for ins in ev.instances.values():
        assert ins.finish_prediction
        assert len(ins.delays) >= 1, "HMT agent must emit by finish"
    assert "AL" in scores


def test_t2t_cli(tmp_path):
    """CLI wiring incl. checkpoint loading: build a doctored wait-k text-MT
    checkpoint, evaluate it via the t2t CLI path, check the log schema."""
    import dataclasses

    import json as _json

    from streamspeech_tpu.cli.simuleval import main
    from streamspeech_tpu.config import OptimizationConfig
    from streamspeech_tpu.models.text_mt import TextMTModel
    from streamspeech_tpu.train.checkpoint import save_checkpoint
    from streamspeech_tpu.train.trainer import TrainState, make_optimizer

    src = tmp_path / "src.txt"
    tgt = tmp_path / "tgt.txt"
    src.write_text("\n".join(SRC) + "\n")
    tgt.write_text("\n".join(REF) + "\n")

    # the CLI builds dictionaries from the corpus in reading order — replicate
    src_dict = make_dict([w for line in SRC for w in line.split()])
    tgt_dict = make_dict([w for line in REF for w in line.split()])
    dec = tiny_dec(len(tgt_dict))
    model = TextMTModel(len(src_dict), dec, encoder_layers=2)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.full((1, 8), 4, jnp.int32),
                           jnp.full((1, 4), 4, jnp.int32))
    emb = variables["params"]["decoder"]["embed_tokens"]
    variables["params"]["decoder"]["embed_tokens"] = emb.at[:4].set(0.0)
    ckdir = tmp_path / "ck"
    state = TrainState.create(variables,
                              make_optimizer(OptimizationConfig(update_freq=1)))
    save_checkpoint(str(ckdir), 0, state,
                    config={"decoder": dataclasses.asdict(dec),
                            "encoder_layers": 2})

    out = tmp_path / "out"
    main(["--source", str(src), "--target", str(tgt), "--agent", "t2t-waitk",
          "--waitk", "2", "--checkpoint", str(ckdir / "checkpoint_0"),
          "--output", str(out), "--quality-metrics", "BLEU"])
    log = (out / "instances.log").read_text().splitlines()
    assert len(log) == len(SRC)
    import json

    recs = [json.loads(line) for line in log]
    for i, rec in enumerate(recs):
        assert "delays" in rec and "prediction" in rec
        assert all(d <= len(SRC[i].split()) for d in rec["delays"])
    # wait-k forces emission on at least one instance (k=2 < source lengths)
    assert any(rec["delays"] for rec in recs)
