"""READ/WRITE policy exactness: the repo's S2ST agent vs a pure-python port of
the reference policy (`agent/speech_to_speech.streamspeech.agent.py:480-770`),
both fed IDENTICAL scripted CTC-hypothesis streams and a deterministic MT/unit
"model". Any drift in the policy conditions (growth gates, ((len-k1)//n)*n
budget, whole-word rollback, same-prefix READ, empty-unit READ, duration-aware
wav tail) flips an action and fails the sequence comparison. VERDICT r1 Next #6.
"""

import numpy as np
import pytest

from streamspeech_tpu.agents.base import WriteAction
from streamspeech_tpu.agents.streamspeech import (
    StreamSpeechAgentConfig,
    StreamSpeechS2STAgent,
)
from streamspeech_tpu.dictionary import Dictionary


# ---------------------------------------------------------------------------
# deterministic scripted "model"
# ---------------------------------------------------------------------------


def units_for_token(tok: int):
    """Each MT token deterministically contributes 1-2 pseudo-units."""
    return [50 + (tok % 7)] * (1 + tok % 2)


def dur_for_units(units):
    return np.asarray([1 + (u % 3) for u in units], np.int64)


class FakeSession:
    """Presents scripted per-chunk CTC hypotheses and a deterministic greedy MT
    continuation (`target` plays the argmax path; 2 = EOS stops decoding)."""

    def __init__(self, script, target):
        self.script = script      # list of (asr_tokens, st_tokens)
        self.i = -1
        self.mt = []
        self.target = list(target)

    @property
    def enc_len(self):
        return (self.i + 1) * 8

    @property
    def mt_tokens(self):
        return list(self.mt)

    def advance(self):
        self.i = min(self.i + 1, len(self.script) - 1)

    def ctc_hypotheses(self):
        asr, st = self.script[self.i]
        return {"asr": (list(asr), None), "st": (list(st), None)}

    def mt_decode(self, budget, max_len=200):
        n = len(self.mt)
        budget = max_len if budget == -1 else budget
        for t in self.target[n:n + budget]:
            if t == 2:
                break
            self.mt.append(t)

    def mt_truncate(self, j):
        self.mt = self.mt[:j]

    def emit(self):
        units = []
        for tok in self.mt:
            units += units_for_token(tok)
        dur = dur_for_units(units)
        wav = np.arange(int(dur.sum()) * 320, dtype=np.float32)
        return units, wav, dur

    def emit_tail(self, n_prev):
        units, wav, dur = self.emit()
        new = len(units) - n_prev
        if new <= 0:
            return units, wav[:0], dur
        cur = int(dur[-new:].sum()) * 320
        return units, wav[len(wav) - cur:], dur


class ScriptedS2STAgent(StreamSpeechS2STAgent):
    """The real agent with the device engine swapped for the scripted session
    (one script chunk consumed per policy call)."""

    def __init__(self, make_session, cfg, tgt_dict, unit_dict):
        self._make_session = make_session
        StreamSpeechS2STAgent.__init__(self, engine=None, cfg=cfg,
                                       src_dict=tgt_dict, tgt_dict=tgt_dict,
                                       unit_dict=unit_dict)

    def reset_stream(self):
        self.session = self._make_session()
        self.consumed_samples = 0
        self.src_ctc_prefix_length = 0
        self.tgt_ctc_prefix_length = 0

    def ingest(self, states):
        self.session.advance()
        return self.session.enc_len


# ---------------------------------------------------------------------------
# pure-python port of the REFERENCE policy (agent.py:480-770)
# ---------------------------------------------------------------------------


def reference_policy_trace(script, target, cfg, tgt_dict):
    """Returns the reference agent's action sequence over the scripted stream:
    ("R",) or ("W", n_mt_tokens, n_new_wav_samples, finished)."""
    sess = FakeSession(script, target)  # same deterministic model
    src_len = tgt_len = 0
    prev_emitted_mt = None   # self.tgt_subwords_indices
    prev_prev_output = None  # self.prev_output_tokens_mt (len incl. lead eos)
    unit = None
    unfinished_wav = None
    trace = []
    n_chunks = len(script)

    def final_write():
        return ("W", len(sess.mt), 0 if unfinished_wav is None
                else len(unfinished_wav), True)

    for step in range(n_chunks):
        sess.advance()
        finished = step == n_chunks - 1
        asr, st = script[sess.i]
        if not finished:
            # agent.py:485-494 growth gates
            if (len(asr) < src_len + cfg.stride_n
                    or len(st) < tgt_len + cfg.stride_n):
                trace.append(("R",))
                continue
            src_len = max(len(asr), src_len)
            tgt_len = max(len(st), tgt_len)
            subword_tokens = ((len(st) - cfg.lagging_k1)
                              // cfg.stride_n) * cfg.stride_n
            if cfg.whole_word:
                subword_tokens += 1
            cur = len(prev_emitted_mt) if prev_emitted_mt is not None else 0
            new_subword_tokens = subword_tokens - cur
            if new_subword_tokens < 1:
                trace.append(("R",))
                continue
        else:
            new_subword_tokens = -1

        # agent.py:522-536 — MT generation continues from the kept prefix
        sess.mt = list(prev_emitted_mt or [])
        sess.mt_decode(new_subword_tokens, max_len=cfg.max_len)
        tokens = list(sess.mt)

        if cfg.whole_word and not finished:
            # agent.py:542-559 whole-word rollback
            j = 0
            for j in range(len(tokens) - 1, -1, -1):
                if tgt_dict[tokens[j]].startswith("▁"):
                    break
            tokens = tokens[:j]
            if j == 0:
                trace.append(("R",))
                continue

        # agent.py:609-626 same-emission gate
        if prev_emitted_mt is not None and tokens == prev_emitted_mt:
            trace.append(("R",) if not finished else final_write())
            continue
        prev_emitted_mt = list(tokens)

        # agent.py:629-637 prev_output_tokens gate (length incl. leading eos)
        if not finished and prev_prev_output is not None and \
                len(tokens) + 1 <= prev_prev_output:
            trace.append(("R",))
            continue
        prev_prev_output = len(tokens) + 1

        # units (agent.py:688-737)
        sess.mt = list(tokens)
        units, wav, dur = sess.emit()
        cur_unit = units if unit is None else units[len(unit):]
        if len(units) < 1 or len(cur_unit) < 1:
            trace.append(("R",) if not finished else final_write())
            continue
        cur_wav_len = int(dur[-len(cur_unit):].sum()) * 320
        new_wav = wav[len(wav) - cur_wav_len:]
        if unfinished_wav is not None and len(unfinished_wav) > 0:
            new_wav = np.concatenate([unfinished_wav, new_wav])
            unfinished_wav = None
        unit = units
        trace.append(("W", len(tokens), len(new_wav),
                      finished and new_subword_tokens == -1))
    return trace


def agent_trace(script, target, cfg, tgt_dict, unit_dict):
    agent = ScriptedS2STAgent(lambda: FakeSession(script, target), cfg,
                              tgt_dict, unit_dict)
    agent.reset()
    trace = []
    for step in range(len(script)):
        agent.states.source_finished = step == len(script) - 1
        action = agent.policy()
        if isinstance(action, WriteAction):
            trace.append(("W", len(agent.session.mt_tokens),
                          len(action.content.content), action.finished))
        else:
            trace.append(("R",))
    return trace


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def make_tgt_dict(n=40):
    d = Dictionary()
    for i in range(n):
        d.add_symbol(("▁w" if i % 3 != 2 else "sub") + str(i))
    return d


def make_script(rng, n_chunks=12, growth=(0, 1, 2)):
    """Growing CTC hypothesis streams with plateaus (policy READ triggers)."""
    asr, st = [], []
    script = []
    for _ in range(n_chunks):
        asr = asr + [int(rng.randint(4, 30))] * rng.choice(growth)
        st = st + [int(rng.randint(4, 30))] * rng.choice(growth)
        script.append((list(asr), list(st)))
    return script


@pytest.mark.parametrize("whole_word", [False, True])
@pytest.mark.parametrize("k1,n", [(0, 1), (2, 1), (0, 2), (3, 2)])
def test_policy_trace_matches_reference(whole_word, k1, n):
    rng = np.random.RandomState(hash((whole_word, k1, n)) % (2 ** 31))
    tgt_dict = make_tgt_dict()
    unit_dict = Dictionary.units(19)
    unit_dict.add_blank()
    cfg = StreamSpeechAgentConfig(source_segment_size=320, lagging_k1=k1,
                                  stride_n=n, whole_word=whole_word)
    for trial in range(4):
        script = make_script(rng, n_chunks=10 + trial)
        target = [int(rng.randint(4, len(tgt_dict))) for _ in range(25)] + [2]
        ref = reference_policy_trace(script, target, cfg, tgt_dict)
        ours = agent_trace(script, target, cfg, tgt_dict, unit_dict)
        assert ours == ref, (f"trial {trial}\nref : {ref}\nours: {ours}")


def test_policy_trace_nonvacuous():
    """The comparison must contain actual WRITEs with wav payloads."""
    rng = np.random.RandomState(7)
    tgt_dict = make_tgt_dict()
    unit_dict = Dictionary.units(19)
    unit_dict.add_blank()
    cfg = StreamSpeechAgentConfig(source_segment_size=320)
    script = make_script(rng, n_chunks=12, growth=(1, 2))
    target = [int(rng.randint(4, len(tgt_dict))) for _ in range(30)] + [2]
    trace = agent_trace(script, target, cfg, tgt_dict, unit_dict)
    writes = [t for t in trace if t[0] == "W"]
    assert len(writes) >= 2
    assert any(t[2] > 0 for t in writes), "no wav ever emitted"
    assert trace == reference_policy_trace(script, target, cfg, tgt_dict)
