"""Wait-k baseline agents (fixed policies).

Behavioral reference: `agent/speech_to_speech.wait-k-stride-n.agent.py:101,358`
and `agent/speech_to_text.wait-k-stride-n.agent.py`: instead of the CTC-driven
policy, READ until k source chunks have arrived, then WRITE n target tokens per
new chunk (stride-n). The model path (encoder → MT decoder → T2U → units →
vocoder) is identical to the StreamSpeech agents; only the READ/WRITE rule
differs.
"""

from __future__ import annotations

from typing import List

from streamspeech_tpu.agents.base import (
    ReadAction,
    SpeechSegment,
    SpeechToSpeechAgent,
    SpeechToTextAgent,
    TextSegment,
    WriteAction,
)
from streamspeech_tpu.agents.streamspeech import (
    SAMPLE_RATE,
    StreamSpeechAgentConfig,
    _StreamSpeechAgentBase,
    spm_text,
)
from streamspeech_tpu.registry import AGENTS


@AGENTS.register("waitk_s2tt")
class WaitkS2TTAgent(_StreamSpeechAgentBase, SpeechToTextAgent):
    """After k chunks, emit stride_n tokens per newly-read chunk."""

    def __init__(self, engine, cfg: StreamSpeechAgentConfig, src_dict, tgt_dict,
                 gcmvn=None, waitk: int = 3):
        _StreamSpeechAgentBase.__init__(self, engine, cfg, src_dict, tgt_dict,
                                        gcmvn)
        self.waitk = waitk
        SpeechToTextAgent.__init__(self)

    def reset(self):
        super().reset()
        self.reset_stream()
        self.chunks_read = 0
        self.emitted_text = ""

    def policy(self):
        cfg = self.cfg
        finished = self.states.source_finished
        self.ingest(self.states)
        self.chunks_read += 1
        if not finished and self.chunks_read < self.waitk:
            return ReadAction()
        if self.session.enc_len == 0:
            if finished:
                self.states.target_finished = True
                return WriteAction(TextSegment(content="", finished=True),
                                   finished=True)
            return ReadAction()
        allowed = (self.chunks_read - self.waitk + 1) * cfg.stride_n
        budget = -1 if finished else allowed - len(self.session.mt_tokens)
        if budget == 0 and not finished:
            return ReadAction()
        prev = list(self.session.mt_tokens)
        self.session.mt_decode(budget, max_len=cfg.max_len)
        if self.session.mt_tokens == prev and not finished:
            return ReadAction()
        full = spm_text(self.tgt_dict, self.session.mt_tokens)
        new = full[len(self.emitted_text):].strip() \
            if full.startswith(self.emitted_text) else full
        self.emitted_text = full
        if not new and not finished:
            return ReadAction()
        if finished:
            self.states.target_finished = True
        return WriteAction(TextSegment(content=new, finished=finished),
                           finished=finished)


@AGENTS.register("waitk_s2st")
class WaitkS2STAgent(_StreamSpeechAgentBase, SpeechToSpeechAgent):
    def __init__(self, engine, cfg: StreamSpeechAgentConfig, src_dict, tgt_dict,
                 unit_dict, gcmvn=None, waitk: int = 3):
        _StreamSpeechAgentBase.__init__(self, engine, cfg, src_dict, tgt_dict,
                                        gcmvn)
        self.unit_dict = unit_dict
        self.unit_blank = unit_dict.blank()
        self.waitk = waitk
        SpeechToSpeechAgent.__init__(self)

    def reset(self):
        super().reset()
        self.reset_stream()
        self.chunks_read = 0
        self.units: List[int] = []

    def _final(self):
        self.states.target_finished = True
        return WriteAction(SpeechSegment(content=[], sample_rate=SAMPLE_RATE,
                                         finished=True), finished=True)

    def policy(self):
        cfg = self.cfg
        finished = self.states.source_finished
        self.ingest(self.states)
        self.chunks_read += 1
        if not finished and self.chunks_read < self.waitk:
            return ReadAction()
        if self.session.enc_len == 0:
            return self._final() if finished else ReadAction()
        allowed = (self.chunks_read - self.waitk + 1) * cfg.stride_n
        budget = -1 if finished else allowed - len(self.session.mt_tokens)
        if budget == 0 and not finished:
            return ReadAction()
        prev = list(self.session.mt_tokens)
        self.session.mt_decode(budget, max_len=cfg.max_len)
        if self.session.mt_tokens == prev and not finished:
            return ReadAction()
        units, wav, dur = self.session.emit()
        cur = units[len(self.units):]
        if not cur:
            return self._final() if finished else ReadAction()
        cur_len = int(dur[-len(cur):].sum()) * 320
        new_wav = wav[len(wav) - cur_len:] if cur_len else wav[:0]
        self.units = units
        if finished:
            self.states.target_finished = True
        return WriteAction(SpeechSegment(content=new_wav.tolist(),
                                         sample_rate=SAMPLE_RATE,
                                         finished=finished), finished=finished)
