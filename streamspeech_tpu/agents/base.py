"""Streaming agent protocol: segments, actions, states, agent ABC, pipeline.

API-compatible rebuild of the SimulEval agent surface so policies written against
the reference port directly:
- Segment dataclasses (`SimulEval/simuleval/data/segments.py:11-52`)
- ReadAction/WriteAction (`simuleval/agents/actions.py`)
- AgentStates (`simuleval/agents/states.py`)
- GenericAgent with policy()/push/pop/pushpop and typed subclasses
  (`simuleval/agents/agent.py:18-216`)
- AgentPipeline with source/target type checking (`simuleval/agents/pipeline.py:12`)
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, List, Optional


@dataclass
class Segment:
    index: int = 0
    content: Any = None
    sample_rate: int = -1
    finished: bool = False
    is_empty: bool = False
    data_type: str = ""
    # source position (ms) at which the emitting DECISION was made. Set by
    # the overlapped (pipelined) runtime, where the host observes a chunk's
    # write a few calls after it was decided: non-computation-aware delays
    # are algorithmic stream positions, so they use the decision point
    # (identical to the synchronous path — asserted by
    # tests/test_pipelined_policy.py); the `_CA` twins keep wall-clock at
    # observation. None = use the evaluator's current position (sync path).
    decision_ms: Any = None

    def json(self) -> str:
        return json.dumps({
            "index": self.index, "content": self.content,
            "sample_rate": self.sample_rate, "finished": self.finished,
            "is_empty": self.is_empty, "data_type": self.data_type,
        }, default=float)  # numpy scalars in speech content serialize as floats

    @classmethod
    def from_json(cls, s: str) -> "Segment":
        d = json.loads(s)
        dt = d.get("data_type", "")
        klass = {"text": TextSegment, "speech": SpeechSegment}.get(dt, cls)
        if d.get("is_empty"):
            klass = EmptySegment
        return klass(**{k: v for k, v in d.items() if k in klass.__dataclass_fields__})


@dataclass
class EmptySegment(Segment):
    is_empty: bool = True


@dataclass
class TextSegment(Segment):
    content: str = ""
    data_type: str = "text"


@dataclass
class SpeechSegment(Segment):
    content: List[float] = field(default_factory=list)
    sample_rate: int = 16000
    data_type: str = "speech"


class Action:
    def is_read(self) -> bool:
        raise NotImplementedError


class ReadAction(Action):
    def is_read(self) -> bool:
        return True


class WriteAction(Action):
    def __init__(self, content: Any, finished: bool = False):
        self.content = content
        self.finished = finished

    def is_read(self) -> bool:
        return False


class AgentStates:
    """Incremental source/target bookkeeping (`simuleval/agents/states.py`)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.source: List[Any] = []
        self.target: List[Any] = []
        self.source_sample_rate = 0
        self.target_sample_rate = 0
        self.source_finished = False
        self.target_finished = False

    def update_source(self, segment: Segment):
        self.source_finished = segment.finished
        if segment.is_empty:
            return
        if segment.data_type == "speech":
            self.source_sample_rate = segment.sample_rate
            self.source += segment.content
        else:
            self.source.append(segment.content)

    def update_target(self, segment: Segment):
        self.target_finished = segment.finished
        if segment.is_empty:
            return
        if segment.data_type == "speech":
            self.target_sample_rate = segment.sample_rate
            self.target += segment.content
        else:
            self.target.append(segment.content)


class GenericAgent:
    source_type: Optional[str] = None
    target_type: Optional[str] = None

    def __init__(self, args=None):
        self.args = args
        self.states = self.build_states()
        self.reset()

    def build_states(self) -> AgentStates:
        return AgentStates()

    def reset(self) -> None:
        self.states.reset()

    def policy(self) -> Action:
        raise NotImplementedError

    @classmethod
    def add_args(cls, parser) -> None:
        pass

    @classmethod
    def from_args(cls, args) -> "GenericAgent":
        return cls(args)

    def push(self, source_segment: Segment) -> None:
        """Receive a new source segment (no output)."""
        self.states.update_source(source_segment)

    def pop(self) -> Segment:
        """Run the policy once; return a (possibly empty) target segment."""
        action = self.policy()
        if action.is_read():
            return EmptySegment(finished=self.states.target_finished)
        segment = (action.content if isinstance(action.content, Segment)
                   else self._wrap(action.content, action.finished))
        if isinstance(action.content, Segment):
            segment.finished = segment.finished or action.finished
        self.states.update_target(segment)
        return segment

    def _wrap(self, content, finished) -> Segment:
        if self.target_type == "speech":
            return SpeechSegment(content=content, finished=finished)
        return TextSegment(content=content, finished=finished)

    def pushpop(self, segment: Segment) -> Segment:
        self.push(segment)
        return self.pop()


class SpeechToSpeechAgent(GenericAgent):
    source_type = "speech"
    target_type = "speech"


class SpeechToTextAgent(GenericAgent):
    source_type = "speech"
    target_type = "text"


class TextToSpeechAgent(GenericAgent):
    source_type = "text"
    target_type = "speech"


class TextToTextAgent(GenericAgent):
    source_type = "text"
    target_type = "text"


class AgentPipeline:
    """Chain agents with type checking (`simuleval/agents/pipeline.py:12`)."""

    def __init__(self, agents: List[GenericAgent]):
        assert agents, "empty pipeline"
        for a, b in zip(agents, agents[1:]):
            if a.target_type != b.source_type:
                raise ValueError(
                    f"pipeline type mismatch: {type(a).__name__} outputs "
                    f"{a.target_type}, {type(b).__name__} expects {b.source_type}")
        self.agents = agents

    @property
    def source_type(self):
        return self.agents[0].source_type

    @property
    def target_type(self):
        return self.agents[-1].target_type

    def reset(self):
        for a in self.agents:
            a.reset()

    def push(self, segment: Segment) -> None:
        for a in self.agents[:-1]:
            segment = a.pushpop(segment)
        self.agents[-1].push(segment)

    def pop(self) -> Segment:
        return self.agents[-1].pop()

    def pushpop(self, segment: Segment) -> Segment:
        self.push(segment)
        return self.pop()

    @property
    def states(self):
        return self.agents[-1].states
