"""Minimal registries for models / tasks / criterions / agents.

The reference wires plugins into global registries via ``@register_model`` etc.
(`/root/reference/fairseq/fairseq/models/__init__.py`). We keep the same extension
surface with a tiny generic Registry; no dynamic --user-dir import machinery is
needed because everything lives in one package, but ``Registry.register`` keeps
third-party extension possible.
"""

from __future__ import annotations

from typing import Callable, Dict, Generic, TypeVar

T = TypeVar("T")


class Registry(Generic[T]):
    def __init__(self, kind: str):
        self.kind = kind
        self._items: Dict[str, T] = {}

    def register(self, name: str) -> Callable[[T], T]:
        def deco(obj: T) -> T:
            if name in self._items:
                raise ValueError(f"{self.kind} '{name}' already registered")
            self._items[name] = obj
            return obj

        return deco

    def get(self, name: str) -> T:
        if name not in self._items:
            raise KeyError(
                f"unknown {self.kind} '{name}'; available: {sorted(self._items)}"
            )
        return self._items[name]

    def __contains__(self, name: str) -> bool:
        return name in self._items

    def names(self):
        return sorted(self._items)


MODELS: Registry = Registry("model")
ARCHS: Registry = Registry("arch")
TASKS: Registry = Registry("task")
CRITERIONS: Registry = Registry("criterion")
AGENTS: Registry = Registry("agent")
LATENCY_SCORERS: Registry = Registry("latency_scorer")
QUALITY_SCORERS: Registry = Registry("quality_scorer")
LR_SCHEDULERS: Registry = Registry("lr_scheduler")
