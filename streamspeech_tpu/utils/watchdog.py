"""Failure detection: heartbeat watchdog + NaN detection helpers.

Equivalent coverage of the reference's failure-detection surface (SURVEY.md §5):
- `DistributedTimeoutWrapper` (`fairseq/fairseq/distributed/distributed_timeout_
  wrapper.py:1-97`) kills hung ranks via a watchdog thread → HeartbeatWatchdog
  here guards the single SPMD process (a hung XLA collective or device makes the
  training loop stop heartbeating).
- `NanDetector` (`fairseq/fairseq/nan_detector.py`) → check_finite_tree walks a
  pytree and names the offending leaves; the train step itself already skips
  non-finite updates (trainer.py overflow path).
"""

from __future__ import annotations

import os
import signal
import threading
import time
from typing import Callable, List, Optional


class HeartbeatWatchdog:
    """Fire ``on_timeout`` (default: SIGKILL self, like the reference) if
    ``beat()`` isn't called within ``timeout`` seconds."""

    def __init__(self, timeout: float, on_timeout: Optional[Callable] = None):
        self.timeout = timeout
        self.on_timeout = on_timeout or self._kill
        self._last = time.monotonic()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def _kill(self):
        os.kill(os.getpid(), signal.SIGKILL)

    def start(self):
        def loop():
            while not self._stop.wait(min(self.timeout / 4, 10.0)):
                if time.monotonic() - self._last > self.timeout:
                    self.on_timeout()
                    return

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()
        return self

    def beat(self):
        self._last = time.monotonic()

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=1.0)

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()


def check_finite_tree(tree, name: str = "tree") -> List[str]:
    """Return the key paths of non-finite leaves (NanDetector equivalent)."""
    import jax
    import numpy as np

    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            bad.append(f"{name}{jax.tree_util.keystr(path)}")
    return bad
