"""Structured logging + counters (aux subsystem, SURVEY.md §5).

The reference's observability is three printf timers. This is the
structured replacement: leveled logging through Python logging with a
namespaced logger, plus process-local counters/gauges that stages can
bump (keypoint counts, match counts, BA restarts, ...) and a one-call
snapshot for emission into bench/eval reports.
"""

from __future__ import annotations

import collections
import logging
import threading
from typing import Dict

_LOG = logging.getLogger("sift_tpu")


def get_logger(name: str = "") -> logging.Logger:
    return _LOG.getChild(name) if name else _LOG


def configure(level: str = "INFO") -> None:
    """Basic console configuration; safe to call repeatedly."""
    if not _LOG.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s %(message)s"))
        _LOG.addHandler(h)
    _LOG.setLevel(getattr(logging, level.upper(), logging.INFO))


class Counters:
    """Thread-safe named counters/gauges."""

    def __init__(self):
        self._lock = threading.Lock()
        self._counts: Dict[str, float] = collections.defaultdict(float)

    def inc(self, name: str, value: float = 1.0) -> None:
        with self._lock:
            self._counts[name] += value

    def set(self, name: str, value: float) -> None:
        with self._lock:
            self._counts[name] = value

    def snapshot(self) -> Dict[str, float]:
        with self._lock:
            return dict(self._counts)

    def reset(self) -> None:
        with self._lock:
            self._counts.clear()


COUNTERS = Counters()
