"""Hierarchical named timers.

Rebuild of the reference's voxblox-derived timing utility
(include/orb_slam/utils/timing.h: `timing::Timer`/`Timing` with rolling
windows and a printable table).  Tags mirror the reference instrumentation
(tracking/frame, tracking/dust, tracking/local_map, extraction, mapping/*).
"""

from __future__ import annotations

import time
from collections import deque
from contextlib import contextmanager
from typing import Dict


class _Accumulator:
    """Rolling-window stats (reference windows 50 samples, timing.h:19-93)."""

    def __init__(self, window: int = 50):
        self.samples = deque(maxlen=window)
        self.total = 0.0
        self.count = 0

    def add(self, dt: float) -> None:
        self.samples.append(dt)
        self.total += dt
        self.count += 1

    @property
    def mean(self) -> float:
        return sum(self.samples) / len(self.samples) if self.samples else 0.0


class Timer:
    def __init__(self):
        self.tags: Dict[str, _Accumulator] = {}

    @contextmanager
    def span(self, tag: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.tags.setdefault(tag, _Accumulator()).add(
                time.perf_counter() - t0)

    def table(self) -> str:
        lines = ["tag                          total      n     mean[ms]"]
        for tag in sorted(self.tags):
            a = self.tags[tag]
            lines.append(f"{tag:<28} {a.total:8.2f} {a.count:6d} "
                         f"{a.mean * 1000:10.2f}")
        return "\n".join(lines)
