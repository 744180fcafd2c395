"""Structured per-stage metrics (SURVEY.md §5.5 rebuild goal).

The reference logs only coarse wall-clock deltas (SVision:292-294,326-328).
Here every stage reports counters + throughput; `Metrics.summary()` renders
one log block and `to_json` feeds dashboards/bench harnesses.
"""

from __future__ import annotations

import json
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict


class Metrics:
    def __init__(self):
        self.counters: Dict[str, float] = defaultdict(float)
        self.timers: Dict[str, float] = defaultdict(float)

    def count(self, name: str, n: float = 1) -> None:
        self.counters[name] += n

    @contextmanager
    def timer(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.timers[name] += time.perf_counter() - t0

    def rate(self, counter: str, timer: str) -> float:
        dt = self.timers.get(timer, 0.0)
        return self.counters.get(counter, 0.0) / dt if dt > 0 else 0.0

    def summary(self) -> str:
        lines = ["-- metrics --"]
        for k in sorted(self.counters):
            lines.append(f"  {k}: {int(self.counters[k])}")
        for k in sorted(self.timers):
            lines.append(f"  {k}: {self.timers[k]:.2f}s")
        for c, t in (("reads", "collect"), ("images", "predict")):
            if c in self.counters and t in self.timers:
                lines.append(f"  {c}/s: {self.rate(c, t):.1f}")
        return "\n".join(lines)

    def to_json(self) -> str:
        return json.dumps({"counters": dict(self.counters),
                           "timers": dict(self.timers)})


