"""Stage timing + throughput metrics (SURVEY §5.1/§5.5 obligations).

The reference has only a dead *stats* table and commented format traces
(deflate.lisp:74,91). Here: a lightweight stage timer that aggregates
bytes/second per pipeline stage, and an optional jax.profiler trace
context for device timelines.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from dataclasses import dataclass, field


@dataclass
class StageStats:
    calls: int = 0
    seconds: float = 0.0
    bytes: int = 0

    @property
    def gbps(self) -> float:
        return self.bytes / self.seconds / 1e9 if self.seconds else 0.0


@dataclass
class Metrics:
    stages: dict = field(default_factory=lambda: defaultdict(StageStats))

    @contextlib.contextmanager
    def stage(self, name: str, nbytes: int = 0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            s = self.stages[name]
            s.calls += 1
            s.seconds += time.perf_counter() - t0
            s.bytes += nbytes

    def report(self) -> str:
        lines = []
        for name, s in sorted(self.stages.items()):
            lines.append(f"{name:24s} {s.calls:6d} calls "
                         f"{s.seconds * 1000:9.1f} ms "
                         f"{s.gbps:7.2f} GB/s")
        return "\n".join(lines)

    def reset(self) -> None:
        self.stages.clear()


metrics = Metrics()


@contextlib.contextmanager
def device_trace(trace_dir: str | None):
    """jax.profiler trace around a region (no-op when trace_dir None)."""
    if not trace_dir:
        yield
        return
    import jax
    with jax.profiler.trace(trace_dir):
        yield
