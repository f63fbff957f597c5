"""Tracing / profiling utilities.

The reference has no tracing at all (SURVEY.md §5: "no timers, counters, or
trace spans anywhere").  This framework provides:

* ``span`` — a context-manager wall-clock timer tree, collected into a
  report (host-side stages: decode, device step, eval).
* ``trace`` — wraps ``jax.profiler.trace`` to dump an XLA/TPU trace viewable
  in TensorBoard/Perfetto, when a directory is given.
* ``realtime_factor`` — the framework's headline derived metric.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Iterator, Optional

import jax


class Profiler:
    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = ["profile:"]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(
                f"  {name:30s} {self.totals[name]*1000:9.1f} ms  (n={self.counts[name]})"
            )
        return "\n".join(lines)


PROFILER = Profiler()
span = PROFILER.span


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture an XLA device trace into ``log_dir`` (no-op when None)."""
    if log_dir is None:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


def realtime_factor(audio_seconds: float, wall_seconds: float) -> float:
    return audio_seconds / wall_seconds if wall_seconds > 0 else float("inf")
