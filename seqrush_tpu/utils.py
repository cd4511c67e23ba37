"""Tracing/observability: structured phase timers and throughput counters.

The reference has only -v eprintln narration (SURVEY.md §5); here every
pipeline phase records wall-clock and counters into a structured report, and
an optional jax profiler trace can bracket the alignment phase.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field


@dataclass
class PhaseTimer:
    phases: dict[str, float] = field(default_factory=dict)
    counters: dict[str, float] = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.phases[name] = self.phases.get(name, 0.0) + time.time() - t0

    def count(self, name: str, value: float = 1.0) -> None:
        self.counters[name] = self.counters.get(name, 0.0) + value

    def rate(self, counter: str, phase: str) -> float:
        dt = self.phases.get(phase, 0.0)
        return self.counters.get(counter, 0.0) / dt if dt > 0 else 0.0

    def report(self) -> dict:
        out = {"phases_s": dict(self.phases), "counters": dict(self.counters)}
        if "alignments" in self.counters and "align" in self.phases:
            out["alignments_per_s"] = self.rate("alignments", "align")
        return out

    def __str__(self) -> str:
        return json.dumps(self.report(), indent=2)


@contextlib.contextmanager
def jax_trace(log_dir: str | None):
    """Bracket a block with a jax profiler trace when log_dir is given."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
