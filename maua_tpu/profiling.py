"""Profiling + per-stage timing, first-class.

The reference has no formal tracing (SURVEY.md section 5: tqdm bars +
ad-hoc timing harnesses). Rebuild: jax.profiler traces and a
lightweight stage timer whose reports drive perf work.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


class StageTimer:
    """Accumulating wall-clock stage timer with device sync."""

    def __init__(self, sync: bool = True):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.sync = sync

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync:
                try:
                    jax.effects_barrier()
                except Exception:
                    pass
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = ["stage                          total(s)   calls   mean(ms)"]
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:<30} {total:8.3f} {n:7d} {1000 * total / n:10.2f}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/maua_trace"):
    """jax.profiler trace context; view with TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (shows up in XProf timelines)."""
    return jax.profiler.TraceAnnotation(name)
