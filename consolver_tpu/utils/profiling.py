"""Profiling hooks: jax.profiler traces + per-phase step timing.

The reference has no tracing at all (SURVEY.md section 5: "Tracing /
profiling: none"); this adds the TPU-native instrumentation the framework
is expected to ship with.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace context; no-op when log_dir is None.  Open the
    result with tensorboard or xprof."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-phase timing with running means.

    Note: on asynchronous backends wrap the timed region so it ends with a
    host read (see .claude/skills/verify/SKILL.md) or the timings measure
    dispatch only.
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        start = time.perf_counter()
        try:
            yield
        finally:
            elapsed = time.perf_counter() - start
            self.totals[name] = self.totals.get(name, 0.0) + elapsed
            self.counts[name] = self.counts.get(name, 0) + 1

    def means(self) -> Dict[str, float]:
        return {k: self.totals[k] / self.counts[k] for k in self.totals}

    def annotate(self, name: str):
        """Device-side named region (shows up in profiler traces)."""
        return jax.named_scope(name)
