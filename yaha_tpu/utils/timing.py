"""Per-stage timing/observability (Timing.inl analog).

The reference gates rusage-based phase timers behind TIMING
(Timing.inl:66-106, Query.c:504-517).  Here: lightweight wall-clock stage
timers with percentage reporting, plus an optional jax.profiler trace
context for device work.
"""
from __future__ import annotations

import contextlib
import time


class StageTimers:
    """Accumulating named timers; print_report mirrors the reference's
    per-phase percentage summary (Query.c:510-516)."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self._start = time.perf_counter()

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = (self.totals.get(name, 0.0) +
                                 time.perf_counter() - t0)

    def print_report(self, out=None) -> None:
        import sys
        out = out or sys.stderr
        total = time.perf_counter() - self._start
        for name, secs in self.totals.items():
            pct = 100.0 * secs / total if total > 0 else 0.0
            print("%-42s %8.3fs (%5.1f%%)" % (name + " took:", secs, pct),
                  file=out)
        print("%-42s %8.3fs" % ("total:", total), file=out)


@contextlib.contextmanager
def device_trace(log_dir: str | None):
    """jax.profiler trace wrapper; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax
    with jax.profiler.trace(log_dir):
        yield
