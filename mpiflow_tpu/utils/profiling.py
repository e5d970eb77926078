"""Profiling/tracing hooks (SURVEY.md §5: the reference has none; we add
jax.profiler integration + per-stage wall-clock timing for the generator)."""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


@contextlib.contextmanager
def trace_annotation(name: str):
    """Annotate a region in the XLA/jax profiler timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StageTimer:
    """Accumulates wall-clock per pipeline stage; blocks on device results."""

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.perf_counter()
        yield
        if self.sync and block_on is not None:
            jax.block_until_ready(block_on)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def summary(self) -> Dict[str, dict]:
        return {k: {"total_s": self.totals[k], "count": self.counts[k],
                    "mean_ms": 1e3 * self.totals[k] / max(self.counts[k], 1)}
                for k in sorted(self.totals)}

    def report(self) -> str:
        lines = [f"{k:28s} {v['total_s']:8.3f}s  x{v['count']:<5d} "
                 f"{v['mean_ms']:8.2f} ms/call"
                 for k, v in self.summary().items()]
        return "\n".join(lines)


@contextlib.contextmanager
def device_profile(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
