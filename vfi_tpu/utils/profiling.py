"""Profiling / tracing hooks (SURVEY §5: absent in the reference — its only
observability is tqdm. Here: jax.profiler trace capture + a step timer with
percentile summaries)."""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, Iterator, List

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (TensorBoard/Perfetto readable)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class StepTimer:
    """Wall-clock step timer with named sections and percentile report.

    Usage:
        timer = StepTimer()
        with timer.section("data"):
            batch = next(it)
        with timer.section("step"):
            state, m = train_step(...); jax.block_until_ready(m)
        print(timer.report())
    """

    sections: Dict[str, List[float]] = field(default_factory=dict)

    @contextlib.contextmanager
    def section(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.sections.setdefault(name, []).append(time.perf_counter() - t0)

    def report(self, last_n: int = 100) -> str:
        lines = []
        for name, vals in self.sections.items():
            v = np.asarray(vals[-last_n:]) * 1000.0
            lines.append(
                f"{name}: p50 {np.percentile(v, 50):.1f} ms  "
                f"p90 {np.percentile(v, 90):.1f} ms  "
                f"mean {v.mean():.1f} ms  n={len(vals)}")
        return "\n".join(lines)

    def mean(self, name: str) -> float:
        return float(np.mean(self.sections.get(name, [float('nan')])))
