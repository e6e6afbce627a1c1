"""Profiling and throughput instrumentation.

Net-new vs the reference (SURVEY §5: it has none): step timers with
tokens/sec and env-steps/sec counters, and a `jax.profiler` trace context
for xplane dumps. BASELINE metrics (env-steps/s/chip, ILQL updates/s)
come from these counters.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax


@dataclass
class Throughput:
    """Windowed throughput meter: call .tick(n_items) per step."""

    window: int = 50
    _times: List[float] = field(default_factory=list)
    _counts: List[float] = field(default_factory=list)

    def tick(self, n_items: float = 1.0) -> None:
        self._times.append(time.perf_counter())
        self._counts.append(n_items)
        if len(self._times) > self.window + 1:
            self._times.pop(0)
            self._counts.pop(0)

    def rate(self) -> Optional[float]:
        """items/sec over the window (None until 2 ticks)."""
        if len(self._times) < 2:
            return None
        dt = self._times[-1] - self._times[0]
        if dt <= 0:
            return None
        return sum(self._counts[1:]) / dt


class StepTimer:
    """Accumulates named phase timings (host-side walls; call
    jax.block_until_ready on the result before stopping a phase for
    device-accurate numbers)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - t0
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self.totals[name],
                "mean_ms": 1000.0 * self.totals[name] / max(self.counts[name], 1),
                "count": self.counts[name],
            }
            for name in self.totals
        }


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def tokens_per_second(batch: int, seq_len: int, step_seconds: float) -> float:
    return batch * seq_len / max(step_seconds, 1e-9)
