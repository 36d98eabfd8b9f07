"""Profiling / tracing harness (SURVEY.md §5: the reference has none).

- ``phase(name)``: wall-clock phase timers accumulated into a registry,
  reported as a dict (drop-in for the benchmark harness).
- ``trace(logdir)``: context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable device trace.
- ``device_time(fn, *args)``: robust on-device timing that forces a scalar
  fetch (block_until_ready alone does not reliably block through the
  axon tunnel — see bench.py).
"""

from __future__ import annotations

import collections
import contextlib
import time
from typing import Callable, Dict


class PhaseTimers:
    def __init__(self) -> None:
        self.totals: Dict[str, float] = collections.defaultdict(float)
        self.counts: Dict[str, int] = collections.defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": self.totals[k], "count": self.counts[k],
                "mean_s": self.totals[k] / max(self.counts[k], 1)}
            for k in sorted(self.totals)
        }


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (view with TensorBoard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_time(fn: Callable, *args, repeats: int = 5) -> float:
    """Best-of-N wall time of ``fn(*args)`` forcing a scalar device fetch."""
    import jax.numpy as jnp

    def run():
        out = fn(*args)
        leaves = [out] if not isinstance(out, (tuple, list)) else list(out)
        return float(jnp.mean(leaves[0]))

    run()  # compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return best
