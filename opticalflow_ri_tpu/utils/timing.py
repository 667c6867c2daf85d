"""Timing and profiling helpers.

The reference's only instrumentation is wall-clock around calculateFlow
(ref: benchmark_of_methods.py:173-175).  Here:

  * ``StageTimer`` — cheap named-stage wall-clock accounting with correct
    device-completion forcing (block_until_ready is unreliable on tunneled
    backends, so scalars are pulled);
  * ``trace`` — context manager around ``jax.profiler`` for xprof captures.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


def force(*arrays) -> None:
    """Force device completion of ``arrays`` without a bulk transfer."""
    import jax.numpy as jnp

    for a in arrays:
        if hasattr(a, "dtype"):
            float(jnp.sum(a))


class StageTimer:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, *outputs):
        t0 = time.perf_counter()
        yield
        force(*outputs)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t = self.totals[name]
            n = self.counts[name]
            lines.append(f"{name:<30} {t*1e3:9.2f} ms total  {t/n*1e3:8.2f} ms/call x{n}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with xprof/tensorboard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
