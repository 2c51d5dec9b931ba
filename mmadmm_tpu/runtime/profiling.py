"""Profiling / tracing utilities.

The reference's observability is clock() phase accumulators printed at exit
(``MeshIntegrator.h:24-27``, ``main.cpp:222-223``). Equivalents here:

* ``PhaseTimers`` — named wall-clock accumulators with block_until_ready
  fencing (device-truthful timings),
* ``trace`` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace directory for kernel-level analysis.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class PhaseTimers:
    """Accumulate wall time per named phase; fences device work."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, fence=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if fence is not None:
                import jax

                jax.block_until_ready(fence() if callable(fence) else fence)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(
                f"{name:24s} {self.totals[name]:9.3f} s"
                f"  ({self.counts[name]} calls)"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace around a block (TensorBoard format)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
