"""Per-stage instrumentation, the TPU equivalent of the reference's @debug
wall-clock timers (polytrope_hydroKDTree.jl:253-289, gravOctree_Single.jl:
308-317, SURVEY.md C16).

Two layers:
- `stage(name)` — jax.named_scope context so stages show up with the
  reference's taxonomy (neighbors / W / rho / AV / P / gradW / pair-sums /
  gravity) in XLA HLO and `jax.profiler` traces.
- `StageTimer` — host-side wall-clock accumulator for driver-level stages
  (chunk execution, snapshot I/O, rendering). Enabled with
  SPHTPU_PROFILE=1 or explicitly; prints a summary table.

For deep kernel profiling use `trace(logdir)` which wraps
jax.profiler.trace (view with TensorBoard / xprof).
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict

import jax


def stage(name: str):
    """Named scope for a compute stage (shows up in HLO/profiler)."""
    return jax.named_scope(f"sph/{name}")


class StageTimer:
    def __init__(self, enabled: bool | None = None):
        if enabled is None:
            enabled = bool(os.environ.get("SPHTPU_PROFILE"))
        self.enabled = enabled
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        if not self.totals:
            return ""
        width = max(len(k) for k in self.totals)
        lines = ["stage timing (wall seconds):"]
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            lines.append(
                f"  {name:<{width}}  {total:9.3f}s  x{self.counts[name]}"
            )
        return "\n".join(lines)

    def report(self) -> None:
        if self.enabled and self.totals:
            print(self.summary())


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace for TensorBoard (device timelines, HLO costs)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
