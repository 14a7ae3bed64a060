"""Step-level timing + opt-in XLA tracing.

TPU-native replacement for the arch harness profiler (reference call sites:
main.c:54-59,82,99,115-116 and the START_PROFILING/STOP_PROFILING macro
pairs).  Step-granularity timers are always on — they cost one
`block_until_ready` per step, which the metric contract requires anyway.
Fine-grained tracing (XLA/Pallas level) is opt-in via `trace_dir`, using
`jax.profiler` — the TPU equivalent of the reference's -DENABLE_PROFILING
build flag, without its "profiling distorts the run" caveat since traces
attach to the compiled program asynchronously.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@dataclass
class ProfileEntry:
    name: str
    time: float


@dataclass
class Profile:
    """Ordered named wall-clock entries, like arch's profiler_entries."""
    entries: list[ProfileEntry] = field(default_factory=list)
    _t0: float = 0.0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, name: str) -> float:
        dt = time.perf_counter() - self._t0
        self.entries.append(ProfileEntry(name, dt))
        return dt

    def total(self) -> float:
        return sum(e.time for e in self.entries)

    def summary(self) -> str:
        lines = ["PROFILING RESULTS:"]
        for e in self.entries:
            lines.append(f"  {e.name:<24s} {e.time:.6f}s")
        lines.append(f"  {'TOTAL':<24s} {self.total():.6f}s")
        return "\n".join(lines)


@contextlib.contextmanager
def maybe_trace(trace_dir: str | None):
    """Optional jax.profiler trace around a region (no-op when dir is None)."""
    if trace_dir is None:
        yield
        return
    import jax
    with jax.profiler.trace(trace_dir):
        yield
