"""Serving metrics & lightweight profiling (SURVEY.md §5).

The reference has no observability; production serving needs
queries/sec, effective scan GB/s, and latency percentiles. jax.profiler
traces can be captured around any timed block via `trace()`.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@dataclass
class ServerMetrics:
    queries: int = 0
    bytes_scanned: int = 0
    latencies_s: list = field(default_factory=list)
    started_at: float = field(default_factory=time.time)

    @contextlib.contextmanager
    def timed_query(self, scan_bytes: int, n: int = 1):
        """Time a request handling `n` queries scanning `scan_bytes` total."""
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.queries += n
        self.bytes_scanned += scan_bytes
        self.latencies_s.append(dt)
        if len(self.latencies_s) > 10000:
            del self.latencies_s[: len(self.latencies_s) - 10000]

    def percentile(self, p: float) -> float:
        if not self.latencies_s:
            return 0.0
        xs = sorted(self.latencies_s)
        k = min(len(xs) - 1, int(p / 100 * len(xs)))
        return xs[k]

    def summary(self) -> dict:
        elapsed = max(1e-9, time.time() - self.started_at)
        return {
            "queries": self.queries,
            "qps": self.queries / elapsed,
            "effective_GBps": self.bytes_scanned / elapsed / 1e9,
            "p50_ms": self.percentile(50) * 1e3,
            "p99_ms": self.percentile(99) * 1e3,
        }


@contextlib.contextmanager
def trace(dirname: str | None):
    """Capture a jax.profiler trace around a block (no-op if dirname None)."""
    if not dirname:
        yield
        return
    import jax

    jax.profiler.start_trace(dirname)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
