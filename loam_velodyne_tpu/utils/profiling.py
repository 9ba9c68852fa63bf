"""Profiling and metrics.

The reference has no instrumentation at all (SURVEY.md §5: no timers,
no counters; observability is the ROS topic stream). Here metrics are
first-class: a lightweight host-side metrics registry the driver feeds,
and a context manager around the JAX profiler for device traces
(viewable in TensorBoard / Perfetto).
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Iterator, List


class Metrics:
    """Counters + timing histograms for a pipeline run."""

    def __init__(self):
        self.counters: Dict[str, int] = defaultdict(int)
        self.timings: Dict[str, List[float]] = defaultdict(list)

    def count(self, name: str, inc: int = 1) -> None:
        self.counters[name] += inc

    @contextlib.contextmanager
    def timer(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.timings[name].append(time.perf_counter() - t0)

    def record(self, name: str, seconds: float) -> None:
        self.timings[name].append(seconds)

    def summary(self) -> Dict:
        out: Dict = {"counters": dict(self.counters), "timings": {}}
        for name, vals in self.timings.items():
            if not vals:
                continue
            v = sorted(vals)
            n = len(v)
            out["timings"][name] = {
                "n": n,
                "mean_ms": 1e3 * sum(v) / n,
                "p50_ms": 1e3 * v[n // 2],
                "p90_ms": 1e3 * v[min(n - 1, int(0.9 * n))],
                "max_ms": 1e3 * v[-1],
            }
        return out

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a JAX device profile (XLA ops, fusion, HBM traffic) for
    everything inside the context. View with TensorBoard's profile
    plugin or Perfetto."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
