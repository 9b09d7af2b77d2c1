"""Tracing / profiling helpers.

The reference carries GPU counter-sample timestamp machinery
(metal_msm/host/gpu.rs:34-114, copied from metal-rs and never invoked
from production) plus Criterion benches and ad-hoc `Instant` prints
(SURVEY.md §5 "Tracing / profiling"). The TPU-native equivalents here
are actually wired in:

  * `trace(logdir)` — a context manager around `jax.profiler` producing
    Perfetto/XProf traces of the device pipeline (every Pallas kernel
    shows up as its own op, so per-kernel time falls out of one trace);
  * `StageTimer` — structured wall/device timing with block-until-ready
    semantics, used by benches/stages.py for per-stage tables and by
    bench.py for the end-to-end JSON line;
  * `device_ms(fn, *args)` — median-of-k timed executions of a compiled
    function, the `microseconds_between_begin` analogue (gpu.rs:105-114).
"""

from __future__ import annotations

import contextlib
import json
import statistics
import time
from typing import Any, Callable, Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/tpu_msm_trace"):
    """Capture a profiler trace (view with XProf/Perfetto):

        with profiling.trace("/tmp/t"):
            pipe.msm(points, scalars)
    """
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def block(x: Any) -> Any:
    """Block on every array in a pytree (readback barrier)."""
    return jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready")
        else a, x)


def device_ms(fn: Callable, *args, runs: int = 3, warmup: int = 1,
              **kw) -> float:
    """Median wall ms of fn(*args) with block-until-ready around each run."""
    for _ in range(warmup):
        block(fn(*args, **kw))
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        block(fn(*args, **kw))
        times.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(times)


class StageTimer:
    """Structured per-stage timings (the structured-logging item of
    SURVEY.md §5 "Metrics"): accumulate named spans, emit a table or a
    JSON object."""

    def __init__(self) -> None:
        self.spans: List[Dict[str, float]] = []

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        yield
        self.spans.append(
            {"name": name, "ms": (time.perf_counter() - t0) * 1e3})

    def record(self, name: str, ms: float) -> None:
        self.spans.append({"name": name, "ms": ms})

    def total(self) -> float:
        return sum(s["ms"] for s in self.spans)

    def table(self) -> str:
        width = max((len(s["name"]) for s in self.spans), default=4)
        lines = [f"{s['name']:<{width}}  {s['ms']:>10.2f} ms"
                 for s in self.spans]
        lines.append(f"{'total':<{width}}  {self.total():>10.2f} ms")
        return "\n".join(lines)

    def json(self) -> str:
        return json.dumps({"stages": self.spans,
                           "total_ms": self.total()})
