"""Benchmark timer with the reference's reporting semantics
(benchmarks/benchmark.hpp:5-146): run a callable N times, report
first/last/average/median/total milliseconds, and autosave results to
`benchmark_results_<tag><datetime>.txt` periodically."""

from __future__ import annotations

import statistics
import time
from dataclasses import dataclass, field


@dataclass
class Benchmark:
    tag: str = ""
    autosave_interval_s: float = 600.0
    results_ms: list[float] = field(default_factory=list)
    _last_save: float = field(default_factory=time.time)

    def run(self, fn, n: int = 1, *args, **kwargs):
        out = None
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn(*args, **kwargs)
            self.results_ms.append((time.perf_counter() - t0) * 1e3)
            if time.time() - self._last_save > self.autosave_interval_s:
                self.autosave()
        return out

    # -- stats (benchmark.hpp:83-94) ---------------------------------------
    def first(self) -> float:
        return self.results_ms[0]

    def last(self) -> float:
        return self.results_ms[-1]

    def average(self) -> float:
        return sum(self.results_ms) / len(self.results_ms)

    def median(self) -> float:
        return statistics.median(self.results_ms)

    def total(self) -> float:
        return sum(self.results_ms)

    def summary(self) -> str:
        return (f"first: {self.first():.3f} ms, last: {self.last():.3f} ms, "
                f"average: {self.average():.3f} ms, median: {self.median():.3f} ms, "
                f"total: {self.total():.3f} ms ({len(self.results_ms)} runs)")

    def autosave(self, path: str | None = None) -> str:
        if path is None:
            stamp = time.strftime("%Y%m%d_%H%M%S")
            path = f"benchmark_results_{self.tag}{stamp}.txt"
        with open(path, "w") as f:
            f.write(self.summary() + "\n")
            for ms in self.results_ms:
                f.write(f"{ms:.6f}\n")
        self._last_save = time.time()
        return path


class PhaseTimer:
    """Named phase timing (the tracing the reference lacks, SURVEY.md §5);
    integrates with jax.profiler traces when enabled."""

    def __init__(self, trace_dir: str | None = None):
        self.phases: dict[str, float] = {}
        self.trace_dir = trace_dir
        self._stack: list[tuple[str, float]] = []

    def __call__(self, name: str):
        return _Phase(self, name)

    def report(self) -> str:
        return ", ".join(f"{k}: {v * 1e3:.1f} ms" for k, v in self.phases.items())


class _Phase:
    def __init__(self, timer: PhaseTimer, name: str):
        self.timer = timer
        self.name = name

    def __enter__(self):
        self._t0 = time.perf_counter()
        if self.timer.trace_dir:
            import jax

            self._ctx = jax.profiler.TraceAnnotation(self.name)
            self._ctx.__enter__()
        return self

    def __exit__(self, *exc):
        if self.timer.trace_dir:
            self._ctx.__exit__(*exc)
        self.timer.phases[self.name] = (
            self.timer.phases.get(self.name, 0.0) + time.perf_counter() - self._t0)
        return False
