"""Per-stage timing — the TicToc replacement (reference: tic_toc.h:10-32).

The reference sprinkles wall-clock stopwatches through every component and
prints via ROS_INFO gated on loam_verbose_level.  Here a StageTimer collects
the same per-stage breakdown (scan-reg / LO-assoc / LO-solve / map-assoc /
map-solve / VO) as running statistics, and ``trace`` wraps stages in
jax.profiler annotations so device timelines carry the same names.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class StageTimer:
    def __init__(self):
        self.total_ms = defaultdict(float)
        self.count = defaultdict(int)
        self.max_ms = defaultdict(float)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        with jax.profiler.TraceAnnotation(name):
            yield
        dt = (time.perf_counter() - t0) * 1e3
        self.total_ms[name] += dt
        self.count[name] += 1
        self.max_ms[name] = max(self.max_ms[name], dt)

    def summary(self) -> str:
        lines = []
        for name in self.total_ms:
            n = self.count[name]
            lines.append(
                f"{name:<24} avg {self.total_ms[name] / max(n, 1):8.2f} ms  "
                f"max {self.max_ms[name]:8.2f} ms  n={n}"
            )
        return "\n".join(lines)

    def mean_ms(self, name: str) -> float:
        return self.total_ms[name] / max(self.count[name], 1)
