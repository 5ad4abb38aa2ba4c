"""Tracing / profiling (SURVEY §5): per-stage wall timers + jax.profiler.

The reference's only observability is wall-clock prints
(reference scripts/tda_eeg_audio_comparison.py:127,135-137,348); here every
pipeline stage reports into a structured `StageTimes` registry and the whole
run can be wrapped in a device trace for xprof/tensorboard.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from pathlib import Path


class StageTimes:
    """Accumulates per-stage wall time + item counts → windows/sec reports."""

    def __init__(self):
        self.t = defaultdict(float)
        self.n = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, items: int = 0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.t[name] += time.perf_counter() - t0
            self.n[name] += items

    def report(self) -> dict:
        out = {}
        for k in self.t:
            r = {"seconds": round(self.t[k], 3)}
            if self.n[k]:
                r["items"] = self.n[k]
                r["items_per_sec"] = round(self.n[k] / max(self.t[k], 1e-9), 1)
            out[k] = r
        return out

    def dump(self, path) -> None:
        Path(path).write_text(json.dumps(self.report(), indent=2))


GLOBAL_TIMES = StageTimes()


@contextlib.contextmanager
def device_trace(log_dir: str | None):
    """Wrap a block in a jax.profiler trace (no-op when log_dir is None)."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(str(log_dir)):
        yield
