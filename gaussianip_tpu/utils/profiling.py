"""Tracing / profiling hooks.

The reference has none on its active path (SURVEY.md §5 — tqdm bars and a
point-count log only); the rebuild exposes:
  * stage_timer: wall-clock per pipeline stage, recorded into the run
    manifest (the BASELINE metric is stage wall-clock);
  * trace(): jax.profiler TensorBoard trace of a code region;
  * counters: lightweight named scalar accumulation (gaussian counts,
    dropped-instance counts) dumped as json.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict
from typing import Dict, Optional


class Counters:
    def __init__(self):
        self.values: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    def add(self, name: str, value: float):
        self.values[name] += float(value)
        self.counts[name] += 1

    def mean(self, name: str) -> float:
        return self.values[name] / max(self.counts[name], 1)

    def dump(self, path: Optional[str] = None) -> dict:
        out = {k: {"sum": v, "n": self.counts[k], "mean": self.mean(k)}
               for k, v in self.values.items()}
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            with open(path, "w") as f:
                json.dump(out, f, indent=2)
        return out


class StageTimer:
    """Wall-clock per named stage; integrates with RunDirs.manifest."""

    def __init__(self, manifest_fn=None):
        self.times: Dict[str, float] = {}
        self._manifest_fn = manifest_fn

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            if self._manifest_fn is not None:
                self._manifest_fn(**{f"wall_s_{name}": round(self.times[name], 2)})


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace of the enclosed region (view in TensorBoard /
    xprof)."""
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
