"""Tracing / profiling utilities (SURVEY.md section 5.1).

The reference's only instrumentation is tic/toc around the frame loop and
fprintf stage banners (main_simulate_echoes_with_array_v8_3.m:195,249;
fun_process_single_frame.m:46-153). The framework replaces that with:

  - ``StageTimer``: per-stage wall-clock accumulation with device sync, and
    samples/s-per-chip derived metrics;
  - ``trace``: context manager around ``jax.profiler`` for XLA-level traces
    (TensorBoard-compatible, written to a directory);
  - ``FrameMetrics``: structured per-frame records (the system-of-record
    detection-count log, ref :156, v8_3:236-246).
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import time
from collections import defaultdict

import jax


class StageTimer:
    """Accumulates per-stage wall time; ``sync=True`` blocks on a value to
    charge device time to the right stage."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync_value=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_value is not None:
                jax.block_until_ready(sync_value)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def time_stage(self, name: str, fn, *args, **kw):
        with self.stage(name):
            out = fn(*args, **kw)
            jax.block_until_ready(out)
        return out

    def report(self) -> dict[str, dict]:
        return {k: {"total_s": self.totals[k], "calls": self.counts[k],
                    "mean_ms": 1e3 * self.totals[k] / max(self.counts[k], 1)}
                for k in sorted(self.totals)}

    def samples_per_second(self, name: str, samples_per_call: int) -> float:
        t = self.totals.get(name, 0.0)
        return samples_per_call * self.counts[name] / t if t else 0.0


@contextlib.contextmanager
def trace(log_dir: str):
    """XLA-level profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass
class FrameMetrics:
    """Structured per-frame observability record."""

    frame_idx: int
    azimuth_deg: float
    num_raw_detections: int
    num_final_targets: int
    wall_ms: float

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))


class MetricsLog:
    def __init__(self):
        self.records: list[FrameMetrics] = []

    def record(self, m: FrameMetrics) -> None:
        self.records.append(m)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            for m in self.records:
                f.write(m.to_json() + "\n")

    def summary(self) -> dict:
        if not self.records:
            return {"frames": 0}
        import numpy as np

        walls = np.array([m.wall_ms for m in self.records])
        return {
            "frames": len(self.records),
            "total_detections": sum(m.num_raw_detections
                                    for m in self.records),
            "total_final_targets": sum(m.num_final_targets
                                       for m in self.records),
            "mean_frame_ms": float(walls.mean()),
            "p50_frame_ms": float(np.percentile(walls, 50)),
            "p99_frame_ms": float(np.percentile(walls, 99)),
        }
