"""Re-measure and pin the NumPy-baseline frame time used by bench.py's
``vs_baseline`` denominator (radar_tpu/bench/baseline_pin.json).

The pin exists because a live per-invocation measurement swings with
ambient host load (23.9-133 s observed across sessions), making the
round-over-round ``vs_baseline`` ratio meaningless. Run this on an
OTHERWISE IDLE host; it records min-of-N with full provenance.

Usage: python scripts/pin_baseline.py [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import platform
import sys
import time

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
           "NUMEXPR_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from radar_tpu.bench.baseline_np import frame_baseline_np
    from radar_tpu.config.params import perf_config
    from radar_tpu.sim.scenario import TargetBatch
    from radar_tpu.waveform.precompute import precompute

    cfg = perf_config()
    pre = precompute(cfg)
    targets = TargetBatch.make([3000.0, 10000.0], [20.0, 25.0],
                               [10.0, 10.0], [10.0, 15.0])
    runs = []
    for i in range(args.runs):
        rng = np.random.default_rng(0)
        t0 = time.perf_counter()
        frame_baseline_np(rng, targets, pre, cfg)
        runs.append(time.perf_counter() - t0)
        print(f"run {i}: {runs[-1]:.1f}s", flush=True)

    pin = {
        "frame_ms": round(min(runs) * 1e3, 1),
        "runs_ms": [round(r * 1e3, 1) for r in runs],
        "method": "frame_baseline_np (vectorized numpy reference chain, "
                  "full 16ch x 332p frame), seed 0, 1-thread BLAS, min of "
                  "runs on an otherwise idle host",
        "host": platform.node(),
        "node": platform.node(),   # exact match key for bench.py's guard
        "cpu_count": os.cpu_count(),
        "numpy": np.__version__,
        "date": time.strftime("%Y-%m-%d"),
    }
    out = os.path.join(os.path.dirname(__file__), "..", "radar_tpu",
                       "bench", "baseline_pin.json")
    with open(out, "w") as f:
        json.dump(pin, f, indent=1)
    print(json.dumps(pin, indent=1))


if __name__ == "__main__":
    main()
