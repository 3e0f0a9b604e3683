"""End-to-end benchmark: full-frame radar pipeline on the available
accelerator vs the vectorized NumPy reference chain on the host CPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Frame = the reference's full problem size (16 channels x 332 pulses x 5819
samples -> 332 x 3404 x 13 RDM -> 12-pair 2D GOCA-CFAR -> measured target
list; main_simulate_echoes_with_array_v8_3.m:71-84).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from radar_tpu.bench.baseline_np import frame_baseline_np
    from radar_tpu.config.params import full_config
    from radar_tpu.pipeline.frame import make_frame_processor
    from radar_tpu.sim.scenario import TargetBatch
    from radar_tpu.waveform.precompute import precompute

    cfg = full_config()
    precomp = precompute(cfg)
    process = make_frame_processor(cfg, precomp, dtype=jnp.complex64)
    targets = TargetBatch.make([3000.0, 10000.0], [20.0, 25.0],
                               [10.0, 10.0], [10.0, 15.0])

    key = jax.random.PRNGKey(0)
    # warmup: compile + settle one-time dispatch/transfer overheads
    for i in range(5):
        jax.block_until_ready(process(jax.random.fold_in(key, 1000 + i),
                                      targets))

    # two-point fit: total(n) = fixed dispatch/tunnel latency + n * t_frame,
    # so the slope isolates the true per-frame device time
    def run(n):
        t0 = time.perf_counter()
        for i in range(n):
            result = process(jax.random.fold_in(key, i), targets)
        jax.block_until_ready(result)
        return time.perf_counter() - t0

    n_small, n_large = 50, 500
    t_small, t_large = run(n_small), run(n_large)
    dt = (t_large - t_small) / (n_large - n_small)
    frames_per_s = 1.0 / dt

    # baseline: vectorized numpy reference chain, one frame on host CPU
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    frame_baseline_np(rng, targets, precomp, cfg)
    baseline_dt = time.perf_counter() - t0
    baseline_fps = 1.0 / baseline_dt

    print(json.dumps({
        "metric": "frames_per_s_e2e_16ch_332p",
        "value": round(frames_per_s, 3),
        "unit": "frames/s",
        "vs_baseline": round(frames_per_s / baseline_fps, 2),
    }))
    print(f"# device={jax.devices()[0].device_kind} "
          f"jax_frame={1e3 * dt:.2f}ms "
          f"numpy_frame={1e3 * baseline_dt:.1f}ms", file=sys.stderr)


if __name__ == "__main__":
    main()
