"""Same-process A/B of the detection-extraction implementation under the
perf config: extract_impl='rowfetch' (padded 4096-wide rows over the
transposed ravel) vs 'direct' (first_k_true_vgq — producer-layout
(pair,gate)-rows, no bool relayout / padded copy). Bit-identical outputs
(tests/test_cfar.py); this measures which one the integrated pipeline
prefers. Interleaved arms (a, b, a, b) to expose session drift
(ROADMAP.md: trust only same-process A/B)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def time_processor(process, targets, label):
    def frames_loop(n, key):
        def body(i, acc):
            res = process(jax.random.fold_in(key, i), targets)
            t = res.targets
            return (acc + jnp.sum(t.range_m) + jnp.sum(t.velocity_ms)
                    + jnp.sum(t.angle_deg) + jnp.sum(t.power)
                    + res.num_raw_detections.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    f = jax.jit(frames_loop)
    for n in (2, 2):
        float(f(n, jax.random.PRNGKey(0)))

    def timed(n, seed):
        t0 = time.perf_counter()
        float(f(n, jax.random.PRNGKey(seed)))
        return time.perf_counter() - t0

    t_small = min(timed(5, 1), timed(5, 2))
    t_large = min(timed(55, 3), timed(55, 4))
    dt = (t_large - t_small) / 50
    print(json.dumps({"variant": label, "ms_per_frame": round(1e3 * dt, 3),
                      "frames_per_s": round(1.0 / dt, 1)}), flush=True)
    return dt


def main():
    from radar_tpu.config.params import perf_config
    from radar_tpu.pipeline.frame import make_frame_processor
    from radar_tpu.sim.scenario import TargetBatch

    targets = TargetBatch(*[jnp.asarray(x, jnp.float32) for x in
                            TargetBatch.make([3000.0, 10000.0], [20.0, 25.0],
                                             [10.0, 10.0], [10.0, 15.0])])
    p_row = make_frame_processor(perf_config(), dtype=jnp.complex64,
                                 jit=False)
    p_dir = make_frame_processor(perf_config().replace(extract_impl="direct"),
                                 dtype=jnp.complex64, jit=False)
    arms = []
    for rep in range(2):
        arms.append(("rowfetch", time_processor(p_row, targets,
                                                f"rowfetch_r{rep}")))
        arms.append(("direct", time_processor(p_dir, targets,
                                              f"direct_r{rep}")))
    row = min(t for n, t in arms if n == "rowfetch")
    dire = min(t for n, t in arms if n == "direct")
    out = {"rowfetch_ms": round(1e3 * row, 3),
           "direct_ms": round(1e3 * dire, 3),
           "speedup": round(row / dire, 4)}
    print(json.dumps(out), flush=True)
    path = os.path.join(os.path.dirname(__file__), "..", "results",
                        "extract_impl_ab.json")
    with open(path, "w") as fh:
        json.dump({"arms": [{"v": n, "ms": round(1e3 * t, 3)}
                            for n, t in arms], **out}, fh, indent=1)


if __name__ == "__main__":
    main()
