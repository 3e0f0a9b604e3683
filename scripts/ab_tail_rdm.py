"""Same-process A/B of the maps-free tail (cfg.tail_from_rdm: detection
amplitudes + estimation stencils gathered pointwise from the complex RDM,
leaving the pair-sum cube as a CFAR-box-filter input only) vs the default
materialized-maps tail, under the perf config. Bit-identical outputs;
interleaved arms to expose session drift."""

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
    p_dir = make_frame_processor(perf_config().replace(tail_from_rdm=True),
                                 dtype=jnp.complex64, jit=False)
    arms = []
    for rep in range(2):
        arms.append(("maps_tail", time_processor(p_row, targets,
                                                f"maps_tail_r{rep}")))
        arms.append(("rdm_tail", time_processor(p_dir, targets,
                                              f"rdm_tail_r{rep}")))
    row = min(t for n, t in arms if n == "maps_tail")
    dire = min(t for n, t in arms if n == "rdm_tail")
    out = {"maps_tail_ms": round(1e3 * row, 3),
           "rdm_tail_ms": round(1e3 * dire, 3),
           "speedup": round(row / dire, 4)}
    print(json.dumps(out), flush=True)
    path = os.path.join(os.path.dirname(__file__), "..", "results",
                        "tail_rdm_ab.json")
    with open(path, "w") as fh:
        json.dump({"arms": [{"v": n, "ms": round(1e3 * t, 3)}
                            for n, t in arms], **out}, fh, indent=1)


if __name__ == "__main__":
    main()
