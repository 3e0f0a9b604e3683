"""A/B cfg.kernel_maps: the fused kernel also emits the pair-sum maps
(qvg detection tail) vs the default pair_sum_maps pass. Same-process
arms; slope-timed (bench.py recipe)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def time_processor(process, targets, label):
    def loop(n, key):
        def body(i, acc):
            res = process(jax.random.fold_in(key, i), targets)
            t = res.targets
            return (acc + jnp.sum(t.range_m) + jnp.sum(t.velocity_ms)
                    + jnp.sum(t.angle_deg) + jnp.sum(t.power)
                    + res.num_raw_detections.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    f = jax.jit(loop)
    for n in (2, 2):
        float(f(n, jax.random.PRNGKey(0)))

    def t(n, s):
        t0 = time.perf_counter()
        float(f(n, jax.random.PRNGKey(s)))
        return time.perf_counter() - t0

    dt = (min(t(55, 1), t(55, 2)) - min(t(5, 3), t(5, 4))) / 50
    print(json.dumps({"variant": label, "ms_per_frame": round(1e3 * dt, 3),
                      "frames_per_s": round(1.0 / dt, 1)}), flush=True)
    return dt


def main():
    from radar_tpu.config.params import perf_config
    from radar_tpu.pipeline.frame import make_frame_processor
    from radar_tpu.sim.scenario import TargetBatch

    cfg = perf_config()
    targets = TargetBatch(*[jnp.asarray(x, jnp.float32) for x in
                            TargetBatch.make([3000.0, 10000.0], [20.0, 25.0],
                                             [10.0, 10.0], [10.0, 15.0])])
    a = time_processor(
        make_frame_processor(cfg, dtype=jnp.complex64, jit=False),
        targets, "pair_sum_maps_pass")
    b = time_processor(
        make_frame_processor(cfg.replace(kernel_maps=True),
                             dtype=jnp.complex64, jit=False),
        targets, "kernel_maps")
    print(json.dumps({"speedup": round(a / b, 4)}), flush=True)


if __name__ == "__main__":
    main()
