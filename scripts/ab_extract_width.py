"""A/B the first-K-true extraction row width inside the full perf-config
pipeline (the [cap, row_width] cumsum/argmax pass scales with width, the
one-hot row-fetch MACs are width-invariant). Same-process arms."""

from __future__ import annotations

import functools
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
    import radar_tpu.ops.cfar as C
    from radar_tpu.config.params import perf_config
    from radar_tpu.pipeline.frame import make_frame_processor
    from radar_tpu.sim.scenario import TargetBatch

    cfg = perf_config()
    targets = TargetBatch(*[jnp.asarray(x, jnp.float32) for x in
                            TargetBatch.make([3000.0, 10000.0], [20.0, 25.0],
                                             [10.0, 10.0], [10.0, 15.0])])
    widths = [int(w) for w in sys.argv[1:]] or [4096, 2048, 1024, 8192]
    orig = C.first_k_true_indices
    out = {}
    for w in widths:
        # patch must stay active through time_processor: the closure calls
        # first_k_true_indices at TRACE time (first jitted invocation)
        C.first_k_true_indices = functools.partial(orig, row_width=w)
        try:
            p = make_frame_processor(cfg, dtype=jnp.complex64, jit=False)
            out[w] = time_processor(p, targets, f"row_width_{w}")
        finally:
            C.first_k_true_indices = orig
    base = out[widths[0]]
    print(json.dumps({"speedup_vs_first":
                      {w: round(base / v, 4) for w, v in out.items()}}),
          flush=True)


if __name__ == "__main__":
    main()
