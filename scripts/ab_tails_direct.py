"""Re-measure the kernel-tail layout variants now that detection
extraction is cheap (extract_impl='direct'): default (bvg kernel -> vgb
transpose -> vgq tail) vs beams_major_tail (no RDM transpose; qgv tail)
vs kernel_maps (kernel-emitted qvg maps). Both variants were
neutral/negative in round 1 when extraction cost 0.83 ms via the padded
rowfetch; the producer-layout extraction (first_k_true_beams_major)
changes the balance. Interleaved same-process arms."""

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
    cfgs = {
        "default_vgq": perf_config(),
        "beams_major": perf_config().replace(beams_major_tail=True),
        "kernel_maps": perf_config().replace(kernel_maps=True),
    }
    procs = {k: make_frame_processor(c, dtype=jnp.complex64, jit=False)
             for k, c in cfgs.items()}
    arms = []
    for rep in range(2):
        for k, p in procs.items():
            arms.append((k, time_processor(p, targets, f"{k}_r{rep}")))
    best = {k: min(t for n, t in arms if n == k) for k in cfgs}
    out = {k + "_ms": round(1e3 * v, 3) for k, v in best.items()}
    out["speedup_bm"] = round(best["default_vgq"] / best["beams_major"], 4)
    out["speedup_km"] = round(best["default_vgq"] / best["kernel_maps"], 4)
    print(json.dumps(out), flush=True)
    path = os.path.join(os.path.dirname(__file__), "..", "results",
                        "tails_direct_ab.json")
    with open(path, "w") as fh:
        json.dump({"arms": [{"v": n, "ms": round(1e3 * t, 3)}
                            for n, t in arms], **out}, fh, indent=1)


if __name__ == "__main__":
    main()
