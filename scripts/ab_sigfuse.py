"""A/B the rank-K signal fusion into the rolling noise-RDM kernel
(lr.noise_rdm_sig) vs the explicit signal-einsum + add, both under the
pallas_prng perf config, in ONE process (same device/session conditions).
Tunnel-safe slope timing as bench.py."""

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
    import radar_tpu.pipeline.lowrank as L
    from radar_tpu.config.params import perf_config
    from radar_tpu.pipeline.frame import make_frame_processor
    from radar_tpu.sim.scenario import TargetBatch

    cfg = perf_config()
    targets = TargetBatch(*[jnp.asarray(x, jnp.float32) for x in
                            TargetBatch.make([3000.0, 10000.0], [20.0, 25.0],
                                             [10.0, 10.0], [10.0, 15.0])])
    orig = L.make_lowrank_stages

    def without_fusion(*a, **k):
        return orig(*a, **k)._replace(noise_rdm_sig=None)

    L.make_lowrank_stages = without_fusion
    try:
        p_ref = make_frame_processor(cfg, dtype=jnp.complex64, jit=False)
    finally:
        L.make_lowrank_stages = orig
    p_fused = make_frame_processor(cfg, dtype=jnp.complex64, jit=False)

    a = time_processor(p_ref, targets, "explicit_sig_einsum_add")
    b = time_processor(p_fused, targets, "sig_fused_in_kernel")
    print(json.dumps({"speedup": round(a / b, 4)}), flush=True)


if __name__ == "__main__":
    main()
