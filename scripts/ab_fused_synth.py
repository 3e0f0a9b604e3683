"""A/B the fused synthesis+DBF beam-space path vs the default channel-cube
path at the full reference problem size, on whatever backend is live.

Same tunnel-safe methodology as bench.py: each variant runs inside one
on-device fori_loop with a traced trip count; per-frame time is the slope
between two trip counts; outputs consumed into the carry.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def time_variant(cfg, targets, label):
    from radar_tpu.pipeline.frame import make_frame_processor

    process = make_frame_processor(cfg, dtype=jnp.complex64, jit=False)

    def frames_loop(n, key):
        def body(i, acc):
            res = process(jax.random.fold_in(key, i), targets)
            t = res.targets
            return (acc + jnp.sum(t.range_m) + jnp.sum(t.velocity_ms)
                    + jnp.sum(t.angle_deg) + jnp.sum(t.power)
                    + res.num_raw_detections.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    f = jax.jit(frames_loop)
    key = jax.random.PRNGKey(0)
    for n in (2, 2):
        float(f(n, key))

    def timed(n, seed):
        t0 = time.perf_counter()
        float(f(n, jax.random.PRNGKey(seed)))
        return time.perf_counter() - t0

    n_small, n_large = 5, 55
    t_small = min(timed(n_small, 1), timed(n_small, 2))
    t_large = min(timed(n_large, 3), timed(n_large, 4))
    dt = (t_large - t_small) / (n_large - n_small)
    print(json.dumps({"variant": label, "ms_per_frame": round(1e3 * dt, 3),
                      "frames_per_s": round(1.0 / dt, 1)}))
    return dt


def main():
    from radar_tpu.config.params import full_config
    from radar_tpu.sim.scenario import TargetBatch

    targets_np = TargetBatch.make([3000.0, 10000.0], [20.0, 25.0],
                                  [10.0, 10.0], [10.0, 15.0])
    targets = TargetBatch(*[jnp.asarray(x, jnp.float32)
                            for x in targets_np])
    cfg = full_config()
    import sys
    variants = sys.argv[1:] or ["default", "fused"]
    dts = {}
    for v in variants:
        kw = {}
        if "fused" in v:
            kw["fused_synth_dbf"] = True
        if "lowrank" in v:
            kw["fused_synth_dbf"] = True
            kw["lowrank_rdm"] = True
        if "bf16" in v:
            kw["matmul_precision"] = "bf16"
        if "rbg" in v:
            kw["noise_prng"] = "rbg"
        if "nscan" in v:
            kw["extract_native_scan"] = True
        if "prdm" in v:
            kw["noise_rdm_impl"] = "pallas"
        if "prng" in v:   # in-kernel noise generation (uniform rails only)
            kw["noise_rdm_impl"] = "pallas_prng"
            kw["noise_dist"] = "uniform"
        if "unif" in v:
            kw["noise_dist"] = "uniform"
        if "bmtail" in v:
            kw["beams_major_tail"] = True
        if "pcfar" in v:   # standalone Pallas qvg-maps CFAR kernel
            kw["use_pallas_cfar"] = True
        if "b16out" in v:  # bf16 output planes for the signal-fused kernel
            kw["kernel_out_bf16"] = True
        if "mrefined" in v:  # spline-refined-index monopulse (flaw fix)
            kw["monopulse_refined"] = True
        if "mcfar" in v:   # MXU banded-stencil CFAR window means
            import dataclasses

            kw["cfar"] = dataclasses.replace(cfg.cfar, means_impl="matmul")
        dts[v] = time_variant(cfg.replace(**kw) if kw else cfg, targets, v)
    if len(dts) > 1:
        base = list(dts.values())[0]
        print(json.dumps({f"speedup_vs_{variants[0]}":
                          {v: round(base / dt, 3) for v, dt in dts.items()}}))


if __name__ == "__main__":
    main()
