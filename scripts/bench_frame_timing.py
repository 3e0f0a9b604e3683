"""Refresh results/frame_timing.json: e2e frame time for the full
16ch x 332p reference config and the BASELINE 64ch x 256p scaled config,
both through the current perf pipeline. Slope-timed (bench.py recipe)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def time_cfg(cfg, label):
    from radar_tpu.pipeline.frame import make_frame_processor
    from radar_tpu.sim.scenario import TargetBatch

    process = make_frame_processor(cfg, dtype=jnp.complex64, jit=False)
    targets = TargetBatch(*[jnp.asarray(x, jnp.float32) for x in
                            TargetBatch.make([3000.0, 10000.0], [20.0, 25.0],
                                             [10.0, 10.0], [10.0, 15.0])])

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

    # median of interleaved small/large slope pairs — same drift/outlier
    # discipline as bench.py (a single min-of-2 pair walks through the
    # tunnel's ±10-15% drift and host-scheduling stalls corrupt min())
    slopes = sorted((t(55, 10 * i + 2) - t(5, 10 * i + 1)) / 50
                    for i in range(4))
    valid = [s for s in slopes if s > 0] or slopes[-1:]
    m = len(valid)
    dt = (valid[(m - 1) // 2] + valid[m // 2]) / 2.0
    print(json.dumps({"config": label, "ms": round(1e3 * dt, 3),
                      "fps": round(1.0 / dt, 1),
                      "slope_spread_ms": [round(1e3 * s, 3)
                                          for s in slopes]}), flush=True)
    return dt


def main():
    from radar_tpu.config.params import (full_config, perf_config,
                                         scaled_config)

    full_dt = time_cfg(perf_config(), "full_16ch_332p")
    scaled_dt = time_cfg(perf_config(scaled_config(64, 256)),
                         "scaled_64ch_256p")
    scaled128_dt = time_cfg(perf_config(scaled_config(128, 332)),
                            "scaled_128ch_332p")
    # the EXACT-STREAM number at 64 ch: per-channel cube synthesis + AWGN +
    # DBF + PC + MTD — the path a real-array consumer running on recorded
    # IQ would pay, published next to the rank-K headline so the scaling
    # table can't be read as hiding the channel-cube cost
    stream64_dt = time_cfg(scaled_config(64, 256),
                           "scaled_64ch_256p_stream")

    path = os.path.join(os.path.dirname(__file__), "..", "results",
                        "frame_timing.json")
    with open(path) as fh:
        data = json.load(fh)
    data["full_16ch_332p"] = {
        "frame_ms": round(1e3 * full_dt, 2),
        "frames_per_s": round(1.0 / full_dt, 1),
        "note": ("perf config (lowrank+bf16+rbg + in-kernel-PRNG rolling "
                 "noise kernel with fused rank-K signal); exact "
                 "reference-stream path: 9.2 ms"),
    }
    data["scaled_64ch_256p"] = {
        "frame_ms": round(1e3 * scaled_dt, 2),
        "frames_per_s": round(1.0 / scaled_dt, 1),
        "note": ("perf config; channels only enter the [K,C]x[C,B] "
                 "steering contraction in the lowrank path"),
    }
    data["scaled_128ch_332p"] = {
        "frame_ms": round(1e3 * scaled128_dt, 2),
        "frames_per_s": round(1.0 / scaled128_dt, 1),
        "note": ("128-element array, full pulse count, synthesized "
                 "Hamming bank + self-calibrated K slopes"),
    }
    data["scaled_64ch_256p_stream"] = {
        "frame_ms": round(1e3 * stream64_dt, 2),
        "frames_per_s": round(1.0 / stream64_dt, 1),
        "note": ("exact reference-stream path at 64 ch (per-channel cube "
                 "synthesis + AWGN + DBF + matmul PC/MTD, no rank-K "
                 "shortcut) — the recorded-IQ consumer's number"),
    }
    h = data.setdefault("history_ms", {})
    h["after_pallas_noise_rdm_kernel"] = 4.8
    h["after_direct_plane_gen"] = 4.3
    h["after_uniform_rails"] = 3.9
    h["after_bf16_kernel_out"] = 3.55
    h["after_inkernel_prng"] = 3.4
    h["after_rolling_chunks"] = 3.21
    # the milestone value is the bench.py record at adoption time, not
    # this session's reading (the tunnel drifts +-10-15% across hours;
    # fresh readings live in full_16ch_332p above)
    h["after_signal_fusion"] = 2.4
    with open(path, "w") as fh:
        json.dump(data, fh, indent=1)
    print("wrote", os.path.normpath(path))


if __name__ == "__main__":
    main()
