"""End-to-end benchmark: full-frame radar pipeline on the available
accelerator vs the vectorized NumPy reference chain on the host CPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Frame = the reference's full problem size (16 channels x 332 pulses x 5819
samples -> 332 x 3404 x 13 RDM -> 12-pair 2D GOCA-CFAR -> spline/monopulse
measurement -> two-stage clustering; main_simulate_echoes_with_array_v8_3.m:
71-84).

Measurement methodology (tunnel-TPU-safe, see .claude/skills/verify):
frames run inside ONE on-device ``lax.fori_loop`` program with a traced trip
count (single compile), every per-frame output consumed into the loop
carry — host-side loops measure dispatch latency and execution caches, and
partially-consumed outputs get dead-code-eliminated. Per-frame time is the
slope between two trip counts.
"""

from __future__ import annotations

import json
import os
import sys
import time

# Pin the NumPy baseline's BLAS threading BEFORE numpy loads its BLAS:
# the baseline frame time otherwise swings with ambient thread scheduling
# (23.9-36.4 s across BENCH_r01-r03), making vs_baseline the noisiest
# number in the artifact. Single-threaded + min-of-3 (below) makes the
# denominator reproducible to a few percent.
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
           "NUMEXPR_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

import numpy as np  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from radar_tpu.bench.baseline_np import frame_baseline_np
    from radar_tpu.config.params import perf_config
    from radar_tpu.pipeline.frame import make_frame_processor
    from radar_tpu.sim.scenario import TargetBatch
    from radar_tpu.waveform.precompute import precompute

    # perf configuration: fused synthesis+DBF beam-space path (exact
    # algebraic fusion for the signal, covariance-exact beam-space AWGN —
    # distribution-identical to per-channel noise -> DBF; tests/test_fused.py
    # + results/fused_synth.json) and bf16 MXU planes for the MTD/PC constant
    # matmuls (f32 accumulation, ~2^-9 input quantization; statistically
    # validated in results/bf16_matmul.json)
    # ... and the rank-K closed-form signal RDM with post-MTD noise mixing
    # (exact linear identity with the fused path, same random draws —
    # tests/test_fused.py::test_lowrank_rdm_matches_fused_exactly)
    # ... the rbg PRNG family (results/noise_prng.json), the fused Pallas
    # noise-RDM kernel (PC+MTD+beam-mix one pass, ops/pallas_rdm.py), and
    # uniform white rails (CLT-exact RDM statistics, no erfinv;
    # results/snr_sweep_uniform*.json) — config/params.py::PERF_OVERRIDES
    cfg = perf_config()
    precomp = precompute(cfg)
    process = make_frame_processor(cfg, precomp, dtype=jnp.complex64,
                                   jit=False)
    targets_np = TargetBatch.make([3000.0, 10000.0], [20.0, 25.0],
                                  [10.0, 10.0], [10.0, 15.0])
    targets = TargetBatch(*[jnp.asarray(x, jnp.float32)
                            for x in targets_np])

    def frames_loop(n, key):
        def body(i, acc):
            res = process(jax.random.fold_in(key, i), targets)
            t = res.targets
            return (acc + jnp.sum(t.range_m) + jnp.sum(t.velocity_ms)
                    + jnp.sum(t.angle_deg) + jnp.sum(t.power)
                    + res.num_raw_detections.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    f = jax.jit(frames_loop)  # traced trip count -> one compile
    key = jax.random.PRNGKey(0)
    for n in (2, 2):  # compile + settle
        float(f(n, key))

    def timed(n, seed):
        # force a scalar transfer: on tunnel backends block_until_ready can
        # return before the device has drained, but a value transfer cannot
        t0 = time.perf_counter()
        float(f(n, jax.random.PRNGKey(seed)))
        return time.perf_counter() - t0

    # drift-robust slope: the tunnel's per-session throughput drifts
    # +-10-15% on a timescale of minutes (ROADMAP.md session-drift note),
    # which a single min-of-2 pair walks right through (BENCH_r04
    # regression). Interleave ADJACENT small/large pairs — slow drift
    # moves both ends of one pair together, so each pair's slope is a
    # valid instantaneous reading — and take the best pair (fastest the
    # device demonstrably ran). Spread across pairs goes to stderr.
    n_small, n_large = 5, 55
    slopes = []
    for i in range(4):
        t_s = timed(n_small, 10 * i + 1)
        t_l = timed(n_large, 10 * i + 2)
        slopes.append((t_l - t_s) / (n_large - n_small))
    # Host-scheduling noise corrupts single pairs in BOTH directions: a
    # stalled small run inflates t_s and drives that pair's slope down
    # (even negative), and min() would preferentially select exactly the
    # corrupted pair — measured live: a loaded host produced slopes
    # [2.34, 1.28, 3.5, 2.33] and min() reported a fictitious 780
    # frames/s (self-review round 5). The MEDIAN of the interleaved
    # pairs is robust to one corrupted pair either way while still
    # tracking slow tunnel drift (each pair remains an instantaneous
    # reading). Non-positive slopes are dropped first; if every pair was
    # corrupted, fall back to the large run's mean (an upper bound, but
    # positive).
    valid = sorted(s for s in slopes if s > 0)
    if len(valid) < len(slopes):
        print(f"# dropped {len(slopes) - len(valid)} non-positive "
              f"slope pair(s): {slopes}", file=sys.stderr)
    if valid:
        m = len(valid)
        dt = (valid[(m - 1) // 2] + valid[m // 2]) / 2.0
    else:
        dt = timed(n_large, 99) / n_large
    frames_per_s = 1.0 / dt

    # baseline: vectorized numpy reference chain on host CPU. The
    # denominator is PINNED to a one-time measurement stored with
    # provenance (radar_tpu/bench/baseline_pin.json: seed 0, 1-thread
    # BLAS, min-of-runs on an idle host) — a live measurement swings with
    # ambient load (23.9-133 s observed across rounds/sessions), which
    # made vs_baseline the noisiest number in the artifact. Delete the
    # pin file (or run scripts/pin_baseline.py) to re-measure.
    import platform

    pin_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "radar_tpu", "bench", "baseline_pin.json")
    pin = None
    if os.path.exists(pin_path):
        with open(pin_path) as fh:
            pin = json.load(fh)
        # the pin was measured on ONE specific host; on any other machine
        # its denominator is meaningless — fall back to live measurement
        # there (advisor round-4 finding)
        pin_node = pin.get("node", pin.get("host", ""))
        if platform.node() not in (pin_node, pin_node.split(" ")[0]):
            print(f"# baseline pin is for host {pin_node!r}, this is "
                  f"{platform.node()!r}; measuring live", file=sys.stderr)
            pin = None
    if pin is not None:
        baseline_dt = pin["frame_ms"] / 1e3
        baseline_src = f"pinned {pin['date']} host={pin.get('node', '?')}"
    else:
        runs = []
        for _ in range(3):
            rng = np.random.default_rng(0)
            t0 = time.perf_counter()
            frame_baseline_np(rng, targets_np, precomp, cfg)
            runs.append(time.perf_counter() - t0)
        baseline_dt = min(runs)
        baseline_src = f"live min of {[round(1e3 * t) for t in runs]} ms"
    baseline_fps = 1.0 / baseline_dt

    print(json.dumps({
        "metric": "frames_per_s_e2e_16ch_332p",
        "value": round(frames_per_s, 3),
        "unit": "frames/s",
        "vs_baseline": round(frames_per_s / baseline_fps, 2),
        "baseline": baseline_src,
        "slope_spread_ms": [round(1e3 * s, 3) for s in sorted(slopes)],
    }))
    print(f"# device={jax.devices()[0].device_kind} "
          f"jax_frame={1e3 * dt:.2f}ms "
          f"slopes_ms={[round(1e3 * s, 2) for s in slopes]} "
          f"numpy_frame={1e3 * baseline_dt:.1f}ms "
          f"({baseline_src}, 1-thread BLAS, seed 0)", file=sys.stderr)


if __name__ == "__main__":
    main()
