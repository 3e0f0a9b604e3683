"""Per-kernel and end-to-end benchmarks on the available accelerator
(BASELINE.json metrics: "range-Doppler samples/s/chip" for the DBF matmul
and matched-filter FFT kernels, frames/s at 64ch x 256 pulses, MUSIC at 128
elements). Writes results/kernel_bench.json.

NB on the tunnel backend: all timings use the two-point slope method and run
BEFORE any device->host transfer (a transfer degrades dispatch pipelining).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def slope_time(fn, variants, n1=30, n2=200):
    """Two-point slope timing cycling over distinct input tuples (identical
    repeated inputs can be served from an execution cache on tunnel
    backends, which inflates throughput past the speed of light)."""
    for v in variants:
        jax.block_until_ready(fn(*v))

    def run(n):
        t0 = time.perf_counter()
        for i in range(n):
            out = fn(*variants[i % len(variants)])
        jax.block_until_ready(out)
        return time.perf_counter() - t0

    return (run(n2) - run(n1)) / (n2 - n1)


def main() -> None:
    from radar_tpu.config.params import full_config, scaled_config
    from radar_tpu.ops.dbf import dbf
    from radar_tpu.ops.mtd import mtd
    from radar_tpu.ops.pulse_compression import make_plan, pulse_compress
    from radar_tpu.waveform.precompute import precompute

    results = {"device": jax.devices()[0].device_kind}
    cfg = full_config()
    pre = precompute(cfg)
    plan = make_plan(pre)
    p, s, c, b, g = (cfg.sig.prt_num, cfg.sig.point_prt, cfg.sig.channel_num,
                     cfg.sig.beam_num, cfg.sig.n_total_gate)
    key = jax.random.PRNGKey(0)
    iq = (jax.random.normal(key, (p, s, c))
          + 1j * jax.random.normal(key, (p, s, c))).astype(jnp.complex64)
    w = np.asarray(pre.dbf_w)

    def variants_of(x, k=4):
        mk = jax.jit(lambda x, s: x * s)
        return [(jax.block_until_ready(mk(x, 1.0 + 1e-6 * i)),)
                for i in range(k)]

    f_dbf = jax.jit(lambda x: dbf(x, w, "v8"))
    dt = slope_time(f_dbf, variants_of(iq))
    results["dbf_16ch_13beam"] = {
        "ms": round(dt * 1e3, 4),
        "input_msamples_per_s": round(p * s * c / dt / 1e6, 1),
        "gflops": round(8 * p * s * c * b / dt / 1e9, 1)}

    beams = jax.block_until_ready(f_dbf(iq))
    f_pc = jax.jit(lambda x: pulse_compress(x, pre, plan))
    dt = slope_time(f_pc, variants_of(beams))
    results["pulse_compression_13beam"] = {
        "ms": round(dt * 1e3, 4),
        "output_msamples_per_s": round(p * g * b / dt / 1e6, 1)}

    pc = jax.block_until_ready(f_pc(beams))
    mtd_win = np.asarray(pre.mtd_win, np.float32)
    f_mtd = jax.jit(lambda x: mtd(x, mtd_win, None))
    dt = slope_time(f_mtd, variants_of(pc))
    results["mtd_332pt"] = {
        "ms": round(dt * 1e3, 4),
        "msamples_per_s": round(p * g * b / dt / 1e6, 1)}

    # MUSIC at 128 elements (BASELINE config 4)
    from radar_tpu.doa.music import music_spectrum_1d, covariance

    d = cfg.sig.wavelength / 2
    x = (jax.random.normal(key, (128, 1024))
         + 1j * jax.random.normal(key, (128, 1024))).astype(jnp.complex64)
    scan = np.arange(-90.0, 90.0, 0.05)
    f_music = jax.jit(lambda x: music_spectrum_1d(
        covariance(x), 3, scan, d, cfg.sig.wavelength))
    dt = slope_time(f_music, variants_of(x), n1=10, n2=60)
    results["music_128el_1024snap_3600grid"] = {"ms": round(dt * 1e3, 3)}

    os.makedirs("results", exist_ok=True)
    with open("results/kernel_bench.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
