"""Gate-tile sweep for the in-kernel-PRNG fused noise-RDM kernel
(noise_rdm_pallas_gen). The DMA-plane kernel measured best at tile=128
(results/rdm_tile_sweep.json), but the gen variant's per-step cost
structure differs: it REDRAWS the whole [p_pad, window] window every step, so
the overlap-regeneration ratio window/tile falls with bigger tiles while
per-step VMEM pressure rises. Slope-timed standalone kernel + consume
(tunnel-safe: traced trip count, sum-|y| consume)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from radar_tpu.config.params import full_config
    from radar_tpu.ops.dbf import dbf_weights_effective_np
    from radar_tpu.ops.mtd import make_mtd_matrix
    from radar_tpu.ops.pallas_rdm import make_rdm_plan, noise_rdm_pallas_gen
    from radar_tpu.sim.echo import beam_noise_factor
    from radar_tpu.waveform.precompute import precompute

    cfg = full_config()
    pre = precompute(cfg)
    mtd_mat = make_mtd_matrix(pre.mtd_win, cfg.sig.prt_num, cfg.mtd_fft_len)
    w_eff = dbf_weights_effective_np(np.asarray(pre.dbf_w), cfg.dbf_variant)
    l_np = beam_noise_factor(w_eff)
    a = float(np.sqrt(1.5))
    out = {}
    for spec in (sys.argv[1:] or ["128", "256", "384", "512"]):
        # "tile[:beams_per_step]" or "tile:roll" (rolling-chunk variant)
        tile_s, _, bps_s = spec.partition(":")
        tile = int(tile_s)
        roll = bps_s in ("roll", "rolls", "rollx")
        static = bps_s == "rolls"   # timing ablation (wrong values)
        stacked = bps_s == "rollx"  # stacked re/im dots
        bps = 1 if roll else int(bps_s or 1)
        plan = make_rdm_plan(pre, mtd_mat, cfg.sig.prt_num, tile=tile,
                             lane=128)

        def loop(n, seed):
            def body(i, acc):
                y = noise_rdm_pallas_gen(
                    jnp.stack([seed + i, seed - i]), plan, l_np, a,
                    out_dtype=jnp.bfloat16, layout="bvg",
                    beams_per_step=bps, rolling=roll, stacked=stacked,
                    _static_slots=static)
                return acc + jnp.sum(jnp.abs(y))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        f = jax.jit(loop)
        for n in (2, 2):
            float(f(n, jnp.int32(0)))

        def t(n, s):
            t0 = time.perf_counter()
            float(f(n, jnp.int32(s)))
            return time.perf_counter() - t0

        n1, n2 = 8, 48
        dt = (min(t(n2, 1), t(n2, 2)) - min(t(n1, 3), t(n1, 4))) / (n2 - n1)
        out[spec] = round(1e3 * dt, 4)
        print(json.dumps({"tile": tile, "beams_per_step": bps,
                          "rolling": roll, "ms": out[spec],
                          "windows": [s.window for s in plan.segments]}),
              flush=True)
    print(json.dumps({"sweep_ms": out}), flush=True)


if __name__ == "__main__":
    main()
