"""Integrated sub-stage breakdown of the PALLAS perf-config pipeline
(lowrank + bf16 + rbg + compact noise + fused noise-RDM kernel) by timing
successively longer pipeline prefixes inside on-device fori_loops (see
scripts/profile_tail.py for why isolated stage timings are meaningless).

Writes results/pallas_profile.json when run on the accelerator."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def loop_time(step_fn, n1=5, n2=35):
    key = jax.random.PRNGKey(0)

    def loop(n, k0):
        def body(i, acc):
            return acc + step_fn(jax.random.fold_in(k0, i))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    f = jax.jit(loop)
    for n in (n1, n1):
        float(f(n, key))

    def t(n, s):
        t0 = time.perf_counter()
        float(f(n, jax.random.PRNGKey(s)))
        return time.perf_counter() - t0

    return (min(t(n2, 1), t(n2, 2)) - min(t(n1, 3), t(n1, 4))) / (n2 - n1)


def main() -> None:
    from radar_tpu.cluster.stages import cluster_stage1, cluster_stage2
    from radar_tpu.measure.estimate import estimate_parameters
    from radar_tpu.ops.cfar import (extract_detections, goca_cfar_2d,
                                    pair_sum_maps)
    from radar_tpu.ops.dbf import dbf_weights_effective_np
    from radar_tpu.ops.mtd import make_mtd_matrix
    from radar_tpu.ops.pallas_rdm import (make_rdm_plan,
                                          noise_rdm_pallas_planes)
    from radar_tpu.ops.pulse_compression import make_matmul_plan
    from radar_tpu.pipeline.frame import measure_consts
    from radar_tpu.pipeline.lowrank import make_lowrank_stages
    from radar_tpu.sim.echo import beam_noise_factor
    from radar_tpu.sim.scenario import TargetBatch
    from radar_tpu.waveform.precompute import precompute

    from radar_tpu.config.params import perf_config

    cfg = perf_config()
    pre = precompute(cfg)
    mplan = make_matmul_plan(pre)
    mtd_mat = make_mtd_matrix(pre.mtd_win, cfg.sig.prt_num, cfg.mtd_fft_len)
    mc = measure_consts(cfg, pre, np.float32)
    w_eff = dbf_weights_effective_np(np.asarray(pre.dbf_w), cfg.dbf_variant)
    l_np = beam_noise_factor(w_eff)
    rplan = make_rdm_plan(pre, mtd_mat, cfg.sig.prt_num, tile=128)
    lr = make_lowrank_stages(cfg, pre, None, mplan, mtd_mat, pre.mtd_win,
                             jnp.complex64)
    tb = TargetBatch(*[jnp.asarray(x, jnp.float32) for x in
                       TargetBatch.make([3000.0, 10000.0], [20.0, 25.0],
                                        [10.0, 10.0], [10.0, 15.0])])
    ip = cfg.interp
    P, B = cfg.sig.prt_num, cfg.sig.beam_num

    def upto(stage):
        def step(key):
            ku, kn = jax.random.split(key)
            tb_i = tb._replace(range_m=tb.range_m + jax.random.uniform(
                ku, tb.range_m.shape))
            if lr.noise_rdm_sig is not None:
                # shipped pallas_prng path: one kernel returns the COMPLETE
                # RDM (signal fused into the mix tail) — rdm_sig/zgen/add
                # are not separate stages
                if stage in ("rdm_sig", "zgen"):
                    return jnp.float32(0)
                rdm = lr.noise_rdm_sig(kn, tb_i)
                if stage in ("kernel", "add"):
                    return jnp.sum(jnp.abs(rdm))
            else:
                rdm_sig = lr.signal_rdm(tb_i)
                if stage == "rdm_sig":
                    return jnp.sum(jnp.abs(rdm_sig))
                if lr.noise_planes is not None:   # DMA-plane variant
                    xrs, xis = lr.noise_planes(kn)
                    if stage == "zgen":
                        acc = jnp.sum(jnp.abs(rdm_sig))
                        for x in xrs + xis:
                            acc += jnp.sum(jnp.abs(x.astype(jnp.float32)))
                        return acc
                    rdm_z = noise_rdm_pallas_planes(xrs, xis, rplan, l_np)
                else:   # in-kernel PRNG without signal fusion
                    if stage == "zgen":
                        return jnp.sum(jnp.abs(rdm_sig))
                    rdm_z = lr.noise_rdm(kn)
                if stage == "kernel":
                    return (jnp.sum(jnp.abs(rdm_sig))
                            + jnp.sum(jnp.abs(rdm_z)))
                rdm = rdm_sig + rdm_z
                if stage == "add":
                    return jnp.sum(jnp.abs(rdm))
            maps = pair_sum_maps(rdm)
            if stage == "pairsum":
                return jnp.sum(maps)
            mask, _ = goca_cfar_2d(maps, cfg.cfar)
            if stage == "cfar":
                return jnp.sum(jnp.abs(jnp.where(mask, maps, 0.0)))
            dets = extract_detections(mask, maps, cfg.cfar.max_detections,
                                      impl=cfg.extract_impl)
            if stage == "extract":
                return (jnp.sum(jnp.abs(dets.amp))
                        + jnp.sum(dets.v_idx + dets.r_idx)
                        .astype(jnp.float32))
            params = estimate_parameters(dets, maps, rdm, mc, ip.extra_dots,
                                         ip.r_interp_times, ip.v_interp_times)
            if stage == "estimate":
                return (jnp.sum(jnp.abs(params.range_m))
                        + jnp.sum(jnp.abs(params.velocity_ms))
                        + jnp.sum(jnp.abs(params.angle_deg)))
            s1 = cluster_stage1(params, cfg.cluster)
            final = cluster_stage2(s1, cfg.cluster)
            return (jnp.sum(jnp.abs(final.range_m))
                    + jnp.sum(jnp.abs(final.power)))
        return step

    out = {"device": jax.devices()[0].device_kind, "config": "perf(pallas)"}
    prev = 0.0
    for stage in ("rdm_sig", "zgen", "kernel", "add", "pairsum", "cfar",
                  "extract", "estimate", "cluster"):
        dt = loop_time(upto(stage))
        out[stage + "_cum_ms"] = round(1e3 * dt, 3)
        out[stage + "_delta_ms"] = round(1e3 * (dt - prev), 3)
        prev = dt
        print(json.dumps(out))
    path = os.path.join(os.path.dirname(__file__), "..", "results",
                        "pallas_profile.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
