"""Validate the in-kernel-PRNG fused noise-RDM kernel (pallas_prng) on
real hardware against the DMA-plane kernel (pallas).

Two checks, both computed entirely on device (scalar transfers only — see
.claude/skills/verify for the tunnel readback rules):

1. BIT-LEVEL: export the exact planes the in-kernel generator draws
   (gen_noise_planes_pallas — same seeding, chunk addressing and bf16
   cast), feed them through the DMA-path kernel, and compare with the
   fused gen kernel's output. Identical inputs + identical dot order ==>
   max |diff| must be exactly 0. This proves the chunk-keyed streams
   regenerate overlapping window samples bit-identically (the banded-
   convolution semantics) and that pad_front zeroing matches.

2. STATISTICS: first/second moments of the gen-kernel RDM vs the
   production jax.random uniform-plane path over several frames; the
   rails are iid relabelings so per-cell mean ~ 0 and the total variance
   must match to sampling error.

Writes results/rdm_gen.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from radar_tpu.config.params import full_config
    from radar_tpu.ops.dbf import dbf_weights_effective_np
    from radar_tpu.ops.mtd import make_mtd_matrix
    from radar_tpu.ops.pallas_rdm import (gen_noise_planes_pallas,
                                          make_rdm_plan,
                                          noise_rdm_pallas_gen,
                                          noise_rdm_pallas_planes)
    from radar_tpu.pipeline.lowrank import make_lowrank_stages
    from radar_tpu.ops.pulse_compression import make_matmul_plan
    from radar_tpu.waveform.precompute import precompute

    interpret = jax.default_backend() == "cpu"
    cfg = full_config().replace(fused_synth_dbf=True, lowrank_rdm=True,
                                matmul_precision="bf16", noise_prng="rbg",
                                noise_dist="uniform")
    pre = precompute(cfg)
    mtd_mat = make_mtd_matrix(pre.mtd_win, cfg.sig.prt_num, cfg.mtd_fft_len)
    plan = make_rdm_plan(pre, mtd_mat, cfg.sig.prt_num, tile=128, lane=128)
    w_eff = dbf_weights_effective_np(np.asarray(pre.dbf_w), cfg.dbf_variant)
    from radar_tpu.sim.echo import beam_noise_factor
    l_np = beam_noise_factor(w_eff)
    num_b = l_np.shape[0]
    a_unif = float(np.sqrt(1.5))
    out = {}

    # --- check 1: bit-level gen-kernel == DMA-kernel on the same planes
    @jax.jit
    def bit_check(seed):
        y_gen = noise_rdm_pallas_gen(seed, plan, l_np, a_unif,
                                     interpret=interpret,
                                     out_dtype=jnp.float32, layout="bvg")
        xrs, xis = gen_noise_planes_pallas(seed, plan, num_b, a_unif,
                                           interpret=interpret)
        y_dma = noise_rdm_pallas_planes(xrs, xis, plan, l_np,
                                        interpret=interpret,
                                        out_dtype=jnp.float32,
                                        layout="bvg")
        d = y_gen - y_dma
        return (jnp.max(jnp.abs(d.real)) + jnp.max(jnp.abs(d.imag)),
                jnp.max(jnp.abs(y_gen)), jnp.mean(jnp.abs(y_gen)))

    seed = jnp.asarray([12345, -987654321], jnp.int32)
    maxdiff, ymax, ymean = (float(x) for x in bit_check(seed))
    out["bit_check"] = {"max_abs_diff": maxdiff, "max_abs_out": ymax,
                        "mean_abs_out": ymean,
                        "pass": bool(maxdiff == 0.0 and ymax > 0.0)}
    print(json.dumps(out["bit_check"]), flush=True)

    # --- check 1b: rolling-chunk variant vs the per-step generator. Same
    # draws (chunk-keyed streams), but the banded-PC dot is decomposed
    # into per-chunk partial dots: ~1-ulp f32 reassociation in the PC
    # tile, which occasionally flips the pcr->bf16 rounding feeding MTD —
    # so the expected difference scale is the bf16 quantization step
    # (2^-8 relative) on the NOISE, the same class as the bf16 multiply
    # planes already sweep-validated (results/bf16_matmul.json,
    # snr_sweep_uniform*). Measured on v5e: rel 4.0e-3; CPU f32-multiply
    # interpret shows 3e-7 (pure reassociation), confirming no plumbing
    # bug.
    @jax.jit
    def roll_check(seed):
        ya = noise_rdm_pallas_gen(seed, plan, l_np, a_unif,
                                  interpret=interpret,
                                  out_dtype=jnp.float32, layout="bvg",
                                  beams_per_step=num_b)
        yb = noise_rdm_pallas_gen(seed, plan, l_np, a_unif,
                                  interpret=interpret,
                                  out_dtype=jnp.float32, layout="bvg",
                                  rolling=True)
        d = ya - yb
        return (jnp.max(jnp.abs(d.real)) + jnp.max(jnp.abs(d.imag)),
                jnp.max(jnp.abs(ya)))

    rdiff, rmax = (float(x) for x in roll_check(seed))
    out["rolling_check"] = {
        "max_abs_diff": rdiff, "max_abs_out": rmax,
        "rel": rdiff / rmax if rmax else None,
        "pass": bool(rmax > 0.0 and rdiff <= 2.0 ** -7 * rmax)}
    print(json.dumps(out["rolling_check"]), flush=True)

    # --- check 2: moments vs the production jax.random plane path
    stages = make_lowrank_stages(
        cfg.replace(noise_rdm_impl="pallas"), pre,
        None, make_matmul_plan(pre), mtd_mat, pre.mtd_win, jnp.complex64)
    stages_gen = make_lowrank_stages(
        cfg.replace(noise_rdm_impl="pallas_prng"), pre,
        None, make_matmul_plan(pre), mtd_mat, pre.mtd_win, jnp.complex64)

    def moments(noise_rdm_fn):
        def one(key):
            y = noise_rdm_fn(key, interpret=interpret, layout="bvg")
            n = 2.0 * y.size
            return jnp.stack([
                (jnp.sum(y.real) + jnp.sum(y.imag)) / n,
                (jnp.sum(y.real**2) + jnp.sum(y.imag**2)) / n,
                jnp.sum(jnp.abs(y) > 8.0 * jnp.sqrt(
                    (jnp.sum(y.real**2) + jnp.sum(y.imag**2)) / n)
                    ).astype(jnp.float32),
            ])

        @jax.jit
        def run(k0, nf):
            def body(i, acc):
                return acc + one(jax.random.fold_in(k0, i))
            return jax.lax.fori_loop(0, nf, body, jnp.zeros(3)) / nf

        m = np.asarray(run(jax.random.PRNGKey(7), 8))
        return {"mean": float(m[0]), "var": float(m[1]),
                "tail_count_8sigma": float(m[2])}

    out["moments_pallas_prng"] = moments(stages_gen.noise_rdm)
    out["moments_pallas_jaxrandom"] = moments(stages.noise_rdm)
    r = (out["moments_pallas_prng"]["var"]
         / out["moments_pallas_jaxrandom"]["var"])
    out["var_ratio"] = r
    out["moments_pass"] = bool(abs(r - 1.0) < 0.02
                               and abs(out["moments_pallas_prng"]["mean"])
                               < 1e-2)
    print(json.dumps({k: out[k] for k in
                      ("moments_pallas_prng", "moments_pallas_jaxrandom",
                       "var_ratio", "moments_pass")}), flush=True)

    res = os.path.join(os.path.dirname(__file__), "..", "results",
                       "rdm_gen.json")
    with open(res, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", os.path.normpath(res))


if __name__ == "__main__":
    main()
