"""Ablate the fused noise-RDM kernel's stages on the TPU: time variants of
the production kernel with the MTD and/or mix matmuls removed (PC result
written straight to the output block — v_pad == p_pad so shapes line up).
Slope method per .claude/skills/verify/SKILL.md. Writes
results/rdm_ablation.json."""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def loop_time(step_fn, n1=5, n2=45):
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


def make_kernel(p_pad, v_pad, window, num_b, mul_dtype, stage):
    def kernel(xr_hbm, xi_hbm, mpr_ref, mpi_ref, dr_ref, di_ref,
               lr_ref, li_ref, yr_ref, yi_ref, mtr_s, mti_s, sems,
               xr_s, xi_s):
        t = pl.program_id(0)
        b = pl.program_id(1)
        n_t = pl.num_programs(0)
        tile = yr_ref.shape[-1]
        step = t * num_b + b
        slot = jax.lax.rem(step, jnp.int32(2))
        nslot = 1 - slot

        def dma(s, stp):
            tt = stp // num_b
            bb = jax.lax.rem(stp, jnp.int32(num_b))
            return (pltpu.make_async_copy(
                        xr_hbm.at[bb, :, pl.ds(tt * tile, window)],
                        xr_s.at[s], sems.at[s, 0]),
                    pltpu.make_async_copy(
                        xi_hbm.at[bb, :, pl.ds(tt * tile, window)],
                        xi_s.at[s], sems.at[s, 1]))

        @pl.when(step == 0)
        def _():
            r0, i0 = dma(slot, step)
            r0.start()
            i0.start()

        @pl.when(step + 1 < n_t * num_b)
        def _():
            rn, in_ = dma(nslot, step + 1)
            rn.start()
            in_.start()

        cur_r, cur_i = dma(slot, step)
        cur_r.wait()
        cur_i.wait()
        xr = xr_s[slot]
        xi = xi_s[slot]
        mpr = mpr_ref[:]
        mpi = mpi_ref[:]
        f32 = jnp.float32
        if stage == "dma":
            mtr_s[b] = xr[:, :tile].astype(mul_dtype)
            mti_s[b] = xi[:, :tile].astype(mul_dtype)
        else:
            pcr = (jnp.dot(xr, mpr, preferred_element_type=f32)
                   - jnp.dot(xi, mpi, preferred_element_type=f32))
            pci = (jnp.dot(xr, mpi, preferred_element_type=f32)
                   + jnp.dot(xi, mpr, preferred_element_type=f32))
            pcr16 = pcr.astype(mul_dtype)
            pci16 = pci.astype(mul_dtype)
            if stage == "pc":
                mtr_s[b] = pcr16
                mti_s[b] = pci16
            else:
                dr = dr_ref[:]
                di = di_ref[:]
                mtr_s[b] = (jnp.dot(dr, pcr16, preferred_element_type=f32)
                            - jnp.dot(di, pci16, preferred_element_type=f32)
                            ).astype(mul_dtype)
                mti_s[b] = (jnp.dot(dr, pci16, preferred_element_type=f32)
                            + jnp.dot(di, pcr16, preferred_element_type=f32)
                            ).astype(mul_dtype)

        @pl.when(b == num_b - 1)
        def _():
            if stage == "full":
                lr = lr_ref[:]
                li = li_ref[:]
                mtr = mtr_s[:]
                mti = mti_s[:]
                dn = (((1,), (0,)), ((), ()))
                rr = jax.lax.dot_general(lr, mtr, dn,
                                         preferred_element_type=f32)
                ri = jax.lax.dot_general(lr, mti, dn,
                                         preferred_element_type=f32)
                ir = jax.lax.dot_general(li, mtr, dn,
                                         preferred_element_type=f32)
                ii = jax.lax.dot_general(li, mti, dn,
                                         preferred_element_type=f32)
                yr_ref[...] = rr - ii
                yi_ref[...] = ri + ir
            else:
                yr_ref[...] = mtr_s[:].astype(f32)
                yi_ref[...] = mti_s[:].astype(f32)

    return kernel


def run_variant(stage, lr_stages, plan, l_np, num_b, mul=jnp.bfloat16):
    def call(xrs, xis):
        lr_c = jnp.asarray(np.asarray(l_np).real, jnp.float32)
        li_c = jnp.asarray(np.asarray(l_np).imag, jnp.float32)
        pieces = []
        for seg, xr, xi in zip(plan.segments, xrs, xis):
            ntiles = -(-seg.j_len // seg.tile)
            jpad = ntiles * seg.tile
            kernel = make_kernel(plan.p_pad, plan.v_pad, seg.window, num_b,
                                 mul, stage)
            const_spec = lambda shp: pl.BlockSpec(
                shp, lambda t, b: (0, 0), memory_space=pltpu.VMEM)
            yr, yi = pl.pallas_call(
                kernel,
                grid=(ntiles, num_b),
                in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                          pl.BlockSpec(memory_space=pltpu.HBM),
                          const_spec((seg.window, seg.tile)),
                          const_spec((seg.window, seg.tile)),
                          const_spec((plan.v_pad, plan.p_pad)),
                          const_spec((plan.v_pad, plan.p_pad)),
                          const_spec((num_b, num_b)),
                          const_spec((num_b, num_b))],
                out_specs=[pl.BlockSpec((num_b, plan.v_pad, seg.tile),
                                        lambda t, b: (0, 0, t),
                                        memory_space=pltpu.VMEM)] * 2,
                out_shape=[jax.ShapeDtypeStruct(
                    (num_b, plan.v_pad, jpad), jnp.float32)] * 2,
                scratch_shapes=[
                    pltpu.VMEM((num_b, plan.v_pad, seg.tile), mul),
                    pltpu.VMEM((num_b, plan.v_pad, seg.tile), mul),
                    pltpu.SemaphoreType.DMA((2, 2)),
                    pltpu.VMEM((2, plan.p_pad, seg.window), mul),
                    pltpu.VMEM((2, plan.p_pad, seg.window), mul)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(xr, xi, jnp.asarray(seg.mpr, mul), jnp.asarray(seg.mpi, mul),
              jnp.asarray(plan.dr, mul), jnp.asarray(plan.di, mul),
              lr_c.astype(mul), li_c.astype(mul))
            pieces.append(yr[:, :plan.n_dop, :seg.j_len]
                          + yi[:, :plan.n_dop, :seg.j_len])
        return sum(jnp.sum(jnp.abs(p)) for p in pieces)

    def step(key):
        xrs, xis = lr_stages.noise_planes(key)
        return call(xrs, xis)

    return loop_time(step)


def main() -> None:
    from radar_tpu.config.params import perf_config
    from radar_tpu.ops.dbf import dbf_weights_effective_np
    from radar_tpu.ops.mtd import make_mtd_matrix
    from radar_tpu.ops.pallas_rdm import make_rdm_plan
    from radar_tpu.ops.pulse_compression import make_matmul_plan
    from radar_tpu.pipeline.lowrank import make_lowrank_stages
    from radar_tpu.sim.echo import beam_noise_factor
    from radar_tpu.waveform.precompute import precompute

    cfg = perf_config()
    pre = precompute(cfg)
    mplan = make_matmul_plan(pre)
    mtd_mat = make_mtd_matrix(pre.mtd_win, cfg.sig.prt_num, cfg.mtd_fft_len)
    plan = make_rdm_plan(pre, mtd_mat, cfg.sig.prt_num, tile=128)
    w_eff = dbf_weights_effective_np(np.asarray(pre.dbf_w), cfg.dbf_variant)
    l_np = beam_noise_factor(w_eff)
    lr = make_lowrank_stages(cfg, pre, None, mplan, mtd_mat, pre.mtd_win,
                             jnp.complex64)

    def gen_only(key):
        xrs, xis = lr.noise_planes(key)
        acc = jnp.float32(0)
        for x in xrs + xis:
            acc += jnp.sum(jnp.abs(x.astype(jnp.float32)))
        return acc

    out = {"device": jax.devices()[0].device_kind}
    out["gen_ms"] = round(1e3 * loop_time(gen_only), 3)
    print(json.dumps(out))
    for stage in ("dma", "pc", "mtd", "full"):
        out[stage + "_ms"] = round(
            1e3 * run_variant(stage, lr, plan, l_np, 13), 3)
        print(json.dumps(out))
    with open(os.path.join(os.path.dirname(__file__), "..", "results",
                           "rdm_ablation.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
