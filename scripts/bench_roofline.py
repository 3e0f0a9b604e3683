"""Roofline/MFU annotation for results/kernel_bench.json (VERDICT r2 item
8): per-op achieved GFLOP/s and fraction-of-peak on TPU v5e, so "fast" is
judged against the hardware ceiling instead of history.

Flop counts are EXECUTED dense-matmul flops derived from the actual kernel
plans (the MXU multiplies the padded dense operands; band zeros still cost
cycles), not algorithmic minimums — that is the number MFU is defined
against. Measured times come from the recorded artifacts (kernel_bench,
pallas_profile, frame_timing); re-run those first for fresh numbers.

v5e public peaks: 197 TFLOP/s bf16 (MXU), ~0.82 TB/s HBM.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

PEAK_BF16 = 197e12
PEAK_HBM = 819e9

RES = os.path.join(os.path.dirname(__file__), "..", "results")


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from radar_tpu.config.params import perf_config
    from radar_tpu.ops.mtd import make_mtd_matrix
    from radar_tpu.ops.pallas_rdm import make_rdm_plan
    from radar_tpu.waveform.precompute import precompute

    cfg = perf_config()
    pre = precompute(cfg)
    mtd_mat = make_mtd_matrix(pre.mtd_win, cfg.sig.prt_num, cfg.mtd_fft_len)
    rplan = make_rdm_plan(pre, mtd_mat, cfg.sig.prt_num, tile=128, lane=128)
    num_b = pre.dbf_w.shape[0]

    # executed flops of the fused noise-RDM kernel, per frame: each gate
    # tile of each segment runs, per beam, a [p_pad, w_pad] x [w_pad, tile]
    # complex matmul (PC, 4 real matmuls = 8 p*w*t flops) and a
    # [v_pad, p_pad] x [p_pad, tile] complex matmul (MTD); the mix tail is
    # one [v_pad*tile, B] x [B, B] complex contraction per gate tile.
    kernel_flops = 0
    n_gate_tiles = 0
    for seg in rplan.segments:
        ntiles = -(-seg.j_len // seg.tile)
        w_pad = seg.mpr.shape[0]
        pc = 8 * rplan.p_pad * w_pad * seg.tile
        mtd = 8 * rplan.v_pad * rplan.p_pad * seg.tile
        kernel_flops += ntiles * num_b * (pc + mtd)
        n_gate_tiles += ntiles
        mix = 8 * rplan.v_pad * seg.tile * num_b * num_b
        kernel_flops += ntiles * mix
    # kernel HBM write: (re, im) output planes [B, V, G] (+ signal path f32)
    out_bytes = 2 * num_b * rplan.n_dop * rplan.n_gates * 4

    art = lambda n: json.load(open(os.path.join(RES, n)))
    kb = art("kernel_bench.json")
    prof = art("pallas_profile.json")
    ft = art("frame_timing.json")

    kernel_ms = prof.get("kernel_ms", 1.60)
    frame_ms = ft["full_16ch_332p"]["frame_ms"]

    def entry(flops, ms, extra=None):
        gfs = flops / (ms * 1e-3) / 1e9
        e = {"executed_gflop": round(flops / 1e9, 2), "ms": ms,
             "achieved_gflops": round(gfs, 1),
             "mfu_vs_bf16_peak": round(gfs * 1e9 / PEAK_BF16, 4)}
        if extra:
            e.update(extra)
        return e

    # DBF flops: [P, S, C] x [C, B] complex
    s = cfg.sig
    dbf_flops = 8 * s.prt_num * s.point_prt * s.channel_num * num_b
    roof = {
        "peaks": {"bf16_tflops": PEAK_BF16 / 1e12,
                  "hbm_gb_s": PEAK_HBM / 1e9},
        "note": ("executed dense-matmul flops from the real plans (padded "
                 "operands; band zeros cost MXU cycles too) — the MFU "
                 "denominator, not the algorithmic minimum"),
        "dbf_16ch_13beam": entry(dbf_flops, kb["dbf_16ch_13beam"]["ms"]),
        "fused_noise_rdm_kernel": entry(
            kernel_flops, kernel_ms,
            {"out_write_mb": round(out_bytes / 1e6, 1),
             "write_gb_s": round(out_bytes / (kernel_ms * 1e-3) / 1e9, 1),
             "mxu_floor_ms_at_peak": round(kernel_flops / PEAK_BF16 * 1e3,
                                           3)}),
        "e2e_frame_perf_config": entry(kernel_flops + dbf_flops * 0,
                                       frame_ms,
                                       {"note": "kernel flops dominate; "
                                        "tail stages are VPU/gather work"}),
    }
    kb["roofline"] = roof
    with open(os.path.join(RES, "kernel_bench.json"), "w") as f:
        json.dump(kb, f, indent=1)
    print(json.dumps({k: v for k, v in roof.items() if k != "peaks"},
                     indent=1))
    print("wrote results/kernel_bench.json roofline block")


if __name__ == "__main__":
    main()
