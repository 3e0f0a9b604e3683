"""Static flop analysis of the fused kernel's banded-PC dots — the
VERDICT-r3 stretch hypothesis ("per-segment band widths: the narrow
segment's 35-tap band wastes most of a 128-wide tile; or a two-level PC
dot that skips all-zero band blocks") resolved by counting, not building.

Writes results/band_flops.json. Run on any backend (pure host math).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from radar_tpu.config.params import perf_config
    from radar_tpu.ops.mtd import make_mtd_matrix
    from radar_tpu.ops.pallas_rdm import make_rdm_plan
    from radar_tpu.waveform.precompute import precompute

    cfg = perf_config()
    pre = precompute(cfg)
    m = make_mtd_matrix(pre.mtd_win, cfg.sig.prt_num, cfg.mtd_fft_len)
    plan = make_rdm_plan(pre, m, cfg.sig.prt_num, tile=128, lane=128)

    segs, tot_exec, tot_band, tot_alg = [], 0, 0, 0
    full_chunks_skippable = 0
    for i, s in enumerate(plan.segments):
        ntiles = -(-s.j_len // s.tile)
        dens = (np.abs(s.mpr) + np.abs(s.mpi)).sum(axis=1)
        nzrows = int(np.count_nonzero(dens > 0))
        lh = int(np.count_nonzero(
            np.abs(s.mpr[:, 0]) + np.abs(s.mpi[:, 0]) > 0))
        # fully-zero 128-row chunks of the filter plane = statically
        # skippable partial dots in the rolling-chunk decomposition
        zero_chunks = sum(
            1 for c in range(s.window // 128)
            if not np.any(dens[c * 128:(c + 1) * 128] > 0))
        full_chunks_skippable += zero_chunks * ntiles
        per = 8 * ntiles * plan.p_pad * s.tile  # re/im: 4 dots, 2 flops/MAC
        tot_exec += per * s.window
        tot_band += per * nzrows
        tot_alg += per * lh
        segs.append({"segment": i, "taps": lh, "tile": s.tile,
                     "window_rows": s.window, "nonzero_rows": nzrows,
                     "tiles": ntiles, "pad_waste_pct":
                     round(100 * (1 - nzrows / s.window), 1),
                     "fully_zero_128row_chunks": zero_chunks})

    out = {
        "question": "can the fused kernel's 0.46 ms residue be attacked by "
                    "removing banded-PC flops (per-segment band widths / "
                    "zero-block skipping)?",
        "answer": "NO - resolved statically, nothing worth building",
        "segments": segs,
        "pc_gflop_executed": round(tot_exec / 1e9, 2),
        "pc_gflop_band_minimum": round(tot_band / 1e9, 2),
        "pc_gflop_algorithmic_lh_rows": round(tot_alg / 1e9, 2),
        "finding_1": "band-padding waste is 9% of PC flops (7.13 -> 6.48 "
                     "GFLOP); at the 0.74 ms MXU floor that is <= 0.046 ms "
                     "- under the repo's 0.05 ms adoption bar even at "
                     "100% MFU on the recovered flops",
        "finding_2": "zero-block skipping at the kernel's 128-lane chunk "
                     "granularity removes NOTHING: every segment's last "
                     "chunk is partially inside the band (narrow: rows "
                     "162-255 zero but chunk 1 spans 128-255), so "
                     "fully-zero chunks = 0 across all segments/tiles",
        "finding_3": "the true algorithmic minimum (lh rows/column, 5.23 "
                     "GFLOP, -27%) requires repacking shifted input "
                     "copies - the relayout-traffic pattern this repo "
                     "measured NEGATIVE three times (kernel_maps, matmul "
                     "CFAR means, tail_from_rdm); not built",
        "ref": "segment structure fun_process_single_frame.m:99-127; "
               "VERDICT r3 weak #6 / next #8",
    }
    path = os.path.join(REPO, "results", "band_flops.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    print("wrote", path)


if __name__ == "__main__":
    main()
