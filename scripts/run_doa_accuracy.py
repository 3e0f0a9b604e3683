"""Monte-Carlo accuracy of every 128-element DoA method — the statistical
half of BASELINE config 4 ("MUSIC 1D/2D ... scaled to 128 elements")
beside kernel_bench.json's speed half.

Off-grid truths, fresh noise per trial; reports per-method RMSE (deg):

  1D (128-el ULA): grid MUSIC (0.1-deg scan), root-MUSIC, TLS-ESPRIT,
     and the COHERENT pair through forward-backward smoothing.
  2D (16x8 URA): grid MUSIC (1-deg), + two-stage zoom refinement,
     2D TLS-ESPRIT (auto-paired), and a coherent pair through 2D
     smoothing.

CPU by default: accuracy is hardware-independent statistics, and the
float64 covariance/eigh the estimators prefer is CPU-only on this stack.
Writes results/doa_accuracy.json (~2 min).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=50)
    ap.add_argument("--snapshots", type=int, default=512)
    ap.add_argument("--out", default=os.path.join(REPO, "results",
                                                  "doa_accuracy.json"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    # f64 snapshots for the statistics run; the estimators are ALSO
    # robust on complex64 input since their [C, C] subspace tail promotes
    # to host float64 internally (superres._host_eigvecs_f64,
    # tests/test_doa.py::test_superres_robust_at_complex64)
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from radar_tpu.config.params import full_config
    from radar_tpu.doa.music import (find_peaks_1d, music_1d, music_2d,
                                     simulate_snapshots, steering_ura)
    from radar_tpu.doa.superres import esprit_1d, esprit_2d, root_music_1d

    cfg = full_config()
    d, wl = cfg.array.element_spacing, cfg.sig.wavelength
    trials, snap, snr_db = args.trials, args.snapshots, 5.0
    rng = np.random.default_rng(20260821)
    t0 = time.time()

    def rmse(errs):
        return float(np.sqrt(np.mean(np.square(errs))))

    # ---- 1D: 128-element ULA, 1-deg-separated off-grid pair -----------
    truth1 = np.array([-1.53, -0.47])      # sub-beamwidth separation
    scan = np.arange(-20.0, 20.0 + 1e-9, 0.1)
    errs = {"music_grid": [], "root_music": [], "tls_esprit": []}
    for t in range(trials):
        key = jax.random.PRNGKey(int(rng.integers(2**31)))
        x = simulate_snapshots(key, truth1, 128, d, wl, snap,
                               snr_db=snr_db, dtype=jnp.complex128)
        errs["music_grid"].append(
            music_1d(x, 2, d, wl, scan).peaks_deg - truth1)
        errs["root_music"].append(root_music_1d(x, 2, d, wl) - truth1)
        errs["tls_esprit"].append(esprit_1d(x, 2, d, wl) - truth1)
    res_1d = {k: rmse(np.concatenate(v)) for k, v in errs.items()}

    # coherent pair (multipath) through forward-backward smoothing
    from radar_tpu.doa.steering import steering_vector

    truth1c = np.array([-8.3, 4.6])
    a1 = steering_vector(truth1c, 128, d, wl)
    errs_c = []
    for t in range(trials):
        s0 = (rng.normal(size=snap) + 1j * rng.normal(size=snap))
        s = np.stack([s0, 0.7 * np.exp(1j * 1.3) * s0])   # coherent copy
        n = (rng.normal(size=(128, snap))
             + 1j * rng.normal(size=(128, snap))) * np.sqrt(0.5) * 0.3
        x = jnp.asarray(a1 @ s / np.sqrt(2) + n, jnp.complex128)
        errs_c.append(root_music_1d(x, 2, d, wl, smooth=64)
                      - np.sort(truth1c))
    res_1d["root_music_coherent_smooth64"] = rmse(np.concatenate(errs_c))

    # ---- 2D: 16x8 URA, off-grid (az, el) ------------------------------
    nx, ny = 16, 8
    truth2 = np.array([[12.34, 25.71], [-40.62, 55.43]])
    a2 = steering_ura(truth2[:, 0], truth2[:, 1], nx, ny, 0.5)
    a2 = np.stack([a2[:, i * len(truth2) + i]
                   for i in range(len(truth2))], axis=1)
    az = np.arange(-60.0, 60.0 + 1e-9, 1.0)
    el = np.arange(10.0, 80.0 + 1e-9, 1.0)
    want2 = truth2[np.argsort(truth2[:, 0])]
    errs2 = {"music_grid_1deg": [], "music_zoom": [], "esprit_2d": []}
    for t in range(trials):
        s = (rng.normal(size=(2, snap))
             + 1j * rng.normal(size=(2, snap))) / np.sqrt(2)
        n = (rng.normal(size=(nx * ny, snap))
             + 1j * rng.normal(size=(nx * ny, snap))) * np.sqrt(0.5) * 0.1
        x = jnp.asarray(a2 @ s + n, jnp.complex128)
        for name, res in (
                ("music_grid_1deg",
                 music_2d(x, 2, nx, ny, 0.5, az_deg=az, el_deg=el)),
                ("music_zoom",
                 music_2d(x, 2, nx, ny, 0.5, az_deg=az, el_deg=el,
                          refine=True))):
            got = res.peaks_deg[np.argsort(res.peaks_deg[:, 0])]
            errs2[name].append((got - want2).ravel())
        got = esprit_2d(x, 2, nx, ny, 0.5)
        errs2["esprit_2d"].append((got - want2).ravel())
    res_2d = {k: rmse(np.concatenate(v)) for k, v in errs2.items()}

    # coherent 2D pair through 2D smoothing
    truth2c = np.array([[10.5, 30.2], [-25.4, 52.8]])
    a2c = steering_ura(truth2c[:, 0], truth2c[:, 1], nx, ny, 0.5)
    a2c = np.stack([a2c[:, i * len(truth2c) + i]
                    for i in range(len(truth2c))], axis=1)
    want2c = truth2c[np.argsort(truth2c[:, 0])]
    errs2c = []
    for t in range(trials):
        s0 = (rng.normal(size=snap) + 1j * rng.normal(size=snap))
        s = np.stack([s0, 0.8 * np.exp(1j * 2.1) * s0])
        n = (rng.normal(size=(nx * ny, snap))
             + 1j * rng.normal(size=(nx * ny, snap))) * np.sqrt(0.5) * 0.05
        x = jnp.asarray(a2c @ s / np.sqrt(2) + n, jnp.complex128)
        got = esprit_2d(x, 2, nx, ny, 0.5, smooth=(12, 6))
        errs2c.append((got - want2c).ravel())
    res_2d["esprit_2d_coherent_smooth12x6"] = rmse(np.concatenate(errs2c))

    out = {
        "trials": trials, "snapshots": snap, "snr_db": snr_db,
        "elements": 128,
        "1d_ula": {"truth_deg": truth1.tolist(),
                   "separation_deg": float(np.diff(truth1)[0]),
                   "rmse_deg": {k: round(v, 4) for k, v in res_1d.items()},
                   "note": "grid RMSE floors at the 0.1-deg scan "
                           "quantization; the search-free methods go "
                           "below it"},
        "2d_ura_16x8": {"truth": truth2.tolist(),
                        "rmse_deg": {k: round(v, 4)
                                     for k, v in res_2d.items()},
                        "note": "grid at 1 deg floors at ~0.3 (uniform "
                                "quantization); zoom and 2D ESPRIT are "
                                "sub-0.1"},
        "wall_s": round(time.time() - t0, 1),
        "device": "cpu (statistics are hardware-independent; float64 "
                  "estimator path)",
        "ref": "MUSIC_1D.m / MUSIC_2D.m / run_music_algorithm.m scaled "
               "per BASELINE.json config 4; search-free + coherent "
               "methods are beyond-reference",
    }
    path = args.out
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    print("wrote", path)


if __name__ == "__main__":
    main()
