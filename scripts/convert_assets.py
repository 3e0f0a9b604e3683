"""Convert the reference calibration CSV assets into .npz data files.

The reference ships two measured-calibration CSVs (see SURVEY.md L0):
  - ``Simulation/X8数据采集250522_DBFcoef.csv``: 13 beams x 16 complex channels,
    stored as 32 interleaved I/Q columns (loaded at
    ``main_simulate_echoes_with_array_v8_3.m:181-183``).
  - ``Simulation/R9-DMX3-2024001_Angle_k.csv``: per-frequency-point monopulse
    K values, 12 beam-pair columns (indexed by ``freq_no`` at
    ``main_test_with_simulated_data.m:219-221``).

These are measured data, not code; we re-store them as .npz so the framework
ships self-contained assets in its own format.

Run once: ``python scripts/convert_assets.py``
"""

from __future__ import annotations

import os

import numpy as np

REF_SIM = "/root/reference/Simulation"
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "radar_tpu", "config", "data")


def read_csv_matrix(path: str) -> np.ndarray:
    rows = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rows.append([float(x) for x in line.split(",") if x != ""])
    return np.asarray(rows, dtype=np.float64)


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)

    dbf_raw = read_csv_matrix(os.path.join(REF_SIM, "X8数据采集250522_DBFcoef.csv"))
    assert dbf_raw.shape[1] == 32, dbf_raw.shape
    dbf = dbf_raw[:, 0::2] + 1j * dbf_raw[:, 1::2]  # [n_beams, 16] complex
    print("DBF coeffs:", dbf.shape)

    angle_k = read_csv_matrix(os.path.join(REF_SIM, "R9-DMX3-2024001_Angle_k.csv"))
    print("Angle_k:", angle_k.shape)

    np.savez(os.path.join(OUT_DIR, "dbf_coeffs.npz"), dbf=dbf)
    np.savez(os.path.join(OUT_DIR, "angle_k.npz"), angle_k=angle_k)

    # FIR.mat: 12-tap decimation low-pass used by the DDC tutorial
    # (simulation_learn.m:94-102)
    import scipy.io

    fir = scipy.io.loadmat(os.path.join(REF_SIM, "FIR.mat"))["Num"].ravel()
    print("DDC FIR taps:", fir.shape)
    np.savez(os.path.join(OUT_DIR, "ddc_fir.npz"), taps=fir)
    print("wrote", OUT_DIR)


if __name__ == "__main__":
    main()
