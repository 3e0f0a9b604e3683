"""Smoke tests for the operating-curve artifact generators — the scripts
behind the BASELINE "Pd at fixed Pfa" headline (results/roc_full.json,
results/roc_realdata.json). Tiny CPU runs; guards the traced-threshold
sweep machinery and the artifact schema against regressions."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, extra, out):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", script), "--cpu",
         "--out", str(out)] + extra,
        cwd=REPO, capture_output=True, text=True, timeout=560,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert proc.returncode == 0, (
        f"{script} failed\nstdout:\n{proc.stdout[-3000:]}\n"
        f"stderr:\n{proc.stderr[-3000:]}")
    return json.loads(out.read_text())


@pytest.mark.slow
def test_roc_full_smoke(tmp_path):
    rep = _run("run_roc_full.py",
               ["--small", "--trials", "4", "--batch", "4",
                "--noise-frames", "2", "--noise-batch", "2",
                "--snr=-31", "--png", str(tmp_path / "roc.png")],
               tmp_path / "roc.json")
    assert rep["t_factors"] == [3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0,
                                12.0]
    assert len(rep["pd"]) == len(rep["pfa"]) == 9
    assert rep["noise_cells"] > 0
    assert "Pd=" in rep["headline"]["statement"]
    # Pfa must be non-increasing in T (same draws, nested thresholds)
    for a, b in zip(rep["pfa_hits"], rep["pfa_hits"][1:]):
        assert a >= b


@pytest.mark.slow
def test_roc_realdata_smoke(tmp_path):
    rep = _run("run_roc_realdata.py",
               ["--trials", "4", "--batch", "4", "--noise-frames", "2",
                "--noise-batch", "2", "--amp", "0.05",
                # --png must be overridden: the script's default points at
                # the COMMITTED measured artifact results/roc_realdata.png
                "--png", str(tmp_path / "roc_rd.png")],
               tmp_path / "roc_rd.json")
    assert len(rep["pd"]) == len(rep["pfa"]) == 9
    # amp 0.05 is ~9 dB above the transition: every threshold detects
    assert rep["pd"][0] == 1.0
    assert rep["truth_cell"][1] == 1500       # injection lands on its gate
    for a, b in zip(rep["pfa_hits"], rep["pfa_hits"][1:]):
        assert a >= b
