"""Smoke tests for the remaining CLI drivers that had none: the flagship
multi-frame simulation runner, the Monte-Carlo SNR sweep, the
calibration tool, and the DoA-accuracy harness. Tiny CPU runs writing
only into tmp_path — the guardrail the e7b2f40 clobbering incident
showed untested script paths need (every artifact path is passed
explicitly; nothing may touch the committed results/)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, extra, timeout=560):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", script)] + extra,
        cwd=REPO, capture_output=True, text=True, timeout=timeout,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert proc.returncode == 0, (
        f"{script} failed\nstdout:\n{proc.stdout[-3000:]}\n"
        f"stderr:\n{proc.stderr[-3000:]}")
    return proc.stdout


@pytest.mark.slow
def test_run_simulation_smoke(tmp_path):
    out = tmp_path / "out_sim"
    stdout = _run("run_simulation.py",
                  ["--cpu", "--small", "--frames", "2", "--out", str(out)])
    assert "processed 2 frames" in stdout
    # the full artifact set of the flagship driver (viz + system of record)
    for f in ("detection_log.json", "ppi.png", "rhi.png",
              "track_history.png", "clusters.png"):
        assert (out / f).exists(), f
    log = json.loads((out / "detection_log.json").read_text())
    # the small config's injected target is detected in both frames
    assert len(log) >= 2
    assert {row["frame"] for row in log} == {1, 2}  # 1-indexed frames
    assert all(row["range_m"] > 0 for row in log)


@pytest.mark.slow
def test_run_simulation_resume_cli(tmp_path):
    """Restart-on-failure at the CLI surface (SURVEY 5.3): a 2-frame
    --resume run rerun at 4 frames replays 1-2 from disk and only
    processes 3-4."""
    out = tmp_path / "simres"
    _run("run_simulation.py", ["--cpu", "--small", "--frames", "2",
                               "--resume", "--out", str(out)])
    stdout = _run("run_simulation.py", ["--cpu", "--small", "--frames", "4",
                                        "--resume", "--out", str(out)])
    assert "resuming: frames 1..2 replay" in stdout
    log = json.loads((out / "detection_log.json").read_text())
    assert {row["frame"] for row in log} == {1, 2, 3, 4}


@pytest.mark.slow
def test_run_simulation_device_scan_resume_cli(tmp_path):
    """The chunked on-device lax.scan variant of the same contract."""
    out = tmp_path / "dsres"
    _run("run_simulation.py", ["--cpu", "--small", "--frames", "2",
                               "--device-scan", "--resume",
                               "--out", str(out)])
    stdout = _run("run_simulation.py", ["--cpu", "--small", "--frames", "4",
                                        "--device-scan", "--resume",
                                        "--out", str(out)])
    assert "resuming: chunks ending at" in stdout
    log = json.loads((out / "detection_log.json").read_text())
    assert {row["frame"] for row in log} == {1, 2, 3, 4}


@pytest.mark.slow
def test_run_snr_sweep_smoke(tmp_path):
    js = tmp_path / "sweep.json"
    _run("run_snr_sweep.py",
         ["--cpu", "--small", "--trials", "2", "--batch", "2",
          "--snr=-31:2:-29", "--json", str(js),
          "--out", str(tmp_path / "sweep.png")])
    rep = json.loads(js.read_text())
    assert rep["snr_db"] == [-31.0, -29.0]
    assert len(rep["detection_probability"]) == 2
    assert len(rep["angle_error_std_deg"]) == 2
    assert len(rep["theory_bound_deg"]) == 2
    assert rep["trials"] == 2
    assert (tmp_path / "sweep.png").exists()


@pytest.mark.slow
def test_run_calibration_smoke(tmp_path):
    png = tmp_path / "beam.png"
    stdout = _run("run_calibration.py", ["--cpu", "--out", str(png)])
    assert png.exists()
    assert "beam_angles_deg" in stdout and "k_slopes_LUT" in stdout
    # 16-channel default -> the reference's 13 beams / 12 crossover pairs
    assert "pair 11:" in stdout and "pair 12:" not in stdout


@pytest.mark.slow
def test_run_doa_accuracy_smoke(tmp_path):
    js = tmp_path / "doa.json"
    _run("run_doa_accuracy.py",
         ["--trials", "2", "--snapshots", "128", "--out", str(js)])
    rep = json.loads(js.read_text())
    assert rep["trials"] == 2 and rep["elements"] == 128
    r1 = rep["1d_ula"]["rmse_deg"]
    for k in ("music_grid", "root_music", "tls_esprit",
              "root_music_coherent_smooth64"):
        assert k in r1, k
    r2 = rep["2d_ura_16x8"]["rmse_deg"]
    for k in ("music_grid_1deg", "music_zoom", "esprit_2d",
              "esprit_2d_coherent_smooth12x6"):
        assert k in r2, k
    # the search-free methods resolve the pair even at 2 trials: errors
    # are fractions of the 1.06-deg separation, not association failures
    assert r1["root_music"] < 0.5 and r1["tls_esprit"] < 0.5
