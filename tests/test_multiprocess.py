"""Real 2-process ``jax.distributed`` execution of the multi-host path
(SURVEY.md section 4 "multi-node without a cluster"; the reference's only
parallel boundary is the ``parfor`` at main_plot_snr_vs_angle_error.m:167).

Spawns scripts/run_multiprocess.py, which launches two OS processes, each
with 2 virtual CPU devices, joined through a localhost coordinator (Gloo
cross-process collectives). Every worker asserts detection parity of the
process-spanning sharded pipeline (stream dp x ch, lowrank dp x cpi, and a
dp-sharded trial batch fed via multihost.local_batch_slice +
jax.make_array_from_process_local_data) against a process-local
single-device run. This is the only place the process-id mesh construction
and per-process batch slicing of parallel/multihost.py execute for real.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "run_multiprocess.py")


@pytest.mark.slow
def test_two_process_distributed_parity(tmp_path):
    out = tmp_path / "multiprocess_parity.json"
    env = dict(os.environ)
    # the orchestrator sets worker env itself; scrub this pytest process's
    # CPU pinning so it doesn't leak confusing duplicates into workers
    proc = subprocess.run(
        [sys.executable, SCRIPT, "--nproc", "2", "--devices-per-proc", "2",
         "--logdir", str(tmp_path), "--out", str(out), "--timeout", "540"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, (
        f"multiprocess run failed\nstdout:\n{proc.stdout}\n"
        f"stderr:\n{proc.stderr}")
    report = json.loads(out.read_text())
    assert report["nproc"] == 2
    names = {c["name"] for c in report["checks"]}
    # perf_dp joined in round 3 (the dp-sharded perf-path batch check)
    assert names == {"stream_dpxch", "lowrank_dpxcpi", "trials_dp",
                     "perf_dp"}
    assert all(c["ok"] for c in report["checks"])


@pytest.mark.slow
def test_streaming_mc_across_processes(tmp_path):
    """BASELINE config 5's process boundary: the scene-sharded streaming
    Monte-Carlo across 2 coordinator-joined processes produces EXACTLY the
    single-process statistics at the same seed (records gathered across
    the jax.distributed boundary through the dp mesh)."""
    out = tmp_path / "streaming_mc_multiproc.json"
    proc = subprocess.run(
        [sys.executable, SCRIPT, "--streaming", "--arms", "1,2",
         "--scenes", "4", "--targets-per-scene", "3",
         "--trials-per-scene", "2", "--logdir", str(tmp_path),
         "--out", str(out), "--timeout", "540"],
        env=dict(os.environ), cwd=REPO, capture_output=True, text=True,
        timeout=600)
    assert proc.returncode == 0, (
        f"streaming multiproc run failed\nstdout:\n{proc.stdout}\n"
        f"stderr:\n{proc.stderr}")
    report = json.loads(out.read_text())
    assert report["parity_exact_across_arms"] is True
    assert report["arms"]["2"]["nproc"] == 2
    assert report["arms"]["2"]["injected_targets"] == 4 * 3 * 2
