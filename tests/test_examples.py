"""Smoke-run every tutorial in examples/ as a subprocess from a TEMP cwd.

Guardrail motivated by the round-4 self-review incident (e7b2f40: an
untested script path silently clobbered a committed measured figure):
the tutorials import the public API and claim measured behaviors, so
they rot silently without execution. Each runs with cwd=tmp_path so any
relative outputs (out_debug/, out_realdata/) land in the sandbox, never
in the repo; the test asserts exit 0 AND that nothing appeared in the
repo's committed results/ or out_* directories.

Reference counterparts: the pedagogy scripts test.m / simulation_learn.m
(SURVEY.md section 2.2).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = sorted(
    f for f in os.listdir(os.path.join(REPO, "examples"))
    if f.endswith(".py"))

# outputs each example creates (relative to its cwd); empty = stdout-only
EXPECTED = {
    "02_single_frame_debug.py": ["out_debug"],
    "04_realdata_stages.py": ["out_realdata"],
}


def _repo_tree_snapshot():
    """File NAMES under the example-output dirs in the repo. Names only
    and NOT results/: other legitimate processes (benchmark/ROC runs)
    create and rewrite results/ members while the suite runs, and the
    examples' clobber vector — relative output paths — is already
    neutralized by the tmp cwd; this check catches an example CREATING
    files in the repo's out_* dirs via absolute paths."""
    out = set()
    for d in ("out_debug", "out_realdata"):
        p = os.path.join(REPO, d)
        if os.path.isdir(p):
            out |= {(d, f) for f in os.listdir(p)}
    return out


def test_examples_cover_all_files():
    """The parametrized list below tracks the directory: a new tutorial
    must be added here (and thereby smoke-tested) to ship."""
    assert EXAMPLES == [
        "01_pulse_compression_basics.py",
        "02_single_frame_debug.py",
        "03_music_doa.py",
        "04_realdata_stages.py",
        "05_elastic_checkpointing.py",
        "06_five_target_tracking.py",
        "07_multichip_sharding.py",
    ]


@pytest.mark.slow
@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs_clean(name, tmp_path):
    before = _repo_tree_snapshot()
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # drop the virtual-device flag the conftest sets for THIS process —
    # the examples expect a plain single-device CPU
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", name)],
        cwd=tmp_path, env=env, capture_output=True, text=True,
        timeout=900)
    assert proc.returncode == 0, (
        f"{name} failed\n--- stdout ---\n{proc.stdout[-3000:]}\n"
        f"--- stderr ---\n{proc.stderr[-3000:]}")
    for rel in EXPECTED.get(name, []):
        made = tmp_path / rel
        assert made.exists() and any(made.iterdir()), (
            f"{name} did not produce {rel}/ in its cwd")
    assert _repo_tree_snapshot() == before, (
        f"{name} wrote into the repo's committed output directories")
