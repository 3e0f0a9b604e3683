"""Native C++ tracker parity and performance sanity (radar_tpu/native)."""

import time

import numpy as np
import pytest

from radar_tpu.cluster.connected import connected_components_np
from radar_tpu.native import (associate_tracks_5d_native, available,
                              connected_components_gated_native)


pytestmark = pytest.mark.skipif(not available(),
                                reason="native library unavailable")


def _dense_5d(fields, gates):
    n = len(fields[0])
    adj = np.ones((n, n), bool)
    for f, g in zip(fields, gates):
        adj &= np.abs(f[:, None] - f[None, :]) <= g
    return connected_components_np(adj)


def _random_log(rng, n):
    return [rng.uniform(0, 20000, n),            # range
            rng.uniform(-40, 40, n),             # velocity
            rng.uniform(0, 360, n),              # azimuth
            rng.uniform(-10, 70, n),             # elevation
            rng.integers(1, 50, n).astype(float)]  # frame


def test_native_matches_numpy_bfs_random():
    gates = (30.0, 0.4, 10.0, 5.0, 3.0)
    for seed in range(5):
        rng = np.random.default_rng(seed)
        fields = _random_log(rng, 300)
        want = _dense_5d(fields, gates)
        got = associate_tracks_5d_native(*fields, gates)
        np.testing.assert_array_equal(got, want)


def test_native_matches_on_clustered_scene():
    """Tracks: clusters of nearby points across frames + isolated noise."""
    rng = np.random.default_rng(7)
    centers = [(3000.0, 20.0, 45.0, 10.0), (9000.0, -15.0, 200.0, 30.0)]
    rows = [[], [], [], [], []]
    for frame in range(1, 21):
        for r0, v0, az0, el0 in centers:
            rows[0].append(r0 + rng.uniform(-10, 10))
            rows[1].append(v0 + rng.uniform(-0.1, 0.1))
            rows[2].append(az0 + rng.uniform(-2, 2))
            rows[3].append(el0 + rng.uniform(-1, 1))
            rows[4].append(float(frame))
    noise = _random_log(rng, 50)
    fields = [np.concatenate([np.asarray(a), b]) for a, b in zip(rows, noise)]
    gates = (30.0, 0.4, 10.0, 5.0, 3.0)
    want = _dense_5d(fields, gates)
    got = associate_tracks_5d_native(*fields, gates)
    np.testing.assert_array_equal(got, want)
    # the two planted tracks form two single components
    assert got[0] != got[1]
    assert (got[:40:2] == got[0]).all() and (got[1:40:2] == got[1]).all()


def test_generic_gated_components():
    rng = np.random.default_rng(3)
    fields = [rng.uniform(0, 100, 200), rng.uniform(-5, 5, 200)]
    gates = (10.0, 1.0)
    want = _dense_5d(fields, gates)
    got = connected_components_gated_native(fields, gates)
    np.testing.assert_array_equal(got, want)


def test_native_scales_to_10k():
    """BASELINE config 5 scale: 10k-row association in well under a second
    (the dense numpy BFS needs an 800 MB adjacency at this size)."""
    rng = np.random.default_rng(0)
    fields = _random_log(rng, 10000)
    gates = (30.0, 0.4, 10.0, 5.0, 3.0)
    t0 = time.perf_counter()
    got = associate_tracks_5d_native(*fields, gates)
    dt = time.perf_counter() - t0
    assert got is not None and len(got) == 10000
    assert got.max() >= 0
    assert dt < 1.0, dt
