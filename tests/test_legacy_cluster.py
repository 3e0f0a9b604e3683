"""v5 historical single-stage index-space clustering
(main_simulate_echoes_with_array_v5.m:491-560) vs a direct numpy oracle,
plus property-based tests of the label-propagation core (ROADMAP quality
item)."""

import jax.numpy as jnp
import numpy as np
import pytest

from oracle import cluster_bfs_oracle
from radar_tpu.cluster.connected import connected_labels, gate_adjacency
from radar_tpu.cluster.legacy import cluster_single_stage_v5


def _v5_oracle(v_idx, r_idx, power, range_axis, velocity_axis,
               max_r=5, max_v=3):
    comp = cluster_bfs_oracle([(v_idx.astype(float), float(max_v)),
                               (r_idx.astype(float), float(max_r))])
    out = []
    for c in np.unique(comp):
        m = comp == c
        w = power[m]
        cr = np.sum(r_idx[m] * w) / np.sum(w)
        cv = np.sum(v_idx[m] * w) / np.sum(w)
        rng = np.interp(cr, np.arange(len(range_axis)), range_axis)
        vel = np.interp(cv, np.arange(len(velocity_axis)), velocity_axis)
        out.append((rng, vel, np.sum(w)))
    return sorted(out)


def test_v5_clustering_matches_oracle():
    rng = np.random.default_rng(11)
    n, cap = 25, 40
    v_idx = rng.integers(0, 32, n)
    r_idx = rng.integers(0, 200, n)
    power = rng.uniform(1.0, 50.0, n)
    range_axis = np.linspace(0.0, 1200.0, 200)
    velocity_axis = np.linspace(-16.0, 16.0, 32)

    vi = np.zeros(cap); ri = np.zeros(cap); pw = np.zeros(cap)
    vi[:n], ri[:n], pw[:n] = v_idx, r_idx, power
    valid = np.arange(cap) < n
    got = cluster_single_stage_v5(
        jnp.asarray(vi), jnp.asarray(ri), jnp.asarray(pw),
        jnp.asarray(valid), range_axis, velocity_axis)
    gv = np.asarray(got.valid)
    got_list = sorted(zip(np.asarray(got.range_m)[gv],
                          np.asarray(got.velocity_ms)[gv],
                          np.asarray(got.power)[gv]))
    want = _v5_oracle(v_idx, r_idx, power, range_axis, velocity_axis)
    assert len(got_list) == len(want)
    np.testing.assert_allclose(np.asarray(got_list), np.asarray(want),
                               rtol=1e-6)
    assert np.all(np.asarray(got.angle_deg)[gv] == 0.0)


hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=40, deadline=None)
@given(st.data())
@pytest.mark.slow
def test_connected_labels_property(data):
    """For ANY point set + gates + validity mask, label propagation yields
    exactly the BFS partition, invalid slots get label n, and every valid
    component label is its smallest member index."""
    n = data.draw(st.integers(1, 24))
    r = np.asarray(data.draw(st.lists(
        st.floats(0, 300, allow_nan=False, width=32),
        min_size=n, max_size=n)))
    v = np.asarray(data.draw(st.lists(
        st.floats(-10, 10, allow_nan=False, width=32),
        min_size=n, max_size=n)))
    valid = np.asarray(data.draw(st.lists(st.booleans(),
                                          min_size=n, max_size=n)))
    gate_r = data.draw(st.floats(0.0, 100.0, allow_nan=False))
    gate_v = data.draw(st.floats(0.0, 5.0, allow_nan=False))

    adj = gate_adjacency([(jnp.asarray(r), gate_r), (jnp.asarray(v), gate_v)],
                         jnp.asarray(valid))
    labels = np.asarray(connected_labels(adj, jnp.asarray(valid)))

    assert np.all(labels[~valid] == n)
    if not valid.any():
        return
    comp = cluster_bfs_oracle([(r[valid], gate_r), (v[valid], gate_v)])
    la = labels[valid]
    assert np.array_equal(la[:, None] == la[None, :],
                          comp[:, None] == comp[None, :])
    # label = smallest member's global index
    for lab in np.unique(la):
        members = np.flatnonzero(valid)[la == lab]
        assert lab == members.min()
