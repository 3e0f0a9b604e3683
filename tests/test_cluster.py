"""Clustering parity: masked label-propagation components vs BFS oracle;
stage-1 weighted merge and stage-2 winner-take-all semantics
(fun_process_single_frame.m:302-407)."""

import jax.numpy as jnp
import numpy as np

from oracle import cluster_bfs_oracle
from radar_tpu.cluster.connected import (connected_components_np,
                                         connected_labels, gate_adjacency)
from radar_tpu.cluster.stages import cluster_stage1, cluster_stage2
from radar_tpu.config.params import ClusterParams
from radar_tpu.measure.estimate import ParamDetections


def _same_partition(labels_a, labels_b, valid):
    """Two labelings describe the same partition of the valid slots."""
    la = np.asarray(labels_a)[valid]
    lb = np.asarray(labels_b)[valid]
    pairs_a = la[:, None] == la[None, :]
    pairs_b = lb[:, None] == lb[None, :]
    return np.array_equal(pairs_a, pairs_b)


def test_connected_labels_random_vs_bfs():
    rng = np.random.default_rng(21)
    for trial in range(5):
        n = 40
        r = rng.uniform(0, 300, n)
        v = rng.uniform(-10, 10, n)
        valid = rng.uniform(size=n) < 0.8
        adj = gate_adjacency([(jnp.asarray(r), 30.0), (jnp.asarray(v), 2.0)],
                             jnp.asarray(valid))
        labels = connected_labels(adj, jnp.asarray(valid))
        # oracle on the valid subset
        comp = cluster_bfs_oracle([(r[valid], 30.0), (v[valid], 2.0)])
        full = np.full(n, -1)
        full[valid] = comp
        assert _same_partition(labels, full, valid)
        # invalid slots labeled n
        assert np.all(np.asarray(labels)[~valid] == n)


def test_connected_components_np_matches_oracle():
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 100, 30)
    adj = np.abs(x[:, None] - x[None, :]) <= 10.0
    comp = connected_components_np(adj)
    want = cluster_bfs_oracle([(x, 10.0)])
    assert np.array_equal(comp, want)


def _dets(r, v, a, p, valid=None):
    n = len(r)
    valid = np.ones(n, bool) if valid is None else np.asarray(valid)
    f = lambda x: jnp.asarray(np.asarray(x, np.float64))
    return ParamDetections(range_m=f(r), velocity_ms=f(v), angle_deg=f(a),
                           power=f(p), pair_idx=jnp.zeros(n, jnp.int32),
                           valid=jnp.asarray(valid))


def test_stage1_weighted_merge():
    # two clusters: {0,1} close in R/V/A, {2} far
    dets = _dets([100.0, 110.0, 500.0], [5.0, 5.2, 5.0],
                 [10.0, 11.0, 10.0], [1.0, 3.0, 2.0])
    out = cluster_stage1(dets, ClusterParams())
    valid = np.asarray(out.valid)
    assert valid.sum() == 2
    got_r = np.asarray(out.range_m)[valid]
    got_p = np.asarray(out.power)[valid]
    # power-weighted mean of cluster {0,1}: (100*1 + 110*3)/4
    np.testing.assert_allclose(sorted(got_r), [107.5, 500.0])
    np.testing.assert_allclose(sorted(got_p), [2.0, 4.0])


def test_stage2_winner_take_all_ignores_angle():
    # same (R,V) but very different angle -> still one cluster (stage 2
    # clusters on R/V only, ref :377-381); winner = max power
    from radar_tpu.cluster.stages import ClusteredTargets

    t = ClusteredTargets(
        range_m=jnp.asarray([100.0, 105.0]),
        velocity_ms=jnp.asarray([5.0, 5.1]),
        angle_deg=jnp.asarray([10.0, 40.0]),
        power=jnp.asarray([1.0, 9.0]),
        valid=jnp.asarray([True, True]))
    out = cluster_stage2(t, ClusterParams())
    valid = np.asarray(out.valid)
    assert valid.sum() == 1
    np.testing.assert_allclose(np.asarray(out.range_m)[valid], [105.0])
    np.testing.assert_allclose(np.asarray(out.angle_deg)[valid], [40.0])
    np.testing.assert_allclose(np.asarray(out.power)[valid], [9.0])


def test_stage2_vel_gate_override_merges_ghosts():
    """Two entries at one range with dV=0.6 m/s — an elevation-sidelobe
    ghost scenario (tracking_mc.json diagnosis): the reference's 0.4 m/s
    stage-2 gate keeps both (reference default), stage2_vel_gate=1.0
    merges them winner-take-all."""
    import dataclasses

    from radar_tpu.cluster.stages import ClusteredTargets

    t = ClusteredTargets(
        range_m=jnp.asarray([6400.0, 6402.0]),
        velocity_ms=jnp.asarray([22.1, 22.7]),
        angle_deg=jnp.asarray([32.6, 15.0]),
        power=jnp.asarray([9.0, 1.0]),
        valid=jnp.asarray([True, True]))
    ref = cluster_stage2(t, ClusterParams())
    assert np.asarray(ref.valid).sum() == 2        # reference behavior
    merged = cluster_stage2(
        t, dataclasses.replace(ClusterParams(), stage2_vel_gate=1.0))
    valid = np.asarray(merged.valid)
    assert valid.sum() == 1                        # ghost merged away
    np.testing.assert_allclose(np.asarray(merged.angle_deg)[valid],
                               [32.6])             # winner = main lobe


def test_cluster_empty_input():
    dets = _dets([0.0] * 4, [0.0] * 4, [0.0] * 4, [0.0] * 4,
                 valid=[False] * 4)
    out = cluster_stage2(cluster_stage1(dets, ClusterParams()),
                         ClusterParams())
    assert int(out.count) == 0


def test_connected_labels_long_chain_converges():
    """One path graph spanning all capacity slots must collapse to a
    single component (the fixpoint while_loop guarantees it; the former
    fixed log2(n)+2 trip count did NOT — see the permuted-chain test)."""
    n = 512
    x = np.arange(n, dtype=float)  # gate 1.0 connects only neighbors
    adj = gate_adjacency([(jnp.asarray(x), 1.0)], jnp.ones(n, bool))
    labels = np.asarray(connected_labels(adj, jnp.ones(n, bool)))
    assert np.all(labels == 0), np.unique(labels)


def test_connected_labels_permuted_chain_regression():
    """Round-5 self-review regression: chains whose SLOT order is a
    permutation of their path order defeated the fixed-trip-count
    doubling argument (the pointer jump adopts the current-best node's
    label, which need not be farther along the path) — a 7-node chain in
    slot order [1,4,2,3,6,5,0] came back as TWO components. The fixpoint
    loop must label every permuted chain as one component."""
    # the confirmed minimal case
    order = np.array([1, 4, 2, 3, 6, 5, 0])
    n = len(order)
    x = np.empty(n)
    x[order] = np.arange(n, dtype=float)   # path position of each slot
    adj = gate_adjacency([(jnp.asarray(x), 1.0)], jnp.ones(n, bool))
    labels = np.asarray(connected_labels(adj, jnp.ones(n, bool)))
    assert len(np.unique(labels)) == 1, labels
    # randomized permuted chains at the shipped capacity
    rng = np.random.default_rng(5)
    for _ in range(20):
        n = 128
        perm = rng.permutation(n)
        x = np.empty(n)
        x[perm] = np.arange(n, dtype=float)
        adj = gate_adjacency([(jnp.asarray(x), 1.0)], jnp.ones(n, bool))
        labels = np.asarray(connected_labels(adj, jnp.ones(n, bool)))
        assert len(np.unique(labels)) == 1, np.unique(labels)


def test_stage1_pair_mode_v7_7_variant():
    """v7_7 variant: stage 1 keeps mode(PairIndex) per cluster
    (_v7_7.m:766); MATLAB mode tie-breaks to the smallest value; stage 2
    carries the winner's pair index."""
    dets = _dets([100.0, 110.0, 105.0, 108.0, 500.0],
                 [5.0, 5.2, 5.1, 5.0, 5.0],
                 [10.0, 11.0, 10.5, 10.2, 10.0],
                 [1.0, 3.0, 2.0, 1.0, 7.0])
    # cluster {0,1,2,3}: pairs [4, 2, 4, 2] -> tie between 2 and 4 -> 2;
    # cluster {4}: pair 9
    dets = dets._replace(pair_idx=jnp.asarray([4, 2, 4, 2, 9], jnp.int32))
    params = ClusterParams(keep_pair_mode=True)
    s1 = cluster_stage1(dets, params)
    valid = np.asarray(s1.valid)
    assert valid.sum() == 2
    got = sorted(zip(np.asarray(s1.range_m)[valid],
                     np.asarray(s1.pair_idx)[valid]))
    assert got[0][1] == 2 and got[1][1] == 9
    # clear majority case
    dets2 = dets._replace(pair_idx=jnp.asarray([4, 2, 4, 4, 9], jnp.int32))
    s1b = cluster_stage1(dets2, params)
    v2 = np.asarray(s1b.valid)
    got2 = sorted(zip(np.asarray(s1b.range_m)[v2],
                      np.asarray(s1b.pair_idx)[v2]))
    assert got2[0][1] == 4
    # stage 2 winner-take-all carries the winner's pair index
    # (both clusters survive stage 2: far apart in range)
    s2 = cluster_stage2(s1b, params)
    v3 = np.asarray(s2.valid)
    assert v3.sum() == 2
    assert sorted(np.asarray(s2.pair_idx)[v3].tolist()) == [4, 9]
    # default path: no pair index carried
    s1d = cluster_stage1(dets, ClusterParams())
    assert s1d.pair_idx is None
    assert cluster_stage2(s1d, ClusterParams()).pair_idx is None
