"""Two-stage detection clustering (SURVEY.md L6, components "Clustering
stage 1/2").

Stage 1 — intra-beam (ref fun_process_single_frame.m:302-352): connected
components under (|dR| <= max_range_sep, |dV| <= max_vel_sep,
|dAngle| <= max_angle_sep) gates; merge by power-weighted mean of
range/velocity/angle, power = sum of member powers.

Stage 2 — inter-beam anti-ghost (ref :355-407): components under (R, V)
gates only; merge winner-take-all by power.

Both run on fixed-capacity masked slots so they jit cleanly as part of the
frame pipeline.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config.params import ClusterParams
from ..measure.estimate import ParamDetections
from .connected import (connected_labels, gate_adjacency, merge_weighted_mean,
                        merge_winner_take_all)


class ClusteredTargets(NamedTuple):
    """Per-slot clustered target list; ``valid`` marks live slots (cluster
    representatives)."""

    range_m: jnp.ndarray
    velocity_ms: jnp.ndarray
    angle_deg: jnp.ndarray
    power: jnp.ndarray
    valid: jnp.ndarray

    @property
    def count(self):
        return jnp.sum(self.valid)


def cluster_stage1(dets: ParamDetections,
                   params: ClusterParams) -> ClusteredTargets:
    adj = gate_adjacency(
        [(dets.range_m, params.max_range_sep),
         (dets.velocity_ms, params.max_vel_sep),
         (dets.angle_deg, params.max_angle_sep)], dets.valid)
    labels = connected_labels(adj, dets.valid)
    merged, wsum, rep_valid = merge_weighted_mean(
        labels, dets.valid, dets.power,
        {"range_m": dets.range_m, "velocity_ms": dets.velocity_ms,
         "angle_deg": dets.angle_deg})
    zero = jnp.zeros((), dets.power.dtype)
    w = lambda x: jnp.where(rep_valid, x, zero)
    return ClusteredTargets(
        range_m=w(merged["range_m"]), velocity_ms=w(merged["velocity_ms"]),
        angle_deg=w(merged["angle_deg"]), power=w(wsum), valid=rep_valid)


def cluster_stage2(t: ClusteredTargets,
                   params: ClusterParams) -> ClusteredTargets:
    adj = gate_adjacency(
        [(t.range_m, params.max_range_sep),
         (t.velocity_ms, params.max_vel_sep)], t.valid)
    labels = connected_labels(adj, t.valid)
    merged, rep_valid = merge_winner_take_all(
        labels, t.valid, t.power,
        {"range_m": t.range_m, "velocity_ms": t.velocity_ms,
         "angle_deg": t.angle_deg})
    zero = jnp.zeros((), t.power.dtype)
    w = lambda x: jnp.where(rep_valid, x, zero)
    return ClusteredTargets(
        range_m=w(merged["range_m"]), velocity_ms=w(merged["velocity_ms"]),
        angle_deg=w(merged["angle_deg"]), power=w(merged["power"]),
        valid=rep_valid)
