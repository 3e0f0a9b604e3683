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
    representatives). ``pair_idx`` is None on the v8 path; the v7_7
    variant (ClusterParams.keep_pair_mode) carries the modal member
    PairIndex (stage 1, _v7_7.m:766) / the winner's (stage 2)."""

    range_m: jnp.ndarray
    velocity_ms: jnp.ndarray
    angle_deg: jnp.ndarray
    power: jnp.ndarray
    valid: jnp.ndarray
    pair_idx: jnp.ndarray | None = None

    @property
    def count(self):
        return jnp.sum(self.valid)


def _modal_pair_idx(labels: jnp.ndarray, valid: jnp.ndarray,
                    pair_idx: jnp.ndarray) -> jnp.ndarray:
    """Per-cluster mode of the member pair indices, at representative
    slots (mode([detections_in_cluster.PairIndex]), _v7_7.m:766). MATLAB
    ``mode`` tie-breaks to the SMALLEST value; reproduced exactly with a
    two-level reduction over members (max count, then min pair among
    count-maximal members) — fixed [cap, cap] shapes, no histogram width,
    and no bound assumed on the pair-index values."""
    n = labels.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    member = (labels[None, :] == idx[:, None]) & valid[None, :]  # [n, n]
    same_pair = (pair_idx[None, :] == pair_idx[:, None]).astype(jnp.float32)
    # counts[i, j] = members of cluster i sharing member j's pair index
    counts = member.astype(jnp.float32) @ same_pair            # [n, n]
    # counts holds exact small integers, so the == against the row max is
    # exact; among the count-maximal members take the smallest pair value
    cmax = jnp.max(jnp.where(member, counts, -1.0), axis=1, keepdims=True)
    at_max = member & (counts == cmax)
    big = jnp.iinfo(jnp.int32).max
    return jnp.min(jnp.where(at_max, pair_idx[None, :].astype(jnp.int32),
                             big), axis=1)


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
    pair_mode = None
    if params.keep_pair_mode:
        pair_mode = jnp.where(rep_valid,
                              _modal_pair_idx(labels, dets.valid,
                                              dets.pair_idx), 0)
    return ClusteredTargets(
        range_m=w(merged["range_m"]), velocity_ms=w(merged["velocity_ms"]),
        angle_deg=w(merged["angle_deg"]), power=w(wsum), valid=rep_valid,
        pair_idx=pair_mode)


def cluster_stage2(t: ClusteredTargets,
                   params: ClusterParams) -> ClusteredTargets:
    # stage-2 velocity gate: the reference reuses max_vel_sep
    # (fun_process_single_frame.m:361); stage2_vel_gate widens only this
    # anti-ghost merge (see ClusterParams for the measured rationale)
    v_gate = (params.max_vel_sep if params.stage2_vel_gate is None
              else params.stage2_vel_gate)
    adj = gate_adjacency(
        [(t.range_m, params.max_range_sep),
         (t.velocity_ms, v_gate)], t.valid)
    labels = connected_labels(adj, t.valid)
    fields = {"range_m": t.range_m, "velocity_ms": t.velocity_ms,
              "angle_deg": t.angle_deg}
    if t.pair_idx is not None:
        fields["pair_idx"] = t.pair_idx
    merged, rep_valid = merge_winner_take_all(labels, t.valid, t.power,
                                              fields)
    zero = jnp.zeros((), t.power.dtype)
    w = lambda x: jnp.where(rep_valid, x, zero)
    return ClusteredTargets(
        range_m=w(merged["range_m"]), velocity_ms=w(merged["velocity_ms"]),
        angle_deg=w(merged["angle_deg"]), power=w(merged["power"]),
        valid=rep_valid,
        pair_idx=(jnp.where(rep_valid, merged["pair_idx"], 0)
                  if t.pair_idx is not None else None))
