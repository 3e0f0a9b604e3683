"""Kalman track smoothing (pipeline/tracking.py) — beyond-reference
feature on top of the 5D associator; validated against synthetic
constant-velocity truth and the live multi-frame pipeline."""

import numpy as np

from radar_tpu.config.params import small_test_config
from radar_tpu.pipeline.driver import DetectionLog, Track
from radar_tpu.pipeline.tracking import (KalmanParams, smooth_track,
                                         smooth_tracks)


def _cv_log(cfg, n_frames=30, r0=9000.0, v=20.0, el0=10.0,
            sigma_r=6.0, sigma_v=0.5, sigma_el=0.5, seed=0,
            drop_frames=()):
    """Synthetic log for one closing constant-velocity target; returns
    (log, track, truth dict)."""
    t_frame = cfg.sig.frame_time
    rng = np.random.default_rng(seed)
    frames = np.array([f for f in range(1, n_frames + 1)
                       if f not in drop_frames])
    t = (frames - 1) * t_frame
    r_true = r0 - v * t
    el_true = np.full_like(r_true, el0)
    log = DetectionLog(
        range_m=r_true + sigma_r * rng.standard_normal(len(frames)),
        velocity_ms=v + sigma_v * rng.standard_normal(len(frames)),
        elevation_deg=el_true + sigma_el * rng.standard_normal(len(frames)),
        power=np.full(len(frames), 100.0),
        frame=frames,
        azimuth_deg=np.zeros(len(frames)))
    track = Track(r0, v, el0, 0.0, 100.0, int(frames[0]), int(frames[-1]),
                  len(frames), np.arange(len(frames)))
    return log, track, dict(r=r_true, v=v, el=el_true, frames=frames)


def test_smoother_beats_raw_measurements():
    cfg = small_test_config()
    log, track, truth = _cv_log(cfg, seed=1)
    st = smooth_track(log, track, cfg)
    rmse_meas_r = np.sqrt(np.mean((st.meas_range_m - truth["r"])**2))
    rmse_sm_r = np.sqrt(np.mean((st.range_m - truth["r"])**2))
    rmse_meas_v = np.sqrt(np.mean((st.meas_velocity_ms - truth["v"])**2))
    rmse_sm_v = np.sqrt(np.mean((st.velocity_ms - truth["v"])**2))
    rmse_meas_el = np.sqrt(np.mean((st.meas_elevation_deg - truth["el"])**2))
    rmse_sm_el = np.sqrt(np.mean((st.elevation_deg - truth["el"])**2))
    assert rmse_sm_r < 0.6 * rmse_meas_r, (rmse_sm_r, rmse_meas_r)
    assert rmse_sm_v < 0.6 * rmse_meas_v, (rmse_sm_v, rmse_meas_v)
    assert rmse_sm_el < 0.6 * rmse_meas_el, (rmse_sm_el, rmse_meas_el)
    # posterior stds shrink below the measurement std after convergence
    assert st.range_std_m[-1] < 6.0
    assert np.isfinite(st.innovation_nis).all()


def test_smoother_bridges_frame_gaps():
    cfg = small_test_config()
    log, track, truth = _cv_log(cfg, seed=2, drop_frames=(10, 11, 12, 20))
    st = smooth_track(log, track, cfg)
    np.testing.assert_array_equal(st.frames, truth["frames"])
    err = np.abs(st.range_m - truth["r"])
    assert err.max() < 10.0  # no divergence across the 3-frame gap
    # extrapolation: predict 5 frames past the end
    r_pred, v_pred = st.predict(5, cfg.sig.frame_time)
    t_end = (truth["frames"][-1] - 1 + 5) * cfg.sig.frame_time
    assert abs(r_pred - (9000.0 - 20.0 * t_end)) < 15.0
    assert abs(v_pred - 20.0) < 0.5


def test_smoother_merges_same_frame_detections():
    cfg = small_test_config()
    log, track, _ = _cv_log(cfg, n_frames=5, seed=3)
    # duplicate frame 3's row with double power
    i = 2
    log2 = DetectionLog(
        np.concatenate([log.range_m, [log.range_m[i] + 6.0]]),
        np.concatenate([log.velocity_ms, [log.velocity_ms[i]]]),
        np.concatenate([log.elevation_deg, [log.elevation_deg[i]]]),
        np.concatenate([log.power, [200.0]]),
        np.concatenate([log.frame, [log.frame[i]]]),
        np.concatenate([log.azimuth_deg, [0.0]]))
    track2 = track._replace(member_idx=np.arange(6), num_points=6)
    st = smooth_track(log2, track2, cfg)
    assert len(st.frames) == 5  # one merged measurement per frame
    # merged measurement is the power-weighted mean: +6 * (200/300) = +4
    assert abs(st.meas_range_m[i] - (log.range_m[i] + 4.0)) < 1e-9


def test_smooth_tracks_min_points_filter():
    cfg = small_test_config()
    log, track, _ = _cv_log(cfg, n_frames=2, seed=4)
    assert smooth_tracks(log, [track], cfg, min_points=3) == []
    assert len(smooth_tracks(log, [track], cfg, min_points=2)) == 1


def test_smoothing_live_pipeline_track():
    """End-to-end: multi-frame sim -> association -> smoothing; the
    smoothed trajectory follows the kinematic truth."""
    import jax.numpy as jnp  # noqa: F401

    from radar_tpu.pipeline.driver import run_multiframe
    from radar_tpu.sim.scenario import Scenario, TargetBatch

    cfg = small_test_config(channels=8, pulses=32)
    tb = TargetBatch.make([3000.0], [10.0], [10.0], [20.0])
    n_frames = 6
    log, tracks, _ = run_multiframe(cfg, tb, num_frames=n_frames, seed=0)
    assert len(tracks) >= 1
    smoothed = smooth_tracks(
        log, tracks, cfg,
        KalmanParams(sigma_r=6.0, sigma_v=1.5, sigma_el=1.0))
    assert len(smoothed) >= 1
    st = max(smoothed, key=lambda s: len(s.frames))
    # truth trajectory from the scenario's kinematic model
    scen = Scenario.from_initial(tb, cfg)
    truth_r = []
    for _ in range(n_frames):
        t = scen.step(cfg)
        truth_r.append(float(np.asarray(t.range_m)[0]))
    truth_r = np.array(truth_r)[st.frames - 1]
    assert np.abs(st.range_m - truth_r).max() < 25.0
    assert np.abs(st.velocity_ms.mean() - 10.0) < 2.0
