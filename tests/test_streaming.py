"""Streaming Monte-Carlo (BASELINE config 5) and profiling utilities."""

import pytest

import jax.numpy as jnp
import numpy as np

from radar_tpu.config.params import small_test_config
from radar_tpu.parallel.mesh import make_mesh
from radar_tpu.pipeline.streaming import random_scene, run_streaming_mc
from radar_tpu.waveform.precompute import precompute


def test_random_scene_in_valid_region():
    cfg = small_test_config(channels=8, pulses=32)
    rng = np.random.default_rng(0)
    tb = random_scene(rng, 50, cfg)
    sig = cfg.sig
    delta_r = sig.c / (2 * sig.fs)
    assert np.all(tb.range_m > 15 * delta_r)
    assert np.all(tb.range_m < sig.n_total_gate * delta_r)
    # velocities inside the valid (border-excluded) Doppler region
    bins = sig.prt_num / 2 + sig.prt_num * tb.velocity_ms / sig.v_max
    border = cfg.cfar.ref_cells_v + cfg.cfar.guard_cells_v
    assert np.all(bins >= border) and np.all(bins < sig.prt_num - border)


def test_streaming_mc_single_device():
    cfg = small_test_config(channels=8, pulses=32)
    pre = precompute(cfg)
    stats = run_streaming_mc(cfg, num_scenes=3, targets_per_scene=4,
                             trials_per_scene=2, seed=0, precomp=pre,
                             snr_range=(12.0, 20.0))
    assert stats.total_targets == 3 * 4 * 2
    # high-SNR targets: nearly all detected
    assert stats.detection_rate > 0.7, stats
    assert stats.range_rmse_m < 20.0
    assert stats.velocity_rmse_ms < 3.0


@pytest.mark.slow
def test_streaming_mc_sharded_matches_single():
    cfg = small_test_config(channels=8, pulses=32)
    pre = precompute(cfg)
    kw = dict(num_scenes=2, targets_per_scene=3, trials_per_scene=2, seed=1,
              precomp=pre, snr_range=(12.0, 20.0))
    single = run_streaming_mc(cfg, **kw)
    mesh = make_mesh(dp=2, ch=2, cpi=2)
    sharded = run_streaming_mc(cfg, mesh=mesh, **kw)
    assert single.total_targets == sharded.total_targets
    assert single.total_detected == sharded.total_detected
    np.testing.assert_allclose(single.range_rmse_m, sharded.range_rmse_m,
                               rtol=1e-3)


def test_stage_timer_and_metrics_log(tmp_path):
    import time

    from radar_tpu.utils.profiling import (FrameMetrics, MetricsLog,
                                           StageTimer)

    t = StageTimer()
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("a"):
        time.sleep(0.01)
    rep = t.report()
    assert rep["a"]["calls"] == 2
    assert rep["a"]["mean_ms"] >= 9.0
    assert t.samples_per_second("a", 1000) > 0

    log = MetricsLog()
    for i in range(3):
        log.record(FrameMetrics(i, 10.0 * i, 5, 2, 1.5))
    p = tmp_path / "metrics.jsonl"
    log.save(str(p))
    assert len(p.read_text().splitlines()) == 3
    s = log.summary()
    assert s["frames"] == 3 and s["total_final_targets"] == 6
