"""Visualization smoke tests: every plot function renders a non-empty file
(SURVEY.md L8)."""

import os

import numpy as np

from radar_tpu.config.params import small_test_config
from radar_tpu.pipeline.driver import DetectionLog, Track
from radar_tpu.pipeline.montecarlo import SweepResult
from radar_tpu.viz.plots import (plot_beam_patterns_fig,
                                 plot_cluster_comparison, plot_pc_profile,
                                 plot_ppi, plot_rdm, plot_rhi,
                                 plot_snr_sweep, plot_track_history)
from radar_tpu.waveform.precompute import precompute


def _tracks():
    return [Track(3000.0, 10.0, 12.0, 45.0, 5.0, 1, 6, 6, np.arange(3)),
            Track(8000.0, -5.0, 20.0, 100.0, 2.0, 2, 4, 2,
                  np.array([3, 4]))]


def _log():
    n = 5
    return DetectionLog(
        range_m=np.linspace(3000, 3010, n),
        velocity_ms=np.full(n, 10.0),
        elevation_deg=np.full(n, 12.0),
        power=np.linspace(1, 2, n),
        frame=np.arange(1, n + 1),
        azimuth_deg=np.linspace(44, 46, n))


def test_all_plots_render(tmp_path):
    cfg = small_test_config()
    pre = precompute(cfg)
    tracks, log = _tracks(), _log()
    rng = np.random.default_rng(0)
    rdm = rng.normal(size=(32, 200)) + 1j * rng.normal(size=(32, 200))
    sweep = SweepResult(np.array([-10.0, 0.0, 10.0]),
                        np.array([2.0, 1.0, 0.3]),
                        np.array([0.1, 0.7, 1.0]),
                        np.zeros((3, 4)), np.array([3.0, 1.0, 0.3]))
    paths = [
        plot_ppi(tracks, str(tmp_path / "ppi.png")),
        plot_rhi(tracks, str(tmp_path / "rhi.png")),
        plot_rdm(rdm, pre.range_axis[:200], pre.velocity_axis,
                 str(tmp_path / "rdm.png"), truth_ranges=[500.0]),
        plot_pc_profile(rdm[0], pre.range_axis[:200],
                        str(tmp_path / "pc.png"), truth_ranges=[500.0]),
        plot_track_history(log, tracks, str(tmp_path / "hist.png")),
        plot_cluster_comparison(log, tracks, str(tmp_path / "cmp.png")),
        plot_beam_patterns_fig(pre.dbf_w, cfg.array.element_spacing,
                               cfg.sig.wavelength,
                               str(tmp_path / "beams.png")),
        plot_snr_sweep(sweep, str(tmp_path / "sweep.png")),
    ]
    for p in paths:
        assert os.path.exists(p) and os.path.getsize(p) > 2000, p


def test_empty_inputs_render(tmp_path):
    assert os.path.exists(plot_ppi([], str(tmp_path / "empty_ppi.png")))
    assert os.path.exists(plot_rhi([], str(tmp_path / "empty_rhi.png")))


def test_v1_waveform_and_amplitude_models():
    import jax.numpy as jnp

    from radar_tpu.config.params import full_config
    from radar_tpu.sim.echo import radar_equation_amplitude
    from radar_tpu.waveform.precompute import build_tx_pulse_v1

    cfg = full_config()
    tx = build_tx_pulse_v1(cfg)
    assert tx.shape == (3404,)
    # pulses at segment starts 0 / 228 / 951
    assert np.all(tx[:4] != 0) and np.all(np.abs(tx[4:228]) == 0)
    assert np.all(tx[228:428] != 0) and np.all(np.abs(tx[428:951]) == 0)
    assert np.all(tx[951:1651] != 0) and np.all(np.abs(tx[1651:]) == 0)
    # narrow pulse is cos-like (sin(2*pi*t + pi/2)), ~1 at center samples
    assert abs(tx[1]) > 0.9

    # radar-equation amplitude: R^-2 law with the 1e8 fudge gain
    a1 = float(radar_equation_amplitude(jnp.asarray(1000.0),
                                        jnp.asarray(1.0),
                                        cfg.sig.wavelength))
    a2 = float(radar_equation_amplitude(jnp.asarray(2000.0),
                                        jnp.asarray(1.0),
                                        cfg.sig.wavelength))
    np.testing.assert_allclose(a1 / a2, 4.0, rtol=1e-6)
    want = 1e8 * np.sqrt(cfg.sig.wavelength**2) / (1000.0**2
                                                   * (4 * np.pi) ** 1.5)
    np.testing.assert_allclose(a1, want, rtol=1e-5)
