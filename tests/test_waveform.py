"""Waveform/precompute goldens: the hand-computable constants of the
reference precompute block (SURVEY.md section 7.3 step 1): 5819-sample PRT,
pulse placements 0/289/1284, segment starts 4/489/1984 (0-based), FIR group
delay 17, FFT plan sizes, axes."""

import numpy as np

from radar_tpu.config.params import full_config, small_test_config
from radar_tpu.utils.signal import (fir_group_delay_mean, kaiser_window,
                                    next_pow2, spline_upsample_matrix)
from radar_tpu.waveform.precompute import build_tx_pulse, precompute


def test_tx_pulse_structure():
    cfg = full_config()
    tx, (n1, n2, n3, p2, p3) = build_tx_pulse(cfg)
    assert tx.shape == (5819,)
    assert (n1, n2, n3) == (4, 200, 700)
    # narrow pulse: ones at [0, 4)
    assert np.all(tx[:4] == 1.0)
    assert np.all(tx[4:289] == 0.0)
    # medium LFM at [289, 489)
    assert np.all(tx[289:489] != 0.0)
    assert np.all(tx[489:1284] == 0.0)
    # long LFM at [1284, 1984); zero tail
    assert np.all(tx[1284:1984] != 0.0)
    assert np.all(tx[1984:] == 0.0)
    # all pulse samples unit magnitude -> unit reference power
    nz = tx[tx != 0]
    np.testing.assert_allclose(np.abs(nz), 1.0, rtol=1e-12)
    # chirp sweep direction/extent via instantaneous frequency:
    # medium k2=-B/tau2 sweeps +B/2 -> -B/2; long k3=+B/tau3 sweeps -B/2 -> +B/2
    ts = 1 / cfg.sig.fs
    f2 = np.angle(p2[1:] * np.conj(p2[:-1])) / (2 * np.pi * ts)
    np.testing.assert_allclose(f2[0], cfg.sig.bandwidth / 2, rtol=0.02)
    np.testing.assert_allclose(f2[-1], -cfg.sig.bandwidth / 2, rtol=0.02)
    f3 = np.angle(p3[1:] * np.conj(p3[:-1])) / (2 * np.pi * ts)
    np.testing.assert_allclose(f3[0], -cfg.sig.bandwidth / 2, rtol=0.02)
    np.testing.assert_allclose(f3[-1], cfg.sig.bandwidth / 2, rtol=0.02)


def test_precompute_constants():
    cfg = full_config()
    pre = precompute(cfg)
    assert pre.seg_start_narrow == 4
    assert pre.seg_start_medium == 489
    assert pre.seg_start_long == 1984
    assert pre.n_total_gate == 3404
    assert pre.gate_splits == (228, 723, 2453)
    assert pre.fir_delay == 17
    # reference FFT plan sizes: 2^nextpow2(5330+199)=8192, 2^nextpow2(4534)=8192
    assert pre.n_fft_med == 8192
    assert pre.n_fft_long == 8192
    assert pre.p_signal_unscaled == 1.0
    assert pre.dbf_w.shape == (13, 16)
    assert pre.beam_angles_deg.shape == (13,)
    assert pre.k_slopes_lut.shape == (12,)
    np.testing.assert_allclose(pre.delta_r, cfg.sig.c / (2 * cfg.sig.fs))
    assert pre.mtd_win.shape == (332,)
    assert pre.range_axis.shape == (3404,)
    np.testing.assert_allclose(pre.range_axis[1] - pre.range_axis[0],
                               pre.delta_r)
    # velocity axis spans [-v_max/2, v_max/2]
    v_max = cfg.sig.v_max
    np.testing.assert_allclose(pre.velocity_axis[0], -v_max / 2)
    np.testing.assert_allclose(pre.velocity_axis[-1], v_max / 2)
    # deltaV quirk: v_max/prt_num, not the axis spacing
    np.testing.assert_allclose(pre.delta_v, v_max / 332)


def test_kaiser_matches_scipy():
    import scipy.signal

    for n, beta in [(200, 4.5), (332, 4.5), (700, 4.5)]:
        np.testing.assert_allclose(
            kaiser_window(n, beta),
            scipy.signal.get_window(("kaiser", beta), n, fftbins=False),
            rtol=1e-12)


def test_fir_group_delay_linear_phase():
    # symmetric FIR of length 35 -> exactly 17
    from radar_tpu.config.assets import fir_taps

    assert fir_group_delay_mean(fir_taps()) == 17


def test_next_pow2():
    assert next_pow2(5529) == 8192
    assert next_pow2(4534) == 8192
    assert next_pow2(4096) == 4096
    assert next_pow2(1) == 1


def test_spline_matrix_matches_scipy():
    from oracle import spline_interp_oracle

    rng = np.random.default_rng(0)
    y = rng.normal(size=5)
    for times in (8, 4):
        q = spline_upsample_matrix(5, times)
        np.testing.assert_allclose(q @ y, spline_interp_oracle(y, times),
                                   rtol=1e-12, atol=1e-12)
    # spline interpolation reproduces the data at the knots
    q8 = spline_upsample_matrix(5, 8)
    np.testing.assert_allclose(q8[::8] @ y, y, rtol=1e-12)


def test_synthetic_dbf_bank_small_config():
    cfg = small_test_config()
    pre = precompute(cfg)
    assert pre.dbf_w.shape == (cfg.sig.beam_num, cfg.sig.channel_num)
    # each beam's pattern peaks at its nominal angle (within scan resolution)
    from radar_tpu.doa.calibrate import beam_patterns

    _, _, peaks = beam_patterns(pre.dbf_w, cfg.array.element_spacing,
                                cfg.sig.wavelength)
    np.testing.assert_allclose(peaks, pre.beam_angles_deg, atol=0.5)
    # calibrated monopulse slopes are negative (beam A below beam B)
    assert np.all(pre.k_slopes_lut < 0)
