"""Golden-array unit tests for the DSP core ops (DBF, pulse compression,
MTD) against the numpy/scipy oracle — SURVEY.md section 4.2 formalized."""

import jax.numpy as jnp
import numpy as np
import pytest
from oracle import dbf_oracle, echo_oracle, mtd_oracle, pc_oracle

from radar_tpu.config.params import full_config, small_test_config
from radar_tpu.ops.dbf import dbf
from radar_tpu.ops.mtd import mtd, zero_velocity_suppress
from radar_tpu.ops.pulse_compression import make_plan, pulse_compress
from radar_tpu.waveform.precompute import precompute


def _random_iq(rng, shape):
    return (rng.normal(size=shape) + 1j * rng.normal(size=shape))


def test_dbf_variants_match_oracle():
    rng = np.random.default_rng(1)
    iq = _random_iq(rng, (3, 64, 16))
    cfg = full_config()
    pre = precompute(cfg)
    for variant in ("v8", "v7_7"):
        got = np.asarray(dbf(jnp.asarray(iq), jnp.asarray(pre.dbf_w),
                             variant))
        want = dbf_oracle(iq, pre.dbf_w, variant)
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("trim", [True, False])
def test_pulse_compression_matches_oracle(trim):
    """Trimmed (minimal-FFT) and untrimmed (reference 2^nextpow2 sizes) pulse
    compression agree with the oracle's full-size FFT convolution — the
    linear-convolution values are FFT-size independent."""
    cfg = small_test_config(channels=8, pulses=3, beams=2)
    pre = precompute(cfg)
    rng = np.random.default_rng(2)
    beams = _random_iq(rng, (3, cfg.sig.point_prt, 2))
    got = np.asarray(pulse_compress(jnp.asarray(beams), pre, trim=trim))
    want = pc_oracle(beams, pre)
    assert got.shape == want.shape == (3, 3404, 2)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-8)


def test_pulse_compression_peak_at_target_gate():
    """A single noiseless target lands its PC peak within one gate of its
    delay sample, in all three segments' gate ranges."""
    cfg = small_test_config(channels=8, pulses=1, beams=2)
    pre = precompute(cfg)
    # narrow segment: the 4-sample simple pulse through the 35-tap low-pass
    # FIR peaks ~2.5 gates early (inherent to the reference's
    # filter+grpdelay splice, ref :111-112) -> tolerance 4; LFM matched
    # filters land within 1 gate.
    for r_gate, tol in ((100, 4), (500, 1), (2000, 1)):
        r = r_gate * pre.delta_r
        iq = echo_oracle([r], [0.0], [0.0], [20.0], pre, cfg)
        # bypass DBF: single channel broadcast to 2 "beams"
        beams = np.stack([iq[:, :, 0], iq[:, :, 0]], axis=-1)
        pc = np.abs(np.asarray(pulse_compress(jnp.asarray(beams), pre)))
        delay = round(2 * r / cfg.sig.c * cfg.sig.fs)
        peak = int(np.argmax(pc[0, :, 0]))
        assert abs(peak - delay) <= tol, (r_gate, peak, delay)


def test_mtd_matches_oracle_and_peak_bin():
    cfg = small_test_config(channels=8, pulses=32)
    pre = precompute(cfg)
    rng = np.random.default_rng(3)
    pc = _random_iq(rng, (32, 100, 3))
    for fft_len in (None, 64):
        got = np.asarray(mtd(jnp.asarray(pc), jnp.asarray(pre.mtd_win),
                             fft_len))
        want = mtd_oracle(pc, pre.mtd_win, fft_len)
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)

    # peak Doppler bin: pure tone exp(j*2*pi*fd*m*prt) lands at
    # shifted bin N/2 + N*V/v_max
    n, v = 32, 10.0
    fd = 2 * v / cfg.sig.wavelength
    tone = np.exp(1j * 2 * np.pi * fd * np.arange(n) * cfg.sig.prt)
    cube = tone[:, None, None] * np.ones((n, 4, 1))
    rdm = np.abs(np.asarray(mtd(jnp.asarray(cube), jnp.asarray(pre.mtd_win))))
    expected_bin = n // 2 + n * v / cfg.sig.v_max
    assert abs(int(np.argmax(rdm[:, 0, 0])) - expected_bin) <= 1


def test_zero_velocity_suppress():
    cfg = small_test_config(pulses=32)
    pre = precompute(cfg)
    rdm = jnp.ones((32, 10, 2), jnp.complex128)
    out = np.asarray(zero_velocity_suppress(rdm, jnp.asarray(
        pre.velocity_axis), 3.0))
    vmask = np.abs(pre.velocity_axis) <= 3.0
    assert vmask.sum() > 0
    assert np.all(out[vmask] == 0)
    assert np.all(out[~vmask] == 1)


def test_ddc_chain():
    """Mixing/decimation tutorial chain (simulation_learn.m:94-110): a tone
    at f0 mixes to DC, survives the measured 12-tap low-pass, and decimation
    by 4 preserves it; a tone offset past the filter cutoff is attenuated."""
    import scipy.signal

    from radar_tpu.config import assets
    from radar_tpu.ops.ddc import ddc, decimation_filter, mix_to_baseband

    fs, f0 = 25e6, 6e6
    n = 4096
    t = np.arange(n) / fs
    tone = np.exp(1j * 2 * np.pi * f0 * t).astype(np.complex64)
    out = np.asarray(ddc(jnp.asarray(tone), f0, fs, factor=4))
    assert out.shape == (n // 4,)
    # DC tone passes with the filter's DC gain
    dc_gain = np.abs(assets.ddc_fir_taps().sum())
    np.testing.assert_allclose(np.abs(out[50:]).mean(), dc_gain, rtol=0.05)

    # decimation filter == MATLAB filter(Num, 1, x)
    rng = np.random.default_rng(0)
    x = (rng.normal(size=300) + 1j * rng.normal(size=300)).astype(complex)
    got = np.asarray(decimation_filter(jnp.asarray(x)))
    want = scipy.signal.lfilter(assets.ddc_fir_taps(), [1.0], x)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # an out-of-band image (offset 10 MHz after mixing) is attenuated by
    # the filter's actual response there (the measured 12-tap filter is
    # short: ~8 dB at 10 MHz)
    img = np.exp(1j * 2 * np.pi * (f0 + 10e6) * t).astype(np.complex64)
    out_img = np.asarray(ddc(jnp.asarray(img), f0, fs, factor=4))
    h10 = np.abs(np.sum(assets.ddc_fir_taps()
                        * np.exp(-1j * 2 * np.pi * 10e6 / fs
                                 * np.arange(12))))
    np.testing.assert_allclose(np.abs(out_img[50:]).mean(), h10, rtol=0.1)
    assert h10 < 0.5 * dc_gain


def test_mtd_matmul_matches_fft():
    """Constant-DFT-matrix MTD (window+fftshift folded) == FFT formulation."""
    from radar_tpu.ops.mtd import make_mtd_matrix, mtd_matmul

    cfg = small_test_config(pulses=32)
    pre = precompute(cfg)
    rng = np.random.default_rng(9)
    pc = _random_iq(rng, (32, 40, 3))
    for fft_len in (None, 64):
        want = np.asarray(mtd(jnp.asarray(pc), jnp.asarray(pre.mtd_win),
                              fft_len))
        m = make_mtd_matrix(pre.mtd_win, 32, fft_len)
        got = np.asarray(mtd_matmul(jnp.asarray(pc), m))
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_pc_matmul_matches_fft_paths():
    """Banded-Toeplitz matmul PC == FFT PC == oracle (already covered for
    the oracle; this pins matmul vs fft directly)."""
    from radar_tpu.ops.pulse_compression import (make_matmul_plan,
                                                 pulse_compress_matmul)

    cfg = small_test_config(channels=8, pulses=2, beams=2)
    pre = precompute(cfg)
    rng = np.random.default_rng(10)
    beams = _random_iq(rng, (2, cfg.sig.point_prt, 2))
    want = np.asarray(pulse_compress(jnp.asarray(beams), pre))
    got = np.asarray(pulse_compress_matmul(jnp.asarray(beams),
                                           make_matmul_plan(pre)))
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-8)
