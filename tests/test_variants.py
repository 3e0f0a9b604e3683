"""Reference-variant coverage: v7_7 DBF/MTD/monopulse variants, pallas CFAR
inside the pipeline, measurement sub-cell precision (SURVEY.md section 7.4
"Reference ambiguity": the framework exposes variants explicitly)."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from radar_tpu.config.params import small_test_config
from radar_tpu.pipeline.frame import make_frame_processor
from radar_tpu.sim.scenario import TargetBatch
from radar_tpu.waveform.precompute import precompute


def _run(cfg, pre, r=3000.0, v=10.0, el=10.0, snr=20.0, seed=0):
    proc = make_frame_processor(cfg, pre, dtype=jnp.complex64)
    tb = TargetBatch.make([r], [v], [el], [snr])
    res = jax.block_until_ready(proc(jax.random.PRNGKey(seed), tb))
    valid = np.asarray(res.targets.valid)
    return (np.asarray(res.targets.range_m)[valid],
            np.asarray(res.targets.velocity_ms)[valid],
            np.asarray(res.targets.angle_deg)[valid],
            np.asarray(res.targets.power)[valid])


def test_mtd_512_pad_variant_e2e():
    cfg = small_test_config(channels=8, pulses=32)
    pre = precompute(cfg)
    cfg512 = cfg.replace(mtd_fft_len=64)
    r, v, a, p = _run(cfg512, pre)
    assert len(r) >= 1
    i = int(np.argmax(p))
    assert abs(r[i] - 3000.0) < 20.0
    # finer Doppler bins with the zero-padded FFT: velocity still recovered
    assert abs(v[i] - 10.0) < 3.0


@pytest.mark.slow
def test_monopulse_complex_variant_e2e():
    """v7_6 complex-ratio monopulse (main_plot_snr_vs_angle_error.m:455-458)
    needs phase-aligned beams — run it on the measured 16-channel bank, the
    geometry it was written for. (On a synthetic Hamming steering bank the
    adjacent beams carry a large inter-beam phase offset and the real part
    of the complex ratio is not an amplitude ratio — faithful to the
    reference formula, documented here.)"""
    from radar_tpu.config.params import CfarParams, RadarConfig, SigConfig

    cfg = RadarConfig(
        sig=SigConfig(prt_num=64, channel_num=16, beam_num=13),
        cfar=CfarParams(ref_cells_v=5, guard_cells_v=4, ref_cells_r=5,
                        guard_cells_r=10))
    pre = precompute(cfg)
    r1, v1, a1, p1 = _run(cfg, pre, v=10.0)
    r2, v2, a2, p2 = _run(cfg.replace(monopulse_complex=True), pre, v=10.0)
    # same detections; both angle estimates near truth for measured beams
    assert len(r1) == len(r2)
    assert abs(a1[int(np.argmax(p1))] - 10.0) < 3.0
    assert abs(a2[int(np.argmax(p2))] - 10.0) < 3.0


def test_dbf_v7_7_variant_runs():
    """v7_7 convention (fliplr, no conj) with a synthetic bank: the flipped
    non-conjugated weights steer differently — the pipeline must still run
    and produce a detection list (possibly at another beam mapping)."""
    cfg = small_test_config(channels=8, pulses=32).replace(
        dbf_variant="v7_7")
    pre = precompute(cfg)
    proc = make_frame_processor(cfg, pre, dtype=jnp.complex64)
    tb = TargetBatch.make([3000.0], [10.0], [10.0], [20.0])
    res = jax.block_until_ready(proc(jax.random.PRNGKey(0), tb))
    assert int(res.num_raw_detections) >= 0  # runs without error


def test_pallas_cfar_in_pipeline_matches_default():
    cfg = small_test_config(channels=8, pulses=32)
    pre = precompute(cfg)
    r1, v1, a1, p1 = _run(cfg, pre, seed=3)
    r2, v2, a2, p2 = _run(cfg.replace(use_pallas_cfar=True), pre, seed=3)
    np.testing.assert_allclose(np.sort(r1), np.sort(r2), rtol=1e-5)
    np.testing.assert_allclose(np.sort(v1), np.sort(v2), rtol=1e-5)


def test_measurement_subcell_precision():
    """Sub-cell spline refinement: sweep true range across a cell; the
    refined estimate must track the truth better than cell quantization."""
    cfg = small_test_config(channels=8, pulses=32)
    pre = precompute(cfg)
    proc = make_frame_processor(cfg, pre, dtype=jnp.complex64)
    errors = []
    for frac in (0.0, 0.25, 0.5, 0.75):
        r_true = (500 + frac) * pre.delta_r
        tb = TargetBatch.make([r_true], [10.0], [10.0], [25.0])
        res = proc(jax.random.PRNGKey(7), tb)
        valid = np.asarray(res.targets.valid)
        p = np.asarray(res.targets.power)[valid]
        r_est = np.asarray(res.targets.range_m)[valid][int(np.argmax(p))]
        errors.append(r_est - r_true)
    # delay rounding puts truth within +-0.5 cell; the spline refinement
    # should keep mean |error| under ~1 cell and well under 2 cells max
    errors = np.abs(np.asarray(errors))
    assert errors.max() < 2 * pre.delta_r, errors
    assert errors.mean() < pre.delta_r, errors


def test_beam_pattern_fc_quirk_override():
    from radar_tpu.config.params import full_config
    from radar_tpu.doa.calibrate import beam_patterns

    cfg = full_config()
    pre = precompute(cfg)
    wl_9500 = cfg.sig.c / 9500e6
    _, _, peaks_sys = beam_patterns(pre.dbf_w, cfg.array.element_spacing,
                                    cfg.sig.wavelength)
    _, _, peaks_quirk = beam_patterns(pre.dbf_w, cfg.array.element_spacing,
                                      cfg.sig.wavelength,
                                      wavelength_override=wl_9500)
    # shorter wavelength squeezes the beam fan slightly toward broadside
    assert np.all(np.abs(peaks_quirk[1:-1]) <= np.abs(peaks_sys[1:-1]) + 0.2)
    assert not np.allclose(peaks_quirk, peaks_sys)
