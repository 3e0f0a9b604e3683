"""Real-data-path tests: segmented 1D CFAR semantics (edge fallback, clutter
band), the staged pipeline reconstruction, and checkpoint persistence
(SURVEY.md sections 2.1/2.4/3.6/5.4)."""

import pytest

import jax.numpy as jnp
import numpy as np

from radar_tpu.config.params import Cfar1DParams, RadarConfig, SigConfig
from radar_tpu.ops.cfar1d import (segmented_cfar_1d, zero_velocity_mask,
                                  _segment_cfar_1d)


def _cfar1d_oracle(x, guard, ref, t, method):
    """Per-column loop port of Function_CFAR1D_sub (debug_v2:467-511)."""
    rows, cols = x.shape
    flags = np.zeros_like(x, bool)
    for y in range(cols):
        l1, l2 = y - (guard + ref), y - guard - 1
        r1, r2 = y + guard + 1, y + guard + ref
        if l1 >= 0:
            ref_l = x[:, l1:l2 + 1].mean(axis=1)
        else:
            ref_l = x[:, r1:r2 + 1].mean(axis=1)
        if r2 <= cols - 1:
            ref_r = x[:, r1:r2 + 1].mean(axis=1)
        else:
            ref_r = x[:, l1:l2 + 1].mean(axis=1)
        noise = np.maximum(ref_l, ref_r) if method == "GO" else \
            np.minimum(ref_l, ref_r)
        flags[:, y] = x[:, y] >= t * noise
    return flags


def test_cfar1d_segment_matches_oracle():
    rng = np.random.default_rng(0)
    x = rng.exponential(size=(24, 120))
    x[10, 60] += 50.0
    x[5, 3] += 50.0     # near left edge: exercises the edge fallback
    x[7, 117] += 50.0   # near right edge
    for method in ("GO", "SO"):
        got, _ = _segment_cfar_1d(jnp.asarray(x), guard=4, ref=8, t_cfar=8.0,
                                  method=method, axis=1)
        want = _cfar1d_oracle(x, 4, 8, 8.0, method)
        np.testing.assert_array_equal(np.asarray(got), want)


def test_cfar1d_property_matches_oracle():
    """Property test: the statically-unrolled shifted-add 1D CFAR equals
    the per-column oracle for RANDOM (guard, ref, method, width)
    combinations — the edge-fallback window logic is the fiddly part
    (Function_CFAR1D_sub, debug_v2:467-511)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(st.integers(1, 4), st.integers(2, 8),
           st.sampled_from(["GO", "SO"]), st.integers(0, 2**31 - 1))
    def check(guard, ref, method, seed):
        rng = np.random.default_rng(seed)
        cols = rng.integers(2 * (guard + ref) + 2, 64)
        x = rng.exponential(size=(4, int(cols)))
        got, _ = _segment_cfar_1d(jnp.asarray(x), guard=guard, ref=ref,
                                  t_cfar=4.0, method=method, axis=1)
        want = _cfar1d_oracle(x, guard, ref, 4.0, method)
        np.testing.assert_array_equal(np.asarray(got), want,
                                      err_msg=f"{guard}/{ref}/{method}")

    check()


def test_cfar1d_traced_threshold_matches_static():
    """The traced threshold_factor override (operating-curve sweeps,
    scripts/run_roc_realdata.py) produces bit-identical flags to baking
    the same T into the params."""
    import jax

    cfg = RadarConfig()
    sig = cfg.sig
    rng = np.random.default_rng(3)
    maps = jnp.asarray(rng.exponential(size=(32, sig.n_total_gate, 2)))
    delta_v_bin = sig.wavelength / sig.prt / (2 * 32)
    for t in (4.0, 8.0):
        static, _ = segmented_cfar_1d(
            maps, Cfar1DParams(threshold_factor=t), sig.point_prt_segments,
            delta_v_bin)
        traced, _ = jax.jit(
            lambda tt: segmented_cfar_1d(maps, Cfar1DParams(),
                                         sig.point_prt_segments,
                                         delta_v_bin,
                                         threshold_factor=tt))(jnp.float64(t))
        np.testing.assert_array_equal(np.asarray(static),
                                      np.asarray(traced), err_msg=str(t))


def test_zero_velocity_mask_band():
    m = np.asarray(zero_velocity_mask(32, 3))
    center = 16
    assert not m[center - 3: center + 4].any()
    assert m[: center - 3].all() and m[center + 4:].all()


@pytest.mark.slow
def test_segmented_cfar_full_chain():
    cfg = RadarConfig()
    sig = cfg.sig
    rng = np.random.default_rng(1)
    num_v = 64
    maps = rng.exponential(size=(num_v, sig.n_total_gate, 2))
    # plant peaks in all three segments, away from the clutter band
    hits = [(10, 100, 0), (50, 500, 1), (12, 2000, 0)]
    for v, r, p in hits:
        maps[v, r, p] += 200.0
    delta_v_bin = sig.wavelength / sig.prt / (2 * num_v)
    flags, thr = segmented_cfar_1d(
        jnp.asarray(maps), Cfar1DParams(ref_cells=16, guard_cells=4),
        sig.point_prt_segments, delta_v_bin)
    flags = np.asarray(flags)
    for v, r, p in hits:
        assert flags[v, r, p], (v, r, p)
    # clutter band never fires and its threshold is zeroed
    n0v = int(3.0 / delta_v_bin)
    band = slice(32 - n0v, 32 + n0v + 1)
    assert not flags[band].any()
    assert np.all(np.asarray(thr)[band] == 0)
    # false-alarm rate at Pfa level: for exponential noise and a 16-cell
    # mean, P(x > 8*mean) ~ exp(-8) ~ 3.3e-4 per cell
    assert flags.mean() < 1e-3


@pytest.mark.slow
def test_realdata_staged_pipeline_end_to_end():
    """Inject targets into gated 3404-sample IQ; the reconstructed stage
    2->3->4 chain must recover range/velocity within cell tolerances."""
    from radar_tpu.pipeline.stages import run_realdata_pipeline

    sig = SigConfig(prt_num=64, channel_num=16, beam_num=13)
    cfg = RadarConfig(sig=sig)
    # Gated IQ: target echo directly in gate space, one per segment span
    n_p, n_g, n_c = 64, 3404, 16
    rng = np.random.default_rng(2)
    iq = (rng.normal(size=(n_p, n_g, n_c))
          + 1j * rng.normal(size=(n_p, n_g, n_c))) * np.sqrt(0.5)
    from radar_tpu.pipeline.stages import _segment_pulses, realdata_beam_angles

    p1, p2, p3 = _segment_pulses(cfg)
    truth_gate, truth_v = 1500, 12.0
    # The real-data DBF convention is y = x @ W.T with conjugate steering
    # exp(-j n phi): under it the measured CSV beams peak at the calibrated
    # angles [-16.2, -9.6, -3.2, 3.2, 9.6, 16.2, ...]. Inject at 12 deg
    # (physical) -> between physical beams 4 and 5 -> pair 4; stage 4 then
    # reports the angle in the NOMINAL corrected frame of that pair.
    el_physical = 12.0
    amp = 8.0
    dphi = (2 * np.pi * 0.0138 * np.sin(np.deg2rad(el_physical))
            / sig.wavelength)
    steer = np.exp(-1j * np.arange(n_c) * dphi)
    fd = 2 * truth_v / sig.wavelength
    dop = np.exp(1j * 2 * np.pi * fd * np.arange(n_p) * sig.prt)
    # long-segment echo (gate 1500 falls in the long segment [951, 3404)):
    # pulse3 placed at the truth gate
    seg = np.zeros(n_g, complex)
    seg[truth_gate:truth_gate + len(p3)] = p3
    iq += amp * dop[:, None, None] * seg[None, :, None] * steer[None, None, :]

    meas, dets, rdm = run_realdata_pipeline(jnp.asarray(iq, jnp.complex64),
                                            cfg, freq_no=6)
    valid = np.asarray(meas.valid)
    assert valid.sum() >= 1
    r = np.asarray(meas.range_m)[valid]
    v = np.asarray(meas.velocity_ms)[valid]
    el = np.asarray(meas.elevation_deg)[valid]
    p = np.asarray(meas.power)[valid]
    pair = np.asarray(meas.pair_idx)[valid]
    delta_r = sig.c / (2 * sig.fs)
    i = int(np.argmax(p))  # strongest detection
    assert abs(r[i] - truth_gate * delta_r) <= 2 * delta_r + 3.0
    assert abs(v[i] - truth_v) <= 3.0
    # physical 12 deg sits between physical beams 4 (9.6) and 5 (16.2)
    assert pair[i] == 4
    # elevation reported in the nominal corrected frame of pair 4:
    # within the pair interval [17.8, 22.8] widened by the monopulse swing
    angles = realdata_beam_angles(cfg)
    assert angles[4] - 4.0 <= el[i] <= angles[5] + 4.0, el[i]


def test_checkpoint_store_roundtrip(tmp_path):
    from radar_tpu.io.checkpoint import (CheckpointStore, SaveOptions,
                                         load_sim_frame, save_sim_frame)

    store = CheckpointStore(str(tmp_path), SaveOptions(mtd=True, pc=False))
    a = np.arange(12.0).reshape(3, 4)
    path = store.save("mtd", 3, rdm=a)
    assert path and store.has("mtd", 3)
    got = store.load("mtd", 3)
    np.testing.assert_array_equal(got["rdm"], a)
    # disabled stage -> no write
    assert store.save("pc", 3, pc=a) is None
    assert not store.has("pc", 3)
    assert store.frames_done("mtd") == [3]

    # sim frame persistence (frame_sim_array_N.mat analog)
    fp = str(tmp_path / "frames" / "frame_sim_array_0.npz")
    raw = (np.ones((2, 8, 3)) + 1j * np.zeros((2, 8, 3)))
    save_sim_frame(fp, raw, 123.4, 0)
    r, ang, idx = load_sim_frame(fp)
    np.testing.assert_array_equal(r, raw)
    assert ang == 123.4 and idx == 0


def test_stage2_suppress_flag_and_hooks():
    """Zero-velocity suppression toggle and the identity extension hooks."""
    import jax

    from radar_tpu.pipeline.stages import (istc_compensate,
                                           range_concat_dedup, stage2_mtd)

    sig = SigConfig(prt_num=32, channel_num=16, beam_num=13)
    cfg = RadarConfig(sig=sig)
    rng = np.random.default_rng(0)
    iq = jnp.asarray((rng.normal(size=(32, 3404, 13))
                      + 1j * rng.normal(size=(32, 3404, 13))), jnp.complex64)
    rdm_s, _ = stage2_mtd(iq, cfg, suppress_zero_vel=True)
    rdm_n, _ = stage2_mtd(iq, cfg, suppress_zero_vel=False)
    center = 16
    assert np.all(np.asarray(rdm_s)[center] == 0)
    assert not np.all(np.asarray(rdm_n)[center] == 0)
    # hooks are identity (reference's fun_iSTC / fun_lss_range_concate are
    # missing/commented out)
    np.testing.assert_array_equal(np.asarray(istc_compensate(iq)),
                                  np.asarray(iq))
    np.testing.assert_array_equal(np.asarray(range_concat_dedup(iq)),
                                  np.asarray(iq))


def test_track_height_property():
    from radar_tpu.pipeline.driver import Track

    t = Track(1000.0, 10.0, 30.0, 0.0, 1.0, 1, 2, 2, np.array([0, 1]))
    np.testing.assert_allclose(t.height_m, 1000.0 * np.sin(np.deg2rad(30.0)))


def _windowed_fixture(prt_num=32, n_b=2, gate=1200, v=10.0,
                      on_pulses=None, seed=7):
    """Two consecutive gated beam-space frames with one long-segment echo,
    coherent across the frame boundary; ``on_pulses`` restricts which of
    the 2P pulses carry the echo."""
    from radar_tpu.pipeline.stages import _segment_pulses

    sig = SigConfig(prt_num=prt_num, channel_num=16, beam_num=n_b)
    cfg = RadarConfig(sig=sig)
    n_g = sig.n_total_gate
    rng = np.random.default_rng(seed)
    two = (rng.normal(size=(2 * prt_num, n_g, n_b))
           + 1j * rng.normal(size=(2 * prt_num, n_g, n_b))) * np.sqrt(0.5)
    _, _, p3 = _segment_pulses(cfg)
    seg = np.zeros(n_g, complex)
    seg[gate:gate + len(p3)] = p3
    fd = 2 * v / sig.wavelength
    dop = np.exp(1j * 2 * np.pi * fd * np.arange(2 * prt_num) * sig.prt)
    gate_pulses = np.ones(2 * prt_num) if on_pulses is None else on_pulses
    two += (6.0 * (gate_pulses * dop)[:, None, None] * seg[None, :, None])
    two = two.astype(np.complex64)
    return cfg, jnp.asarray(two[:prt_num]), jnp.asarray(two[prt_num:])


def test_stage2_windowed_slice0_matches_single_frame():
    from radar_tpu.pipeline.stages import stage2_mtd, stage2_mtd_windowed

    cfg, f1, f2 = _windowed_fixture()
    rdm_single, pc_single = stage2_mtd(f1, cfg)
    rdm_slices, pc_two = stage2_mtd_windowed(f1, f2, cfg, win_size=4)
    assert rdm_slices.shape == (4,) + rdm_single.shape
    np.testing.assert_allclose(np.asarray(rdm_slices[0]),
                               np.asarray(rdm_single), rtol=2e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(pc_two[:cfg.sig.prt_num]),
                               np.asarray(pc_single), rtol=2e-5, atol=1e-3)


def test_stage2_windowed_recovers_boundary_straddling_target():
    """A target only present around the frame boundary integrates a full
    CPI in the straddling slice but a fraction of one in slice 0."""
    from radar_tpu.pipeline.stages import stage2_mtd_windowed

    prt = 32
    on = np.zeros(2 * prt)
    on[prt - 16: prt + 16] = 1.0  # second half of f1 + first half of f2
    cfg, f1, f2 = _windowed_fixture(prt_num=prt, on_pulses=on)
    rdm_slices, _ = stage2_mtd_windowed(f1, f2, cfg, win_size=4)
    mag = np.abs(np.asarray(rdm_slices))  # [4, V, G, B]
    peaks = mag.reshape(4, -1).max(axis=1)
    # hop = 8: slice 2 covers pulses 16..48 = exactly the on window
    assert np.argmax(peaks) == 2
    assert peaks[2] > 1.8 * peaks[0]


def test_stage2_windowed_divisibility_check():
    import pytest

    from radar_tpu.pipeline.stages import stage2_mtd_windowed

    cfg, f1, f2 = _windowed_fixture()
    with pytest.raises(ValueError):
        stage2_mtd_windowed(f1, f2, cfg, win_size=5)


@pytest.mark.slow
def test_realdata_pipeline_windowed_end_to_end():
    """Each window slice of the two-frame chain detects a persistent
    target at the same gate."""
    from radar_tpu.pipeline.stages import run_realdata_pipeline_windowed

    prt = 32
    sig = SigConfig(prt_num=prt, channel_num=16, beam_num=13)
    cfg = RadarConfig(sig=sig)
    n_g, n_c = sig.n_total_gate, 16
    rng = np.random.default_rng(3)
    two = (rng.normal(size=(2 * prt, n_g, n_c))
           + 1j * rng.normal(size=(2 * prt, n_g, n_c))) * np.sqrt(0.5)
    from radar_tpu.pipeline.stages import _segment_pulses

    _, _, p3 = _segment_pulses(cfg)
    truth_gate, truth_v = 1500, 12.0
    dphi = (2 * np.pi * 0.0138 * np.sin(np.deg2rad(12.0)) / sig.wavelength)
    steer = np.exp(-1j * np.arange(n_c) * dphi)
    fd = 2 * truth_v / sig.wavelength
    dop = np.exp(1j * 2 * np.pi * fd * np.arange(2 * prt) * sig.prt)
    seg = np.zeros(n_g, complex)
    seg[truth_gate:truth_gate + len(p3)] = p3
    two += 8.0 * dop[:, None, None] * seg[None, :, None] * steer[None, None, :]
    two = two.astype(np.complex64)

    meas, rdm_slices = run_realdata_pipeline_windowed(
        jnp.asarray(two[:prt]), jnp.asarray(two[prt:]), cfg, freq_no=6,
        win_size=4)
    assert len(meas) == 4 and rdm_slices.shape[0] == 4
    delta_r = sig.c / (2 * sig.fs)
    for k, m in enumerate(meas):
        valid = np.asarray(m.valid)
        assert valid.sum() >= 1, f"slice {k} found nothing"
        r = np.asarray(m.range_m)[valid]
        p = np.asarray(m.power)[valid]
        assert abs(r[np.argmax(p)] - truth_gate * delta_r) \
            <= 2 * delta_r + 3.0, f"slice {k}"
