"""Binary PRT-record frame IO (io/binio.py + native/binio.cpp).

The format realizes the reference's declared framing byte counts
(main_test_with_simulated_data.m:58-60); the reference's own reader is
missing (SURVEY.md section 2.4), so parity here is native-vs-numpy
cross-implementation agreement plus quantization round-trip accuracy.
"""

import numpy as np
import pytest

from radar_tpu import native
from radar_tpu.io import binio


def _random_iq(rng, n_prt=6, n_samples=40, n_channels=4, scale=3.0):
    return (scale * (rng.standard_normal((n_prt, n_samples, n_channels))
                     + 1j * rng.standard_normal((n_prt, n_samples,
                                                 n_channels)))
            ).astype(np.complex64)


def test_numpy_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    iq = _random_iq(rng)
    servo = np.linspace(10.0, 12.5, 6)
    realtime = rng.standard_normal((6, 16))
    path = str(tmp_path / "frames.bin")
    meta = binio.write_bin(path, iq, servo, freq_no=7, fs_hz=25e6,
                           prt_s=232.76e-6, realtime=realtime,
                           use_native=False)
    assert (meta.n_prt, meta.n_samples, meta.n_channels) == (6, 40, 4)
    out, meta2, servo2, realtime2 = binio.read_bin(path, use_native=False)
    assert meta2 == meta and meta2.freq_no == 7
    np.testing.assert_allclose(servo2, servo)
    np.testing.assert_allclose(realtime2, realtime)
    # int16 quantization at ~30000 counts full scale: <0.01% of peak error
    peak = np.abs(iq).max()
    assert np.abs(out - iq).max() < 1e-4 * peak


@pytest.mark.skipif(not native.binio_available(),
                    reason="native library unavailable")
def test_native_numpy_cross_compat(tmp_path):
    """Both implementations produce identical bytes and read each other."""
    rng = np.random.default_rng(1)
    iq = _random_iq(rng)
    servo = np.full(6, 33.25)
    p_native = str(tmp_path / "native.bin")
    p_numpy = str(tmp_path / "numpy.bin")
    binio.write_bin(p_native, iq, servo, freq_no=3, iq_scale=1e-3,
                    use_native=True)
    binio.write_bin(p_numpy, iq, servo, freq_no=3, iq_scale=1e-3,
                    use_native=False)
    with open(p_native, "rb") as f1, open(p_numpy, "rb") as f2:
        assert f1.read() == f2.read()
    a = binio.read_bin(p_native, use_native=True)
    b = binio.read_bin(p_native, use_native=False)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[2], b[2])
    np.testing.assert_array_equal(a[3], b[3])


def test_corruption_detected(tmp_path):
    rng = np.random.default_rng(2)
    iq = _random_iq(rng, n_prt=2)
    path = str(tmp_path / "frames.bin")
    binio.write_bin(path, iq, 0.0, use_native=False)
    data = bytearray(open(path, "rb").read())
    data[binio.HEAD_BYTES + 10] ^= 0xFF  # flip a payload byte
    open(path, "wb").write(bytes(data))
    with pytest.raises(IOError):
        binio.read_bin(path, use_native=False)
    if native.binio_available():
        with pytest.raises(IOError):
            binio.read_bin(path, use_native=True)


def test_bad_magic_rejected(tmp_path):
    path = str(tmp_path / "junk.bin")
    open(path, "wb").write(b"\x00" * 256)
    with pytest.raises(IOError):
        binio.probe_bin(path, use_native=False)


def test_read_bin_frames_split(tmp_path):
    rng = np.random.default_rng(3)
    iq = _random_iq(rng, n_prt=8)
    path = str(tmp_path / "frames.bin")
    binio.write_bin(path, iq, np.arange(8.0), use_native=False)
    frames, meta, servo = binio.read_bin_frames(path, prt_per_frame=4,
                                                use_native=False)
    assert frames.shape == (2, 4, 40, 4)
    assert servo.shape == (2, 4) and servo[1, 0] == 4.0
    with pytest.raises(ValueError):
        binio.read_bin_frames(path, prt_per_frame=3, use_native=False)


@pytest.mark.slow
def test_frame_pipeline_from_bin(tmp_path):
    """End-to-end: synthesize a frame, persist as .bin, reload, and run the
    rest of the pipeline on the quantized cube — same detection as the
    unquantized run."""
    import jax
    import jax.numpy as jnp

    from radar_tpu.config.params import small_test_config
    from radar_tpu.pipeline.frame import make_frame_processor
    from radar_tpu.sim.scenario import TargetBatch
    from radar_tpu.waveform.precompute import precompute

    cfg = small_test_config(channels=8, pulses=32)
    pre = precompute(cfg)
    proc = make_frame_processor(cfg, pre, dtype=jnp.complex64,
                                return_intermediates=True)
    tb = TargetBatch.make([3000.0], [10.0], [10.0], [20.0])
    inter = jax.block_until_ready(proc(jax.random.PRNGKey(0), tb))
    raw = np.asarray(inter.raw_iq)  # [pulses, samples, channels]

    path = str(tmp_path / "frame.bin")
    binio.write_bin(path, raw, 0.0, freq_no=6, fs_hz=cfg.sig.fs,
                    prt_s=cfg.sig.prt)
    out, meta, _, _ = binio.read_bin(path)
    assert meta.freq_no == 6
    rel = np.abs(out - raw).max() / max(np.abs(raw).max(), 1e-30)
    assert rel < 1e-4

    # quantized cube through DBF -> ... -> clustering finds the same target
    from radar_tpu.cluster.stages import cluster_stage1, cluster_stage2
    from radar_tpu.measure.estimate import estimate_parameters
    from radar_tpu.ops.cfar import extract_detections, goca_cfar_2d, \
        pair_sum_maps
    from radar_tpu.ops.dbf import dbf
    from radar_tpu.ops.mtd import mtd
    from radar_tpu.ops.pulse_compression import make_plan, pulse_compress
    from radar_tpu.pipeline.frame import measure_consts

    beams = dbf(jnp.asarray(out), np.asarray(pre.dbf_w), cfg.dbf_variant)
    pc = pulse_compress(beams, pre, make_plan(pre))
    rdm = mtd(pc, np.asarray(pre.mtd_win, np.float32), cfg.mtd_fft_len)
    maps = pair_sum_maps(rdm)
    mask, _ = goca_cfar_2d(maps, cfg.cfar)
    dets = extract_detections(mask, maps, cfg.cfar.max_detections)
    params = estimate_parameters(
        dets, maps, rdm, measure_consts(cfg, pre, np.float32),
        cfg.interp.extra_dots, cfg.interp.r_interp_times,
        cfg.interp.v_interp_times)
    final = cluster_stage2(cluster_stage1(params, cfg.cluster), cfg.cluster)
    valid = np.asarray(final.valid)
    r = np.asarray(final.range_m)[valid]
    p = np.asarray(final.power)[valid]
    assert len(r) >= 1
    assert abs(r[np.argmax(p)] - 3000.0) <= 2 * pre.delta_r + 3.0
