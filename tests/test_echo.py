"""Echo-synthesis checks: parity with the numpy oracle plus the reference's
self-check idioms (expected delay sample and inter-channel phase step,
main_simulate_echoes_with_array_v7_7.m:299-309; SURVEY.md section 4.4)."""

import jax
import jax.numpy as jnp
import numpy as np
from oracle import echo_oracle

from radar_tpu.config.params import small_test_config
from radar_tpu.sim.echo import add_noise, synthesize_echoes
from radar_tpu.sim.scenario import TargetBatch
from radar_tpu.waveform.precompute import precompute


def test_echo_matches_oracle():
    cfg = small_test_config(channels=8, pulses=16)
    pre = precompute(cfg)
    tb = TargetBatch.make([3000.0, 8000.0], [12.0, -7.0], [10.0, 25.0],
                          [20.0, 10.0])
    got = np.asarray(synthesize_echoes(tb, pre, cfg, dtype=jnp.complex128))
    want = echo_oracle(tb.range_m, tb.velocity_ms, tb.elevation_deg,
                       tb.snr_db, pre, cfg)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_echo_delay_and_phase_selfchecks():
    cfg = small_test_config(channels=8, pulses=4)
    pre = precompute(cfg)
    r, v, el, snr = 3000.0, 15.0, 10.0, 0.0
    tb = TargetBatch.make([r], [v], [el], [snr])
    cube = np.asarray(synthesize_echoes(tb, pre, cfg, dtype=jnp.complex128))

    # expected delay sample
    delay = round(2 * r / cfg.sig.c * cfg.sig.fs)
    first_nonzero = np.nonzero(np.abs(cube[0, :, 0]) > 0)[0][0]
    assert first_nonzero == delay

    # inter-channel phase step = 2*pi*d*sin(el)/lambda
    s = cube[0, delay + 300, :]  # inside the medium chirp
    steps = np.angle(s[1:] * np.conj(s[:-1]))
    expected = (2 * np.pi * cfg.array.element_spacing
                * np.sin(np.deg2rad(el)) / cfg.sig.wavelength)
    np.testing.assert_allclose(steps, expected, rtol=1e-8)

    # pulse-to-pulse Doppler phase = 2*pi*(2V/lambda)*PRT
    p = cube[:, delay + 300, 0]
    dsteps = np.angle(p[1:] * np.conj(p[:-1]))
    exp_dop = np.angle(np.exp(
        1j * 2 * np.pi * (2 * v / cfg.sig.wavelength) * cfg.sig.prt))
    np.testing.assert_allclose(dsteps, exp_dop, rtol=1e-6)

    # SNR-referenced amplitude: |echo| = sqrt(SNR_lin) on unit pulse samples
    np.testing.assert_allclose(np.abs(cube[0, delay, 0]), 1.0, rtol=1e-9)


def test_echo_out_of_range_delay_is_zero():
    cfg = small_test_config(channels=8, pulses=4)
    pre = precompute(cfg)
    # delay beyond the PRT -> no echo (reference guard, ref :66)
    r_far = cfg.sig.point_prt * cfg.sig.c / (2 * cfg.sig.fs) + 1000.0
    tb = TargetBatch.make([r_far], [10.0], [5.0], [30.0])
    cube = np.asarray(synthesize_echoes(tb, pre, cfg, dtype=jnp.complex128))
    assert np.all(cube == 0)


def test_noise_statistics_and_channel_independence():
    cfg = small_test_config(channels=8, pulses=32)
    key = jax.random.PRNGKey(7)
    zeros = jnp.zeros((cfg.sig.prt_num, 2048, cfg.sig.channel_num),
                      dtype=jnp.complex128)
    noise = np.asarray(add_noise(key, zeros))
    # unit total power, half per rail
    np.testing.assert_allclose(np.mean(np.abs(noise) ** 2), 1.0, rtol=0.01)
    np.testing.assert_allclose(np.var(noise.real), 0.5, rtol=0.02)
    # cross-channel correlation ~ 0 (the property the reference secures with
    # per-channel randn loops, ref :81-88)
    flat = noise.reshape(-1, cfg.sig.channel_num)
    c = np.corrcoef(flat.real.T)
    off = c[~np.eye(cfg.sig.channel_num, dtype=bool)]
    assert np.max(np.abs(off)) < 0.02
