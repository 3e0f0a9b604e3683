"""Device-side 16..128-channel echo synthesis (SURVEY.md L3 device part).

TPU-first reformulation of the reference's triple loop
(fun_process_single_frame.m:45-88): instead of ``for m in pulses: for k in
targets: place pulse, phase, outer-product``, the whole raw-IQ cube is one
einsum over precomputed per-target factor vectors:

  raw[p, s, c] = sum_k  amp_k * dop_k[p] * base_k[s] * steer_k[c]

with
  base_k  = tx_pulse delayed by round(2R/c*fs) samples, zero-fill at the
            front, no wraparound (ref :66-69)
  dop_k   = exp(+j*2*pi*(2V/lambda)*p*PRT)                  (ref :57-58)
  amp_k   = sqrt(SNR_lin * P_noise / P_signal_unscaled)     (ref :61-63)
  steer_k = exp(+j*c_idx*2*pi*d*sin(El)/lambda)             (ref :71-74,163-169)

Complex AWGN with per-rail variance P_noise/2 is added over the full cube
from a single PRNG key folded per frame; JAX's counter-based RNG guarantees
the cross-channel independence the reference secures by per-channel randn
loops (ref :81-88; SURVEY.md section 5.2).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config.params import RadarConfig

P_NOISE_FLOOR = 1.0  # reference v8 noise floor (fun_process_single_frame.m:16)


def radar_equation_amplitude(range_m, rcs, wavelength: float,
                             gain: float = 1e8):
    """Historical v1 amplitude model (SURVEY.md section 2.1 "Amplitude
    models"): A = gain * sqrt(RCS * lambda^2) / (R^2 * (4*pi)^(3/2)), with
    the reference's fudge gain 1e8 (main_simulate_echoes_with_array.m:
    167-170). The v4 model is simply amplitude = 1 (_v4.m:157); the current
    SNR-referenced model (v7.5+) is the default inside the synthesizer."""
    import jax.numpy as jnp

    return (gain * jnp.sqrt(rcs * wavelength**2)
            / (range_m**2 * (4.0 * jnp.pi) ** 1.5))


@partial(jax.jit, static_argnames=("num_pulses", "num_channels",
                                   "element_spacing", "wavelength", "prt",
                                   "fs", "c", "dtype", "nfft"))
def _synthesize(range_m, velocity_ms, elevation_deg, amp, tx_pulse,
                num_pulses: int, num_channels: int, element_spacing: float,
                wavelength: float, prt: float, fs: float, c: float, dtype,
                nfft: int):
    num_samples = tx_pulse.shape[0]
    real_dtype = jnp.finfo(dtype).dtype

    delay_s = 2.0 * range_m / c
    delay_samples = jnp.round(delay_s * fs).astype(jnp.int32)  # [K]

    # Delayed base pulse per target: integer LINEAR shift applied in the
    # frequency domain on a power-of-2 grid: ifft(fft(tx, nfft) *
    # exp(-2pi*j*k*d/nfft))[:S]. Gather-free (dynamic gathers are
    # pathological on some TPU runtimes: untransferable output layouts,
    # erratic execution) and on the power-of-2 FFT fast path (a length-S
    # transform goes through Bluestein and costs several ms). ``nfft`` >=
    # S + tx support guarantees no wraparound for any delay < S, so this is
    # exactly the reference's zero-padded shift (ref :66-69). The phase
    # index k*d is reduced mod nfft with a bitwise AND so float32 phase
    # stays exact.
    sample_idx = jnp.arange(nfft)
    tx_f = jnp.fft.fft(tx_pulse, n=nfft)  # folded to a constant per program
    kd = (sample_idx[None, :] * delay_samples[:, None]) & (nfft - 1)  # [K,N]
    phase = (-2.0 * jnp.pi) * kd.astype(real_dtype) / nfft
    shift = jnp.exp(1j * phase).astype(dtype)
    rolled = jnp.fft.ifft(tx_f[None, :] * shift,
                          axis=-1)[..., :num_samples].astype(dtype)
    valid_delay = (delay_samples > 0) & (delay_samples < num_samples)
    mask = ((jnp.arange(num_samples)[None, :] >= delay_samples[:, None])
            & valid_delay[:, None])
    base = jnp.where(mask, rolled, 0.0).astype(dtype)

    # slow-time Doppler phasor per target
    doppler_freq = 2.0 * velocity_ms / wavelength  # [K]
    m = jnp.arange(num_pulses, dtype=real_dtype)
    dop = jnp.exp(1j * (2.0 * jnp.pi * prt)
                  * doppler_freq[:, None].astype(real_dtype) * m[None, :]
                  ).astype(dtype)  # [K,P]

    # channel steering phasors
    el = jnp.deg2rad(elevation_deg)  # [K]
    dphi = (2.0 * jnp.pi * element_spacing * jnp.sin(el) / wavelength)
    n = jnp.arange(num_channels, dtype=real_dtype)
    steer = jnp.exp(1j * dphi[:, None].astype(real_dtype) * n[None, :]
                    ).astype(dtype)  # [K,C]

    dop_amp = dop * amp[:, None].astype(dtype)
    return jnp.einsum("kp,ks,kc->psc", dop_amp, base, steer,
                      preferred_element_type=dtype)


def synthesize_echoes(targets, precomp, cfg: RadarConfig,
                      dtype=jnp.complex64, amplitudes=None):
    """Raw IQ cube [prt_num, point_prt, channel_num] for one frame.

    ``amplitudes`` overrides the default SNR-referenced amplitude model
    (amp = sqrt(SNR_lin*P_noise/P_signal_unscaled), ref :61-63) with
    explicit per-target amplitudes — e.g. radar_equation_amplitude (v1
    model) or ones (v4 model)."""
    sig = cfg.sig
    tx = jnp.asarray(precomp.tx_pulse, dtype)
    # smallest power of 2 covering S + tx support: linear-shift FFT grid
    import numpy as _np

    support = int(_np.max(_np.nonzero(_np.abs(
        _np.asarray(precomp.tx_pulse)) > 0)[0])) + 1
    nfft = 1
    while nfft < sig.point_prt + support:
        nfft *= 2
    if amplitudes is None:
        snr_lin = 10.0 ** (jnp.asarray(targets.snr_db) / 10.0)
        amplitudes = jnp.sqrt(snr_lin * P_NOISE_FLOOR
                              / precomp.p_signal_unscaled)
    return _synthesize(
        jnp.asarray(targets.range_m), jnp.asarray(targets.velocity_ms),
        jnp.asarray(targets.elevation_deg), jnp.asarray(amplitudes),
        tx, num_pulses=sig.prt_num, num_channels=sig.channel_num,
        element_spacing=cfg.array.element_spacing, wavelength=sig.wavelength,
        prt=sig.prt, fs=sig.fs, c=sig.c, dtype=dtype, nfft=nfft)


def add_noise(key: jax.Array, raw_iq: jax.Array,
              p_noise: float = P_NOISE_FLOOR) -> jax.Array:
    """Independent complex AWGN on every (pulse, sample, channel) cell,
    sqrt(p_noise/2) per rail (fun_process_single_frame.m:81-88)."""
    dtype = raw_iq.dtype
    real_dtype = jnp.finfo(dtype).dtype
    shape = raw_iq.shape + (2,)
    g = jax.random.normal(key, shape, dtype=real_dtype)
    noise = (g[..., 0] + 1j * g[..., 1]) * jnp.sqrt(
        jnp.asarray(p_noise / 2.0, real_dtype))
    return raw_iq + noise.astype(dtype)
