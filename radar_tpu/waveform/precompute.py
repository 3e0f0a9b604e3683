"""Tx waveform synthesis and per-config derived constants (SURVEY.md L2).

Host-side float64 numpy, run once per config; mirrors the precompute block of
the reference driver (main_simulate_echoes_with_array_v8_3.m:86-190) but as a
pure function of the typed config tree instead of a copy-pasted script
section.

Composite 3-pulse PRT waveform (v8_3:121-139):
  - narrow simple pulse: tau1=0.16us -> 4 samples of ones at offset 0
  - medium LFM: tau2=8us -> 200 samples, chirp rate k2 = -B/tau2, placed at
    offset round((tau1+gap1)*fs) = 289
  - long LFM: tau3=28us -> 700 samples, chirp rate k3 = +B/tau3, placed at
    offset 289 + round((tau2+gap2)*fs) = 1284
inside one 5819-sample PRT at fs=25MHz.

All indices in this framework are 0-based; the reference's 1-based segment
starts 5/490/1985 (v8_3:167-169) become 4/489/1984 here.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ..config import assets
from ..config.params import RadarConfig
from ..doa.calibrate import calibrate_k_slopes
from ..doa.steering import default_synthetic_beam_angles, synthesize_dbf_bank
from ..utils.signal import (fir_group_delay_mean, kaiser_window, next_pow2,
                            spline_upsample_matrix)


class Precomputed(NamedTuple):
    """Derived-constant cache (reference ``precomputed_data``)."""

    # waveform
    tx_pulse: np.ndarray            # [S] complex128
    p_signal_unscaled: float        # mean |tx|^2 over nonzero samples
    pulse_lengths: tuple            # (n1, n2, n3) samples
    # matched filters
    mf_narrow: np.ndarray           # [35] float64 FIR taps
    fir_delay: int
    mf_medium_win: np.ndarray       # [n2] complex time-domain MF
    mf_long_win: np.ndarray         # [n3] complex
    mf_medium_fft: np.ndarray       # [n_fft_med] complex
    mf_long_fft: np.ndarray         # [n_fft_long] complex
    n_fft_med: int
    n_fft_long: int
    # segmentation (0-based sample starts in the PRT)
    seg_start_narrow: int
    seg_start_medium: int
    seg_start_long: int
    gate_splits: tuple              # (n_gate_narrow, n_gate_medium, n_gate_long)
    n_total_gate: int
    # MTD
    mtd_win: np.ndarray             # [prt_num] float64 kaiser(4.5)
    # axes
    range_axis: np.ndarray          # [n_total_gate]
    velocity_axis: np.ndarray       # [prt_num]
    delta_r: float
    delta_v: float
    # beams
    dbf_w: np.ndarray               # [beams, channels] complex
    beam_angles_deg: np.ndarray     # [beams]
    k_slopes_lut: np.ndarray        # [beams-1]
    # spline peak-refinement stencil matrices (measure/)
    q_range: np.ndarray             # [(2*extra)*r_times+1, 2*extra+1]
    q_vel: np.ndarray               # [(2*extra)*v_times+1, 2*extra+1]


def build_tx_pulse(cfg: RadarConfig) -> tuple[np.ndarray, tuple]:
    sig = cfg.sig
    fs = sig.fs
    tau1, tau2, tau3 = sig.tau
    gap1, gap2 = sig.gap_duration[0], sig.gap_duration[1]
    n1 = round(tau1 * fs)
    n2 = round(tau2 * fs)
    n3 = round(tau3 * fs)
    k2 = -sig.bandwidth / tau2
    k3 = sig.bandwidth / tau3
    t2 = np.linspace(-tau2 / 2, tau2 / 2, n2)
    t3 = np.linspace(-tau3 / 2, tau3 / 2, n3)
    pulse1 = np.ones(n1, dtype=np.complex128)
    pulse2 = np.exp(1j * 2 * np.pi * (0.5 * k2 * t2**2))
    pulse3 = np.exp(1j * 2 * np.pi * (0.5 * k3 * t3**2))
    tx = np.zeros(sig.point_prt, dtype=np.complex128)
    tx[:n1] = pulse1
    off1 = round((tau1 + gap1) * fs)
    tx[off1:off1 + n2] = pulse2
    off2 = off1 + round((tau2 + gap2) * fs)
    tx[off2:off2 + n3] = pulse3
    return tx, (n1, n2, n3, pulse2, pulse3)


def build_tx_pulse_v1(cfg: RadarConfig) -> np.ndarray:
    """Historical v1 waveform variant (SURVEY.md section 2.1 "Tx waveform
    generator", main_simulate_echoes_with_array.m:86-121): the three pulses
    are placed directly at the starts of the three range-gate segments of a
    3404-sample gated PRT (not the full 5819-sample PRT), and the narrow
    pulse is sin(2*pi*t + pi/2) instead of ones."""
    sig = cfg.sig
    fs = sig.fs
    tau1, tau2, tau3 = sig.tau
    n1, n2, n3 = round(tau1 * fs), round(tau2 * fs), round(tau3 * fs)
    t1 = np.linspace(-tau1 / 2, tau1 / 2, n1)
    t2 = np.linspace(-tau2 / 2, tau2 / 2, n2)
    t3 = np.linspace(-tau3 / 2, tau3 / 2, n3)
    k2 = -sig.bandwidth / tau2
    k3 = sig.bandwidth / tau3
    p1 = np.sin(2 * np.pi * t1 + np.pi / 2).astype(np.complex128)
    p2 = np.exp(1j * 2 * np.pi * 0.5 * k2 * t2**2)
    p3 = np.exp(1j * 2 * np.pi * 0.5 * k3 * t3**2)
    g1, g2, _ = sig.point_prt_segments
    tx = np.zeros(sig.n_total_gate, dtype=np.complex128)
    tx[:n1] = p1
    tx[g1:g1 + n2] = p2
    tx[g1 + g2:g1 + g2 + n3] = p3
    return tx


def build_dbf_bank(cfg: RadarConfig):
    """Returns (dbf_w [B,C], beam_angles_deg [B], k_slopes [B-1]).

    16-channel/13-beam default -> measured assets (DBF CSV + calibrated
    angle/K LUTs, v8_3:178-183); any other geometry -> synthesized Hamming
    steering bank with self-calibrated K slopes.
    """
    sig, arr = cfg.sig, cfg.array
    if sig.channel_num == 16 and sig.beam_num == 13:
        dbf_w = assets.dbf_coeffs()
        angles = assets.BEAM_ANGLES_DEG_16CH
        ks = assets.K_SLOPES_LUT_16CH
    else:
        angles = default_synthetic_beam_angles(sig.channel_num, sig.beam_num)
        dbf_w = synthesize_dbf_bank(angles, sig.channel_num,
                                    arr.element_spacing, sig.wavelength)
        ks = calibrate_k_slopes(dbf_w, angles, arr.element_spacing,
                                sig.wavelength)
    return dbf_w, angles, ks


def precompute(cfg: RadarConfig) -> Precomputed:
    sig = cfg.sig
    fs = sig.fs
    tx, (n1, n2, n3, pulse2, pulse3) = build_tx_pulse(cfg)
    nz = tx[tx != 0]
    p_signal_unscaled = float(np.mean(np.abs(nz) ** 2))

    # matched filters (v8_3:141-161)
    mf_narrow = assets.fir_taps()
    fir_delay = fir_group_delay_mean(mf_narrow)
    win_med = kaiser_window(n2, 4.5)
    win_long = kaiser_window(n3, 4.5)
    mf_medium_win = np.conj(pulse2 * win_med)[::-1]
    mf_long_win = np.conj(pulse3 * win_long)[::-1]

    gap1_num = round(sig.gap_duration[0] * fs)
    gap2_num = round(sig.gap_duration[1] * fs)
    seg_start_narrow = n1                      # 0-based (ref 1-based: n1+1)
    seg_start_medium = n1 + gap1_num + n2      # ref: +1
    seg_start_long = n1 + gap1_num + n2 + gap2_num + n3
    s_total = sig.point_prt
    l_s_med = s_total - seg_start_medium
    l_s_long = s_total - seg_start_long
    n_fft_med = next_pow2(l_s_med + n2 - 1)
    n_fft_long = next_pow2(l_s_long + n3 - 1)
    mf_medium_fft = np.fft.fft(mf_medium_win, n_fft_med)
    mf_long_fft = np.fft.fft(mf_long_win, n_fft_long)

    # axes (v8_3:170-177)
    v_max = sig.v_max
    velocity_axis = np.linspace(-v_max / 2, v_max / 2, sig.prt_num)
    n_gate = sig.n_total_gate
    delta_r = sig.c * sig.ts / 2
    range_axis = np.arange(n_gate, dtype=np.float64) * delta_r
    # NB: delta_v is v_max/prt_num (v8_3:177) while the axis spacing is
    # v_max/(prt_num-1) — a reference quirk preserved deliberately.
    delta_v = v_max / sig.prt_num

    dbf_w, beam_angles, k_slopes = build_dbf_bank(cfg)

    ip = cfg.interp
    q_range = spline_upsample_matrix(2 * ip.extra_dots + 1, ip.r_interp_times)
    q_vel = spline_upsample_matrix(2 * ip.extra_dots + 1, ip.v_interp_times)

    return Precomputed(
        tx_pulse=tx,
        p_signal_unscaled=p_signal_unscaled,
        pulse_lengths=(n1, n2, n3),
        mf_narrow=mf_narrow,
        fir_delay=fir_delay,
        mf_medium_win=mf_medium_win,
        mf_long_win=mf_long_win,
        mf_medium_fft=mf_medium_fft,
        mf_long_fft=mf_long_fft,
        n_fft_med=n_fft_med,
        n_fft_long=n_fft_long,
        seg_start_narrow=seg_start_narrow,
        seg_start_medium=seg_start_medium,
        seg_start_long=seg_start_long,
        gate_splits=tuple(sig.point_prt_segments),
        n_total_gate=n_gate,
        mtd_win=kaiser_window(sig.prt_num, 4.5),
        range_axis=range_axis,
        velocity_axis=velocity_axis,
        delta_r=delta_r,
        delta_v=delta_v,
        dbf_w=dbf_w,
        beam_angles_deg=np.asarray(beam_angles, np.float64),
        k_slopes_lut=np.asarray(k_slopes, np.float64),
        q_range=q_range,
        q_vel=q_vel,
    )
