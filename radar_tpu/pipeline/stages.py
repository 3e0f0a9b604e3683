"""Staged real-data processing pipeline (SURVEY.md section 3.6; reference
main_test_with_simulated_data.m + process_stage2_mtd.m).

The reference's real-data adapter is a four-stage, checkpoint-heavy
architecture whose stage-3/4 functions are missing from the repo; their
behavior is reconstructed here from the call sites and the inline copies in
debug_simulated_data_processing_v2.m (SURVEY.md section 2.4):

  stage 1  per-pulse DBF with the transposed (non-conjugated) coefficient
           matrix (main_test:210-214)
  stage 2  per-beam PC + MTD + zero-velocity clutter suppression
           (process_stage2_mtd.m:33-46 -> fun_MTD_produce inline copy,
           debug_v2:259-405). NB the adapter calls a two-frame windowed
           variant (iq1, iq2, win_size=4) that the committed
           process_stage2_mtd.m does not implement (signature mismatch,
           main_test:238 vs process_stage2_mtd.m:1); ``stage2_mtd``
           matches the committed file (one full-frame slice, second frame
           accepted and ignored) while ``stage2_mtd_windowed`` implements
           the sliding-CPI behavior the adapter's win_size=4 implies.
  stage 3  sum-beam detection: adjacent-pair |MTD| sums through the
           segmented 1D CA-GO/SO CFAR (ops/cfar1d.py); returns the
           preliminary detection log and per-pair CFAR flag cubes
           (main_test:242, debug harness checklist)
  stage 4  diff-beam measurement: spline range/velocity refinement +
           amplitude monopulse with the per-frequency-point K table
           (R9-DMX3-2024001_Angle_k.csv indexed by the frame header's
           freq_no, main_test:219-221) and the site-corrected nominal beam
           angles (beam_angles - ELeAngleSettingValue, main_test:72-73);
           returns entries with fields range_m / velocity_ms / elevation_deg
           (main_test:255-265)

This path operates on already-gated 3404-sample IQ (point_PRT=3404 in the
real-data config, main_test:52) — pulse compression is segment-local with
'same'-aligned matched filters (peak at the echo's gate), unlike the sim
path's full-PRT splice.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.params import RadarConfig
from ..config import assets
from ..measure.estimate import estimate_parameters
from ..ops.cfar import Detections, extract_detections
from ..ops.cfar1d import segmented_cfar_1d, zero_velocity_mask
from ..ops.dbf import dbf
from ..ops.mtd import mtd
from ..pipeline.frame import MeasureConsts
from ..utils.signal import kaiser_window


def realdata_beam_angles(cfg: RadarConfig) -> np.ndarray:
    """Nominal beam angles minus the elevation setting correction
    (main_test:72-73)."""
    return (assets.BEAM_ANGLES_DEG_REALDATA
            - cfg.corrected.elevation_setting_deg)


def _segment_pulses(cfg: RadarConfig):
    """The three reference pulses of the gated path: narrow sin pulse
    (v1-style, sin(2*pi*t+pi/2), debug_v2:316), medium/long LFM."""
    sig = cfg.sig
    fs, (tau1, tau2, tau3) = sig.fs, sig.tau
    ts = 1.0 / fs
    t1 = np.arange(-tau1 / 2, tau1 / 2 - ts / 2, ts)
    t2 = np.linspace(-tau2 / 2, tau2 / 2, round(tau2 * fs))
    t3 = np.linspace(-tau3 / 2, tau3 / 2, round(tau3 * fs))
    k2 = -sig.bandwidth / tau2
    k3 = sig.bandwidth / tau3
    p1 = np.sin(2 * np.pi * t1 + np.pi / 2).astype(np.complex128)
    p2 = np.exp(1j * 2 * np.pi * 0.5 * k2 * t2**2)
    p3 = np.exp(1j * 2 * np.pi * 0.5 * k3 * t3**2)
    return p1, p2, p3


def _stage2_pulse_compress(iq_beams: jnp.ndarray, cfg: RadarConfig
                           ) -> jnp.ndarray:
    """Segment-local matched filtering on gated [P, 3404, B] beam data,
    'same'-aligned (peak at the echo's gate)."""
    sig = cfg.sig
    dtype = iq_beams.dtype
    pulses = _segment_pulses(cfg)
    splits = sig.point_prt_segments

    x = jnp.swapaxes(iq_beams, 1, 2)  # [P, B, G]
    pieces = []
    start = 0
    for seg_i, (pulse, width) in enumerate(zip(pulses, splits)):
        seg = x[..., start:start + width]
        h = np.conj(pulse[::-1])
        if seg_i > 0:  # the medium/long LFM matched filters get the
            # kaiser-4.5 window; the narrow sin pulse (segment 0) never
            # does (keying on position, not a sample-count proxy)
            h = h * kaiser_window(len(pulse), 4.5)[::-1]
        lh = len(h)
        nfft = 1
        while nfft < width + lh - 1:
            nfft *= 2
        xf = jnp.fft.fft(seg, n=nfft, axis=-1)
        hf = jnp.fft.fft(jnp.asarray(h, dtype), n=nfft)
        y = jnp.fft.ifft(xf * hf, n=nfft, axis=-1)
        pieces.append(y[..., lh - 1: lh - 1 + width])
        start += width
    return jnp.swapaxes(jnp.concatenate(pieces, axis=-1), 1, 2).astype(dtype)


def _suppress_zero_velocity(rdm: jnp.ndarray, cfg: RadarConfig
                            ) -> jnp.ndarray:
    """Zero the SAME Doppler index band the CFAR stage will mask (center
    +/- MTD_0v_num); an axis-based band would zero rows the CFAR mask does
    not cover and every all-zero row would fire the ``>=`` detector across
    all gates."""
    n0v = int(cfg.cfar1d.mtd_zero_vel_ms / _delta_v_bin(cfg.sig))
    band = ~zero_velocity_mask(cfg.sig.prt_num, n0v)  # jnp: jit-safe
    return jnp.where(band[:, None, None], 0.0, rdm)


def stage2_mtd(iq_beams: jnp.ndarray, cfg: RadarConfig,
               iq_beams_2: jnp.ndarray | None = None,
               suppress_zero_vel: bool = True
               ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """PC + MTD per beam on gated [P, 3404, B] beam data; returns
    (mtd_results, pc_results). A second frame is accepted for signature
    parity with the adapter but ignored (see module docstring); for the
    sliding-CPI behavior the adapter's win_size implies, use
    ``stage2_mtd_windowed``."""
    del iq_beams_2
    sig = cfg.sig
    pc = _stage2_pulse_compress(iq_beams, cfg)
    win = kaiser_window(sig.prt_num, 4.5)
    rdm = mtd(pc, jnp.asarray(win, jnp.finfo(iq_beams.dtype).dtype))
    if suppress_zero_vel:
        rdm = _suppress_zero_velocity(rdm, cfg)
    return rdm, pc


def stage2_mtd_windowed(iq_beams: jnp.ndarray, iq_beams_2: jnp.ndarray,
                        cfg: RadarConfig, win_size: int | None = None,
                        suppress_zero_vel: bool = True
                        ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Two-frame sliding-CPI MTD — the behavior the adapter's call
    signature implies but the committed reference file dropped.

    The adapter passes TWO consecutive frames plus ``config.mtd.win_size=4``
    (main_test_with_simulated_data.m:80,238) to a stage whose committed
    implementation takes one frame and hardcodes a single full-frame slice
    (process_stage2_mtd.m:33-46, SURVEY.md section 2.4 signature-mismatch
    note). This reconstructs the intended windowing: pulse-compress the
    664-pulse two-frame buffer once (PC is per-pulse), then run a
    full-length P-pulse MTD at ``win_size`` window offsets hopping by
    P/win_size into frame 2 — slice 0 is exactly the single-frame result,
    later slices straddle the frame boundary so a target entering late in
    frame 1 still integrates a full CPI.

    Returns ``(rdm_slices [win_size, P, 3404, B], pc [2P, 3404, B])``.
    """
    sig = cfg.sig
    p = sig.prt_num
    if win_size is None:
        win_size = cfg.mtd_win_size
    if p % win_size != 0:
        raise ValueError(f"prt_num {p} is not divisible by win_size "
                         f"{win_size}")
    hop = p // win_size
    pc = _stage2_pulse_compress(
        jnp.concatenate([iq_beams, iq_beams_2], axis=0), cfg)
    win = np.asarray(kaiser_window(p, 4.5),
                     jnp.finfo(iq_beams.dtype).dtype)
    slices = jnp.stack([pc[k * hop:k * hop + p] for k in range(win_size)])
    rdm = jax.vmap(lambda s: mtd(s, win))(slices)
    if suppress_zero_vel:
        rdm = jax.vmap(lambda r: _suppress_zero_velocity(r, cfg))(rdm)
    return rdm, pc


def _delta_v_bin(sig) -> float:
    """Velocity per Doppler bin: wavelength*prf/(2*prtNum)
    (main_test:120-122)."""
    return sig.wavelength * (1.0 / sig.prt) / (2.0 * sig.prt_num)


def pair_sum_maps_realdata(mtd_results: jnp.ndarray) -> jnp.ndarray:
    """Adjacent-beam amplitude sum maps [V, G, pairs] from the complex
    RDM — shared by stages 3 and 4 (compute once per frame; the cube is
    ~14M cells)."""
    mag = jnp.abs(mtd_results)
    return mag[:, :, :-1] + mag[:, :, 1:]


def stage3_detection(mtd_results: jnp.ndarray, cfg: RadarConfig,
                     threshold_factor=None, maps: jnp.ndarray | None = None
                     ) -> tuple[Detections, jnp.ndarray]:
    """Sum-beam segmented 1D CFAR; returns (prelim detections, cfar flag
    cube [V, G, pairs]). ``threshold_factor`` optionally overrides the
    config value and may be traced (operating-curve sweeps); pass
    ``maps=pair_sum_maps_realdata(mtd_results)`` to share the pair-sum
    cube with stage 4."""
    sig = cfg.sig
    if maps is None:
        maps = pair_sum_maps_realdata(mtd_results)
    flags, _ = segmented_cfar_1d(maps, cfg.cfar1d, sig.point_prt_segments,
                                 _delta_v_bin(sig),
                                 threshold_factor=threshold_factor)
    dets = extract_detections(flags, maps, cfg.cfar.max_detections)
    return dets, flags


class RealDataMeasurement(NamedTuple):
    """stage-4 output rows (main_test:261-264 field names)."""

    range_m: jnp.ndarray
    velocity_ms: jnp.ndarray
    elevation_deg: jnp.ndarray
    power: jnp.ndarray
    pair_idx: jnp.ndarray
    valid: jnp.ndarray


def measure_consts(cfg: RadarConfig, freq_no: int) -> "MeasureConsts":
    """Host-side stage-4 constants (axes, spline upsample matrices, the
    freq-point K row). Hoist out of per-slice loops — nothing here
    depends on the data."""
    sig = cfg.sig
    from ..utils.signal import spline_upsample_matrix

    ip = cfg.interp
    n = 2 * ip.extra_dots + 1
    angle_k = assets.angle_k_table()
    if not 0 <= freq_no < angle_k.shape[0]:
        # the reference indexes the 11x12 Angle_k CSV with the frame
        # header's frequency point, which is 1-BASED in MATLAB (1..11);
        # this API is 0-based — callers feeding .bin header values must
        # pass header_freq_no - 1 (SURVEY.md real-data adapter notes)
        raise ValueError(
            f"freq_no {freq_no} outside 0..{angle_k.shape[0] - 1} "
            "(0-based frequency-point index; a MATLAB-convention .bin "
            "header value is 1-based — pass header value minus 1)")
    k_row = -np.abs(angle_k[freq_no])  # slope sign: beam A below beam B
    v_max = sig.v_max
    return MeasureConsts(
        range_axis=np.arange(sig.n_total_gate, dtype=np.float64)
        * (sig.c / (2 * sig.fs)),
        velocity_axis=np.linspace(-v_max / 2, v_max / 2, sig.prt_num),
        delta_r=sig.c / (2 * sig.fs),
        delta_v=v_max / sig.prt_num,
        beam_angles_deg=realdata_beam_angles(cfg),
        k_slopes_lut=k_row,
        q_range=spline_upsample_matrix(n, ip.r_interp_times),
        q_vel=spline_upsample_matrix(n, ip.v_interp_times),
    )


def stage4_measurement(prelim: Detections, mtd_results: jnp.ndarray,
                       cfg: RadarConfig, freq_no: int,
                       maps: jnp.ndarray | None = None,
                       consts: "MeasureConsts | None" = None
                       ) -> RealDataMeasurement:
    """Spline refinement + monopulse with the freq-point K table row.
    ``maps``/``consts`` let a caller share the stage-3 pair-sum cube and
    the host-side constants instead of recomputing them."""
    ip = cfg.interp
    mc = consts if consts is not None else measure_consts(cfg, freq_no)
    if maps is None:
        maps = pair_sum_maps_realdata(mtd_results)
    p = estimate_parameters(prelim, maps, mtd_results, mc, ip.extra_dots,
                            ip.r_interp_times, ip.v_interp_times,
                            monopulse_complex=cfg.monopulse_complex,
                            monopulse_refined=cfg.monopulse_refined)
    return RealDataMeasurement(
        range_m=p.range_m, velocity_ms=p.velocity_ms,
        elevation_deg=p.angle_deg, power=p.power, pair_idx=p.pair_idx,
        valid=p.valid)


def istc_compensate(iq: jnp.ndarray, enable: bool = False) -> jnp.ndarray:
    """Sensitivity-time-control (STC) compensation hook.

    The reference calls ``fun_iSTC`` before pulse compression but the
    function is missing from the repo and the call is commented out
    (debug_simulated_data_processing_v2.m:329, SURVEY.md section 2.4) — the
    shipped behavior is identity, preserved here; the hook exists so a
    measured STC curve can be applied when available."""
    del enable
    return iq


def range_concat_dedup(pc: jnp.ndarray) -> jnp.ndarray:
    """Range de-duplication hook (``fun_lss_range_concate``).

    Missing from the reference repo and commented out at its only call site
    (debug_simulated_data_processing_v2.m:337) — the shipped pipeline keeps
    all 3404 gates; identity here, kept as the extension point for overlap
    removal between pulse segments."""
    return pc


def run_realdata_pipeline(raw_iq: jnp.ndarray, cfg: RadarConfig,
                          freq_no: int = 6):
    """Full staged chain on gated raw IQ [P, 3404, C]; returns
    (measurements, detections, mtd_results)."""
    dbf_w = np.asarray(assets.dbf_coeffs())
    beams = dbf(raw_iq, jnp.asarray(dbf_w, raw_iq.dtype), "realdata")
    rdm, _pc = stage2_mtd(beams, cfg)
    maps = pair_sum_maps_realdata(rdm)   # shared by stages 3 + 4
    dets, _flags = stage3_detection(rdm, cfg, maps=maps)
    meas = stage4_measurement(dets, rdm, cfg, freq_no, maps=maps)
    return meas, dets, rdm


def run_realdata_pipeline_windowed(raw_iq: jnp.ndarray,
                                   raw_iq_2: jnp.ndarray, cfg: RadarConfig,
                                   freq_no: int = 6,
                                   win_size: int | None = None):
    """Two-frame sliding-CPI staged chain on gated raw IQ [P, 3404, C]
    pairs; stage 3/4 run per window slice (the per-slice ``MTD_data_win``
    layout of main_test:147). Returns ``(measurements [win_size], rdm_slices
    [win_size, P, 3404, B])``."""
    dbf_w = np.asarray(assets.dbf_coeffs())
    beams = dbf(raw_iq, jnp.asarray(dbf_w, raw_iq.dtype), "realdata")
    beams2 = dbf(raw_iq_2, jnp.asarray(dbf_w, raw_iq.dtype), "realdata")
    rdm_slices, _pc = stage2_mtd_windowed(beams, beams2, cfg, win_size)

    mc = measure_consts(cfg, freq_no)    # host constants: build ONCE

    def per_slice(rdm):
        maps = pair_sum_maps_realdata(rdm)
        dets, _ = stage3_detection(rdm, cfg, maps=maps)
        return stage4_measurement(dets, rdm, cfg, freq_no, maps=maps,
                                  consts=mc)

    meas = [per_slice(rdm_slices[k]) for k in range(rdm_slices.shape[0])]
    return meas, rdm_slices
