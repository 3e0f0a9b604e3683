"""Host-side (numpy, float64) signal-processing helpers used at precompute
time: Kaiser windows, FIR group delay, and not-a-knot cubic-spline
interpolation stencils.

These run once per config on the host; the resulting constant arrays are the
only thing that reaches the device. Keeping them in float64 numpy preserves
bit-level agreement with the reference's precompute blocks
(main_simulate_echoes_with_array_v8_3.m:121-179) without dragging scalar code
into jit.
"""

from __future__ import annotations

import numpy as np


def kaiser_window(n: int, beta: float) -> np.ndarray:
    """Kaiser window, identical definition to MATLAB ``kaiser(n, beta)``
    (used at v8_3:145,147,171 with beta=4.5)."""
    return np.kaiser(n, beta)


def fir_group_delay_mean(taps: np.ndarray, nfft: int = 512) -> int:
    """round(mean(grpdelay(taps))) for an FIR filter (v8_3:144).

    Uses the standard FIR group-delay identity
    ``tau(w) = Re[ DFT(n*h) / DFT(h) ]`` evaluated on ``nfft`` points of the
    upper-half unit circle (MATLAB's default grid). For the linear-phase
    35-tap filter of the reference this evaluates to exactly 17.
    """
    taps = np.asarray(taps, dtype=np.float64)
    n = np.arange(len(taps))
    num = np.fft.rfft(n * taps, 2 * nfft)[:nfft]
    den = np.fft.rfft(taps, 2 * nfft)[:nfft]
    good = np.abs(den) > 1e-10 * np.max(np.abs(den))
    tau = np.real(num[good] / den[good])
    return int(round(float(np.mean(tau))))


def spline_upsample_matrix(n_points: int, times: int) -> np.ndarray:
    """Interpolation matrix Q of shape [(n_points-1)*times + 1, n_points]
    such that ``Q @ y`` equals MATLAB
    ``interp1(0:n_points-1, y, 0:1/times:n_points-1, 'spline')``.

    MATLAB 'spline' is the not-a-knot cubic spline; spline interpolation is
    linear in the data, so the full upsampling is one small matmul — this is
    how the per-detection peak refinement of fun_process_single_frame.m:250-278
    (extraDots=2, rInterpTimes=8 / vInterpTimes=4) becomes a batched,
    fixed-shape device op instead of a scalar interp loop.
    """
    from scipy.interpolate import CubicSpline

    x = np.arange(n_points, dtype=np.float64)
    xq = np.arange((n_points - 1) * times + 1, dtype=np.float64) / times
    cols = []
    for j in range(n_points):
        y = np.zeros(n_points)
        y[j] = 1.0
        cs = CubicSpline(x, y, bc_type="not-a-knot")
        cols.append(cs(xq))
    return np.stack(cols, axis=1)


def next_pow2(n: int) -> int:
    """2 ** nextpow2(n) (v8_3:158-159)."""
    p = 1
    while p < n:
        p *= 2
    return p
