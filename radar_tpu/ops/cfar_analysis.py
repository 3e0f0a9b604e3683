"""CFAR false-alarm-rate calibration: analytic Pfa expectations and
measured-exceedance counters for both CFAR families.

Closes the "CFAR Pd at fixed Pfa" half of the BASELINE metric (BASELINE.md;
the reference never measures its false-alarm rate — it fixes ``T_CFAR = 8``
at fun_process_single_frame.m:178-205 / main_plot_snr_vs_angle_error.m:53-55
and relies on the threshold being far in the tail).

Two kinds of evidence, produced by scripts/run_pfa.py into
results/pfa_calibration.json:

1. **Analytic validation** (:func:`analytic_pfa_exponential`): for iid
   unit-exponential (square-law) cells, every detector here is a
   mean-normalized CFAR whose noise statistic is a max/min/average of
   means of *disjoint* reference windows — so the window means are
   independent Gamma(n, 1/n) variates and

       Pfa(T) = E[exp(-T * C)] = T * Integral_0^inf exp(-T m) F_C(m) dm

   with F_C the exact order-statistic CDF (product of Gamma CDFs for max,
   survival product for min, merged Gamma for same-size averages). The
   classic closed forms (CA: (1+T/N)^-N; GO/SO: Gandhi & Kassam 1988) are
   special cases; the quadrature covers the reference's 2D cross GOCA
   (max of four window means) and the GO-of-two-means 1D family with no
   extra approximation. Measured counts from the actual JAX detectors fed
   exponential noise must sit on these curves — a correctness proof of the
   shift-add formulation at the *distribution* level, not just cell parity.

2. **Operating-point measurement**: pure-noise frames through the real
   pipeline (beam-correlated AWGN -> PC -> MTD -> pair-sum) give the
   amplitude-domain Pfa(T) curve for both families. At the reference
   operating point T=8 the amplitude-domain tail is so deep (threshold
   ~10 sigma on a Rayleigh-sum cell) that the measured rate is 0; the
   artifact records the rule-of-three 95% upper bound 3/N_cells instead.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from scipy import special

from ..config.params import Cfar1DParams, CfarParams
from .cfar import goca_noise_and_valid
from .cfar1d import _segment_noise_1d, zero_velocity_mask

# ---------------------------------------------------------------------------
# analytic expectations (iid unit-exponential cells, mean-normalized CFAR)
# ---------------------------------------------------------------------------


def _gamma_mean_cdf(m: np.ndarray, n: int) -> np.ndarray:
    """CDF of the mean of n iid unit-exponential cells = Gamma(n, 1/n)."""
    return special.gammainc(n, n * m)


def _combined_cdf(m: np.ndarray, windows, combine: str) -> np.ndarray:
    """CDF of combine(window means) on the grid ``m``.

    ``windows``: iterable of ints, cells per disjoint reference window.
    ``combine``: "GO" (max), "SO" (min), or "CA" (average; equal-size
    windows only — the average of equal-scale Gammas is itself Gamma).
    """
    windows = list(windows)
    if combine == "CA":
        if len(set(windows)) != 1:
            raise ValueError("CA merge needs equal-size windows")
        return _gamma_mean_cdf(m, sum(windows))
    cdfs = np.stack([_gamma_mean_cdf(m, n) for n in windows])
    if combine == "GO":
        return np.prod(cdfs, axis=0)
    if combine == "SO":
        return 1.0 - np.prod(1.0 - cdfs, axis=0)
    raise ValueError(f"unknown combine: {combine}")


def analytic_pfa_exponential(t_factor: float, windows, combine: str,
                             grid_points: int = 400_000) -> float:
    """Exact Pfa of ``x > T * combine(window means)`` for an iid
    unit-exponential cell under test and disjoint reference windows,
    by quadrature of  T * Integral exp(-T m) F_C(m) dm  (integration by
    parts of E[exp(-T C)]; the tail beyond the grid where F_C ~= 1
    contributes exp(-T m_max), added analytically)."""
    m_max = max(20.0, 200.0 / t_factor)
    m = np.linspace(0.0, m_max, grid_points)
    f = _combined_cdf(m, windows, combine)
    body = t_factor * np.trapezoid(np.exp(-t_factor * m) * f, m)
    return float(body + np.exp(-t_factor * m_max))


def analytic_pfa_goca2d(t_factor: float, params: CfarParams) -> float:
    """The sim-path 2D cross detector on iid exponential cells: noise =
    max over the four disjoint window means (lead/trail x range/Doppler)
    for method GOCA; CA per dim merges each dim's two windows first."""
    if params.method == "GOCA":
        win = [params.ref_cells_r, params.ref_cells_r,
               params.ref_cells_v, params.ref_cells_v]
        return analytic_pfa_exponential(t_factor, win, "GO")
    if params.method == "CA":
        win = [2 * params.ref_cells_r, 2 * params.ref_cells_v]
        return analytic_pfa_exponential(t_factor, win, "GO")
    raise ValueError(f"no analytic form wired for method {params.method}")


def analytic_pfa_ca_closed_form(t_factor: float, n_cells: int) -> float:
    """Textbook CA-CFAR closed form (mean-normalized): (1 + T/N)^-N.
    Used as an independent cross-check of the quadrature."""
    return float((1.0 + t_factor / n_cells) ** (-n_cells))


def analytic_pfa_go_closed_form(t_factor: float, n_half: int) -> float:
    """Gandhi & Kassam (1988) GO-CFAR closed form, mean-normalized with
    two n-cell half-windows:
      Pfa = 2(1+t)^-n - 2 sum_{k=0}^{n-1} C(n+k-1, k) (2+t)^-(n+k),
    with t = T/n (per-sum multiplier). Cross-checks the quadrature."""
    t = t_factor / n_half
    n = n_half
    s = sum(special.comb(n + k - 1, k, exact=True) * (2.0 + t) ** -(n + k)
            for k in range(n))
    return float(2.0 * (1.0 + t) ** -n - 2.0 * s)


# ---------------------------------------------------------------------------
# measured exceedance counters (jittable; count cells over a T grid)
# ---------------------------------------------------------------------------


def count_exceedances_2d(maps: jnp.ndarray, params: CfarParams,
                         t_factors) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-threshold-factor false-alarm counts of the sim-path 2D detector
    on (noise-only) pair-sum maps [V, G, pairs].

    Returns (counts [len(t_factors)] int32, n_valid scalar int32). The
    noise map is computed once; the T sweep is a broadcasted compare —
    exactly the operational ``maps > T*noise`` on border-valid cells
    (goca_cfar_2d uses strict >)."""
    noise, valid = goca_noise_and_valid(maps, params)
    valid = jnp.broadcast_to(valid, maps.shape)   # pair dim is broadcast-1
    ts = jnp.asarray(t_factors, maps.dtype)
    hits = (maps[None] > ts[:, None, None, None] * noise[None]) & valid[None]
    counts = jnp.sum(hits, axis=(1, 2, 3)).astype(jnp.int32)
    return counts, jnp.sum(valid).astype(jnp.int32)


def count_exceedances_1d_interior(x: jnp.ndarray, params: Cfar1DParams,
                                  t_factors) -> tuple[jnp.ndarray,
                                                      jnp.ndarray]:
    """Interior-cell (no edge fallback) counts of one 1D CFAR segment on
    noise-only data [V, G(, pairs)] — the cells the analytic form models.
    Uses the operational >= compare (Function_CFAR1D_sub, debug_v2:500)."""
    noise, interior = _segment_noise_1d(x, params.guard_cells,
                                        params.ref_cells, params.method,
                                        axis=1)
    ts = jnp.asarray(t_factors, x.dtype)
    nd = x.ndim
    exp = (slice(None),) + (None,) * nd
    hits = (x[None] >= ts[exp] * noise[None]) & interior[None]
    counts = jnp.sum(hits, axis=tuple(range(1, nd + 1))).astype(jnp.int32)
    return counts, jnp.sum(interior).astype(jnp.int32)


def count_exceedances_realdata(maps: jnp.ndarray, params: Cfar1DParams,
                               gate_splits, delta_v_bin: float,
                               t_factors) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Operational real-data-path counts: per-segment 1D CFAR with edge
    fallback, zero-velocity clutter band excluded — the exact
    segmented_cfar_1d semantics swept over threshold factors."""
    num_v = maps.shape[0]
    n0v = int(params.mtd_zero_vel_ms / delta_v_bin)
    vmask = zero_velocity_mask(num_v, n0v)
    vshape = [1] * maps.ndim
    vshape[0] = num_v
    vmask_b = vmask.reshape(vshape)
    ts = jnp.asarray(t_factors, maps.dtype)
    exp = (slice(None),) + (None,) * maps.ndim
    # tested-cell count is static (mask geometry only): allowed Doppler
    # rows x all gates x trailing dims — host-numpy twin of the mask
    idx = np.arange(num_v)
    center = round(num_v / 2)
    allowed = ~((idx >= center - n0v) & (idx <= center + n0v))
    n_tested = int(allowed.sum()) * int(np.prod(maps.shape[1:]))

    counts = jnp.zeros((ts.shape[0],), jnp.int32)
    start = 0
    for width in gate_splits:
        seg = jnp.take(maps, jnp.arange(start, start + width), axis=1)
        noise, _ = _segment_noise_1d(seg, params.guard_cells,
                                     params.ref_cells, params.method,
                                     axis=1)
        hits = (seg[None] >= ts[exp] * noise[None]) & vmask_b[None]
        counts = counts + jnp.sum(
            hits, axis=tuple(range(1, maps.ndim + 1))).astype(jnp.int32)
        start += width
    return counts, jnp.asarray(n_tested, jnp.int32)
