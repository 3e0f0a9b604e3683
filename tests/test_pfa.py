"""CFAR false-alarm-rate calibration tests (the Pfa half of the BASELINE
"CFAR Pd at fixed Pfa" metric; ops/cfar_analysis.py, scripts/run_pfa.py).

The reference fixes T_CFAR=8 with no false-alarm measurement
(fun_process_single_frame.m:178); here the detectors are validated at the
distribution level: fed iid unit-exponential cells, the measured exceedance
rate of the actual JAX detectors must sit on the exact analytic Pfa curve
(Gamma order-statistic quadrature, cross-checked against the textbook CA
closed form and the Gandhi & Kassam GO-CFAR closed form), and the T=8
amplitude-domain operating point of the real pipeline must produce zero
false alarms.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from radar_tpu.config.params import Cfar1DParams, CfarParams, \
    small_test_config
from radar_tpu.ops.cfar_analysis import (analytic_pfa_ca_closed_form,
                                         analytic_pfa_exponential,
                                         analytic_pfa_go_closed_form,
                                         analytic_pfa_goca2d,
                                         count_exceedances_1d_interior,
                                         count_exceedances_2d,
                                         count_exceedances_realdata)


def test_quadrature_matches_closed_forms():
    """The generic Gamma quadrature reproduces the textbook CA closed form
    and the Gandhi & Kassam (1988) GO closed form to <0.1%."""
    for t in (2.0, 4.0, 8.0, 12.0):
        for n in (5, 16):
            ca = analytic_pfa_exponential(t, [n, n], "CA")
            assert abs(ca / analytic_pfa_ca_closed_form(t, 2 * n) - 1) < 1e-3
            go = analytic_pfa_exponential(t, [n, n], "GO")
            assert abs(go / analytic_pfa_go_closed_form(t, n) - 1) < 1e-3


def test_go_between_so_and_ca_ordering():
    """Sanity: for the same windows, Pfa_SO > Pfa_CA > Pfa_GO (a greater-of
    estimate is the most conservative)."""
    for t in (4.0, 8.0):
        go = analytic_pfa_exponential(t, [8, 8], "GO")
        ca = analytic_pfa_exponential(t, [8, 8], "CA")
        so = analytic_pfa_exponential(t, [8, 8], "SO")
        assert so > ca > go > 0


def _poisson_band(expected, k_sigma=4.0):
    """(lo, hi) acceptance band on a Poisson count with mean ``expected``."""
    sd = np.sqrt(expected)
    return expected - k_sigma * sd, expected + k_sigma * sd


def test_goca2d_measured_matches_analytic():
    """The shipped 2D cross-GOCA detector on iid exponential cells has the
    analytic false-alarm rate (max of four independent window means)."""
    p = CfarParams()  # ref 5 / guard 10, GOCA, T applied per sweep
    rng = np.random.default_rng(0)
    ts = [4.0, 6.0, 8.0]
    f = jax.jit(lambda m: count_exceedances_2d(m, p, ts))
    tot = np.zeros(len(ts), np.int64)
    nv = 0
    for _ in range(4):
        x = rng.exponential(size=(200, 600, 3)).astype(np.float32)
        c, n = f(jnp.asarray(x))
        tot += np.asarray(c)
        nv += int(n)
    for t, hits in zip(ts, tot):
        lo, hi = _poisson_band(analytic_pfa_goca2d(t, p) * nv)
        assert lo <= hits <= hi, (t, hits, lo, hi)


def test_cfar1d_measured_matches_analytic():
    """The real-data 1D GO CFAR (interior cells) on iid exponential cells
    matches Gandhi & Kassam."""
    p = Cfar1DParams()  # GO, ref 16, guard 4
    rng = np.random.default_rng(1)
    ts = [4.0, 6.0, 8.0]
    f = jax.jit(lambda m: count_exceedances_1d_interior(m, p, ts))
    tot = np.zeros(len(ts), np.int64)
    nv = 0
    for _ in range(4):
        x = rng.exponential(size=(300, 1200)).astype(np.float32)
        c, n = f(jnp.asarray(x))
        tot += np.asarray(c)
        nv += int(n)
    for t, hits in zip(ts, tot):
        lo, hi = _poisson_band(analytic_pfa_go_closed_form(t, p.ref_cells)
                               * nv)
        assert lo <= hits <= hi, (t, hits, lo, hi)


@pytest.mark.slow
def test_t8_operating_point_zero_false_alarms():
    """Pure-noise frames through the real small-config pipeline: the T=8
    amplitude-domain operating point produces ZERO false alarms on either
    CFAR family (the threshold sits ~10 sigma deep on a Rayleigh-sum
    cell), while low thresholds do fire (the counter counts)."""
    from radar_tpu.ops.cfar import pair_sum_maps
    from radar_tpu.ops.dbf import dbf
    from radar_tpu.ops.mtd import make_mtd_matrix, mtd_matmul
    from radar_tpu.ops.pulse_compression import (make_matmul_plan,
                                                 pulse_compress_matmul)
    from radar_tpu.pipeline.stages import _delta_v_bin
    from radar_tpu.waveform.precompute import precompute

    cfg = small_test_config()
    pre = precompute(cfg)
    sig = cfg.sig
    mplan = make_matmul_plan(pre)
    mtd_mat = make_mtd_matrix(pre.mtd_win, sig.prt_num, cfg.mtd_fft_len)
    dbf_w = np.asarray(pre.dbf_w)
    ts = [1.25, 8.0]

    def one(key):
        g = jax.random.normal(key, (sig.prt_num, sig.point_prt,
                                    sig.channel_num, 2), jnp.float32)
        noise = jax.lax.complex(g[..., 0], g[..., 1])
        rdm = mtd_matmul(pulse_compress_matmul(
            dbf(noise, dbf_w, cfg.dbf_variant), mplan), mtd_mat)
        maps = pair_sum_maps(rdm)
        c2, n2 = count_exceedances_2d(maps, cfg.cfar, ts)
        cr, nr = count_exceedances_realdata(
            maps, cfg.cfar1d, sig.point_prt_segments, _delta_v_bin(sig), ts)
        return c2, n2, cr, nr

    @jax.jit
    def run(keys):
        c2, n2, cr, nr = jax.lax.map(one, keys)
        return jnp.sum(c2, 0), jnp.sum(n2), jnp.sum(cr, 0), jnp.sum(nr)

    keys = jax.vmap(jax.random.fold_in, (None, 0))(jax.random.PRNGKey(3),
                                                   jnp.arange(4))
    c2, n2, cr, nr = jax.tree.map(np.asarray, run(keys))
    assert int(n2) > 900_000 and int(nr) > 900_000
    # T=1.25 fires plentifully (counter sanity)...
    assert c2[0] > 1000 and cr[0] > 1000
    # ...T=8 never does
    assert int(c2[1]) == 0, f"sim-path false alarms at T=8: {int(c2[1])}"
    assert int(cr[1]) == 0, f"realdata false alarms at T=8: {int(cr[1])}"
