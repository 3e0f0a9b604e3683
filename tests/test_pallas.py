"""Pallas kernel parity tests (interpreter mode on CPU): the fused CFAR
kernel must match the jnp reference formulation cell-exactly."""

import jax.numpy as jnp
import numpy as np
import pytest

from radar_tpu.config.params import CfarParams, small_test_config
from radar_tpu.ops.cfar import goca_cfar_2d, pair_sum_maps
from radar_tpu.ops.pallas_kernels import goca_cfar_2d_pallas
from radar_tpu.waveform.precompute import precompute


@pytest.mark.parametrize("method", ["GOCA", "SOCA", "CA"])
def test_pallas_cfar_matches_jnp(method):
    rng = np.random.default_rng(0)
    num_beams, num_v, num_g = 4, 48, 256
    mag = rng.exponential(size=(num_beams, num_v, num_g)).astype(np.float32)
    for _ in range(8):
        b = rng.integers(0, num_beams)
        v = rng.integers(10, num_v - 10)
        g = rng.integers(20, num_g - 20)
        mag[b, v, g] += 60.0
    params = CfarParams(ref_cells_v=3, guard_cells_v=4, ref_cells_r=5,
                        guard_cells_r=10, method=method)

    mask_p, thr_p = goca_cfar_2d_pallas(jnp.asarray(mag), params,
                                        interpret=True)
    # jnp reference path: rdm -> pair_sum_maps -> goca_cfar_2d
    maps = np.moveaxis(mag, 0, 2)
    maps_pairs = maps[:, :, :-1] + maps[:, :, 1:]
    mask_j, thr_j = goca_cfar_2d(jnp.asarray(maps_pairs), params)

    np.testing.assert_array_equal(np.asarray(mask_p), np.asarray(mask_j))
    # thresholds only meaningful (and compared) inside the valid region
    br = params.ref_cells_r + params.guard_cells_r
    bv = params.ref_cells_v + params.guard_cells_v
    np.testing.assert_allclose(
        np.asarray(thr_p)[bv:-bv, br:-br],
        np.asarray(thr_j)[bv:-bv, br:-br], rtol=1e-6)
    assert np.asarray(mask_p).sum() >= 8


def test_pallas_cfar_in_pipeline_shape():
    """Kernel accepts the full-frame shape [13, 332, 3404]."""
    rng = np.random.default_rng(1)
    mag = rng.exponential(size=(5, 40, 512)).astype(np.float32)
    params = CfarParams(ref_cells_v=3, guard_cells_v=4)
    mask, thr = goca_cfar_2d_pallas(jnp.asarray(mag), params, interpret=True)
    assert mask.shape == (40, 512, 4)
    assert thr.shape == (40, 512, 4)


@pytest.mark.parametrize("method", ["GOCA", "CA"])
def test_pallas_cfar_qvg_matches_jnp(method):
    """Standalone qvg-maps CFAR kernel: mask bit-identical to the jnp
    formulation, padded gate columns always False, row counts exact."""
    from radar_tpu.ops.pallas_kernels import (goca_cfar_qvg_pallas,
                                              pad_maps_qvg)

    rng = np.random.default_rng(2)
    num_q, num_v, num_g = 3, 48, 700  # 700: not a GATE_TILE multiple
    maps = rng.exponential(size=(num_q, num_v, num_g)).astype(np.float32)
    for _ in range(10):
        q = rng.integers(0, num_q)
        v = rng.integers(8, num_v - 8)
        g = rng.integers(16, num_g - 16)
        maps[q, v, g] += 60.0
    params = CfarParams(ref_cells_v=3, guard_cells_v=4, ref_cells_r=5,
                        guard_cells_r=10, method=method)

    mask, rc = goca_cfar_qvg_pallas(pad_maps_qvg(jnp.asarray(maps)),
                                    params, num_g, num_v, interpret=True)
    mask_j, _ = goca_cfar_2d(jnp.asarray(maps), params, layout="qvg")
    mask = np.asarray(mask)
    np.testing.assert_array_equal(mask[:, :, :num_g], np.asarray(mask_j))
    assert mask[:, :, num_g:].sum() == 0
    np.testing.assert_array_equal(np.asarray(rc), mask.sum(axis=1))
    assert mask.sum() >= 10


def test_pallas_pc_matches_matmul_plan():
    """Banded-conv Pallas PC (studies/pallas_pc.py, interpret mode): exact match
    with the XLA banded-Toeplitz plan on the same compact white noise."""
    from radar_tpu.studies.pallas_pc import (make_pallas_pc_plan,
                                         pulse_compress_noise_pallas)
    from radar_tpu.ops.pulse_compression import (compact_noise_plan,
                                                 make_matmul_plan,
                                                 pulse_compress_matmul)

    cfg = small_test_config(channels=8, pulses=8)
    pre = precompute(cfg)
    nplan, nlen = compact_noise_plan(make_matmul_plan(pre))
    pplan = make_pallas_pc_plan(pre)
    assert pplan.s_compact == nlen
    rng = np.random.default_rng(0)
    z = (rng.normal(size=(3, 8, nlen))
         + 1j * rng.normal(size=(3, 8, nlen))).astype(np.complex64)
    got = np.asarray(pulse_compress_noise_pallas(
        jnp.asarray(z), pplan, interpret=True, mul_dtype=jnp.float32))
    zt = jnp.asarray(np.transpose(z, (1, 2, 0)))
    want = np.transpose(np.asarray(pulse_compress_matmul(zt, nplan)),
                        (2, 0, 1))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=2e-4)
