"""Fused noise-RDM Pallas kernel (ops/pallas_rdm.py): bit-level equivalence
with the XLA chain and the pad-garbage invariance that the direct-generation
perf path (pipeline/lowrank.py) relies on.

All runs use interpret mode (conftest forces CPU) with f32 multiplies so the
comparisons are exact."""

from __future__ import annotations

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from radar_tpu.config.params import small_test_config
from radar_tpu.ops.dbf import dbf_weights_effective_np
from radar_tpu.ops.mtd import make_mtd_matrix, mtd_matmul
from radar_tpu.ops.pallas_rdm import (make_rdm_plan, noise_rdm_pallas,
                                      noise_rdm_pallas_planes,
                                      segment_buffer_len)
from radar_tpu.ops.pulse_compression import make_matmul_plan, \
    pulse_compress_matmul
from radar_tpu.sim.echo import beam_noise_factor
from radar_tpu.waveform.precompute import precompute


def _setup():
    cfg = small_test_config()
    pre = precompute(cfg)
    mtd_mat = make_mtd_matrix(pre.mtd_win, cfg.sig.prt_num, cfg.mtd_fft_len)
    plan = make_rdm_plan(pre, mtd_mat, cfg.sig.prt_num, tile=128)
    w_eff = dbf_weights_effective_np(np.asarray(pre.dbf_w), cfg.dbf_variant)
    l_np = beam_noise_factor(w_eff)
    return cfg, pre, mtd_mat, plan, l_np


def test_kernel_matches_numpy_oracle():
    """Compact-z entry point vs a plain numpy evaluation of the plan's own
    per-segment banded-PC matrices + MTD DFT planes + Cholesky mix (no
    Pallas plumbing): catches DMA-window indexing, accumulation and
    transpose bugs in the kernel."""
    cfg, pre, mtd_mat, plan, l_np = _setup()
    num_b = l_np.shape[0]
    num_p = cfg.sig.prt_num
    rng = np.random.default_rng(7)
    z = (rng.normal(size=(num_b, num_p, plan.s_compact))
         + 1j * rng.normal(size=(num_b, num_p, plan.s_compact))
         ).astype(np.complex64) * np.float32(np.sqrt(0.5))

    got = np.asarray(noise_rdm_pallas(jnp.asarray(z), plan, l_np,
                                      interpret=True,
                                      mul_dtype=jnp.float32))

    d = (plan.dr + 1j * plan.di).astype(np.complex64)   # [V_pad, P_pad]
    pieces = []
    for seg in plan.segments:
        m = (seg.mpr + 1j * seg.mpi).astype(np.complex64)  # [W, T]
        x = np.zeros((num_b, plan.p_pad, segment_buffer_len(seg)),
                     np.complex64)
        x[:, :num_p, seg.pad_front:seg.pad_front + seg.r_len] = \
            z[:, :, seg.c0:seg.c0 + seg.r_len]
        ntiles = -(-seg.j_len // seg.tile)
        out = np.zeros((num_b, plan.v_pad, ntiles * seg.tile), np.complex64)
        for t in range(ntiles):
            xw = x[:, :, t * seg.tile:t * seg.tile + seg.window]
            out[:, :, t * seg.tile:(t + 1) * seg.tile] = np.einsum(
                "vp,bpt->bvt", d, xw @ m)
        pieces.append(out[:, :plan.n_dop, :seg.j_len])
    bm = np.concatenate(pieces, axis=2)                  # [B, V, G]
    want = np.einsum("cb,bvg->vgc", l_np.astype(np.complex64), bm)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_pad_garbage_is_invisible():
    """The direct-generation path leaves garbage draws in the tail pads and
    the pulse-pad rows. Those regions only reach gates / Doppler rows that
    are sliced away: filling them with large garbage must not change a
    single output bit."""
    cfg, pre, mtd_mat, plan, l_np = _setup()
    num_b = l_np.shape[0]
    num_p = cfg.sig.prt_num
    rng = np.random.default_rng(3)

    def planes(garbage: bool):
        xrs, xis = [], []
        for i, seg in enumerate(plan.segments):
            n = segment_buffer_len(seg)
            r = np.random.default_rng(100 + i)
            xr = r.normal(size=(num_b, plan.p_pad, n)).astype(np.float32)
            xi = r.normal(size=(num_b, plan.p_pad, n)).astype(np.float32)
            for x in (xr, xi):
                x[:, :, :seg.pad_front] = 0.0       # causal history: zero
                if garbage:
                    g = np.random.default_rng(500 + i)
                    if seg.pad_tail:
                        x[:, :, seg.pad_front + seg.r_len:] = 1e3 * g.normal(
                            size=(num_b, plan.p_pad, seg.pad_tail))
                    x[:, num_p:, :] = 1e3 * g.normal(
                        size=(num_b, plan.p_pad - num_p, n))
                else:
                    x[:, :, seg.pad_front + seg.r_len:] = 0.0
                    x[:, num_p:, :] = 0.0
            xrs.append(jnp.asarray(xr))
            xis.append(jnp.asarray(xi))
        return xrs, xis

    clean = np.asarray(noise_rdm_pallas_planes(
        *planes(False), plan, l_np, interpret=True, mul_dtype=jnp.float32))
    dirty = np.asarray(noise_rdm_pallas_planes(
        *planes(True), plan, l_np, interpret=True, mul_dtype=jnp.float32))
    np.testing.assert_array_equal(clean, dirty)


@pytest.mark.slow
def test_uniform_noise_dist_moments_and_gaussianity():
    """noise_dist='uniform' feeds unit-variance uniform rails into the
    fused kernel. The RDM second moments depend only on the input
    covariance (identical for both dists), and the >=10k-term linear
    contraction makes each RDM cell Gaussian by CLT: pooled total power
    must match the normal path within MC error, and the pooled kurtosis of
    the RDM real parts must match the normal path's (the pooled value
    itself exceeds 3 for BOTH dists because cells have heterogeneous
    variances — beam mix rows, per-segment filter energy — and a Gaussian
    variance mixture is leptokurtic; what CLT promises is that uniform
    input reproduces the normal path's value)."""
    from radar_tpu.ops.mtd import make_mtd_matrix as _mk
    from radar_tpu.pipeline.lowrank import make_lowrank_stages
    from radar_tpu.ops.pulse_compression import make_matmul_plan

    cfg0 = small_test_config().replace(fused_synth_dbf=True,
                                       lowrank_rdm=True,
                                       noise_rdm_impl="pallas")
    pre = precompute(cfg0)
    mplan = make_matmul_plan(pre)
    mtd_mat = make_mtd_matrix(pre.mtd_win, cfg0.sig.prt_num,
                              cfg0.mtd_fft_len)

    def power_and_kurt(dist, n_keys=6):
        cfg = cfg0.replace(noise_dist=dist)
        st = make_lowrank_stages(cfg, pre, None, mplan, mtd_mat,
                                 pre.mtd_win, jnp.complex64)
        pw, k4 = [], []
        for i in range(n_keys):
            rdm = np.asarray(st.noise_rdm(jax.random.PRNGKey(i),
                                          interpret=True))
            pw.append(np.mean(np.abs(rdm) ** 2))
            x = rdm.real.ravel()
            k4.append(np.mean(x ** 4) / np.mean(x ** 2) ** 2)
        return np.mean(pw), np.mean(k4)

    p_n, k_n = power_and_kurt("normal")
    p_u, k_u = power_and_kurt("uniform")
    assert abs(p_u / p_n - 1.0) < 0.05
    assert abs(k_u - k_n) < 0.1


def test_direct_generation_pipeline_detects_truth():
    """End-to-end perf path with direct plane generation (the shipped
    pallas-config behavior)."""
    from radar_tpu.pipeline.frame import make_frame_processor
    from radar_tpu.sim.scenario import TargetBatch

    cfg = small_test_config().replace(fused_synth_dbf=True, lowrank_rdm=True,
                                      noise_rdm_impl="pallas")
    process = make_frame_processor(cfg, dtype=jnp.complex64)
    tb = TargetBatch.make([3000.0], [15.0], [10.0], [20.0])
    res = process(jax.random.PRNGKey(0), tb)
    n = int(res.num_final)
    assert n >= 1
    pre = precompute(cfg)
    r = np.asarray(res.targets.range_m)[:n]
    assert np.min(np.abs(r - 3000.0)) < 2 * pre.delta_r


@pytest.mark.slow
def test_beams_major_tail_matches_reference_layout():
    """cfg.beams_major_tail keeps the RDM in the kernel's [B,V,G] layout and
    the maps/mask in [pairs,G,V]; detections and refined parameters must be
    IDENTICAL to the default [V,G,B] tail (same draws, same arithmetic, and
    the qgv ravel reproduces the (pair,range,velocity)-major scan order)."""
    from radar_tpu.pipeline.frame import make_frame_processor
    from radar_tpu.sim.scenario import TargetBatch

    base = small_test_config().replace(fused_synth_dbf=True,
                                       lowrank_rdm=True,
                                       noise_rdm_impl="pallas")
    tb = TargetBatch.make([3000.0, 6000.0], [15.0, -8.0], [10.0, 12.0],
                          [20.0, 14.0])
    key = jax.random.PRNGKey(7)
    ref = make_frame_processor(base)(key, tb)
    bm = make_frame_processor(base.replace(beams_major_tail=True))(key, tb)
    assert int(bm.num_raw_detections) == int(ref.num_raw_detections)
    assert int(bm.num_final) == int(ref.num_final)
    n = int(ref.num_final)
    assert n >= 1
    for field in ("range_m", "velocity_ms", "angle_deg", "power"):
        a = np.asarray(getattr(ref.targets, field))[:n]
        b = np.asarray(getattr(bm.targets, field))[:n]
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-4)


def test_gen_kernel_matches_dma_kernel_on_exported_planes():
    """In-kernel-PRNG variant (noise_rdm_pallas_gen) vs the DMA-plane
    kernel fed the EXPORTED generator planes (gen_noise_planes_pallas):
    same seeding, same absolute-chunk addressing, same dot order =>
    bit-identical outputs — this is the proof that overlapping tile
    windows regenerate identical samples (banded-convolution semantics)
    and that pad_front zeroing matches. Runs under the TPU-semantics
    interpreter here; the same check passes on real hardware
    (scripts/validate_rdm_gen.py -> results/rdm_gen.json)."""
    from radar_tpu.ops.pallas_rdm import (gen_noise_planes_pallas,
                                          noise_rdm_pallas_gen)

    cfg, pre, mtd_mat, _, l_np = _setup()
    plan = make_rdm_plan(pre, mtd_mat, cfg.sig.prt_num, tile=128, lane=128)
    seed = jnp.asarray([3, 5], jnp.int32)
    a = float(np.sqrt(1.5))
    y = noise_rdm_pallas_gen(seed, plan, l_np, a, interpret=True,
                             mul_dtype=jnp.float32, out_dtype=jnp.float32)
    xrs, xis = gen_noise_planes_pallas(seed, plan, l_np.shape[0], a,
                                       interpret=True,
                                       mul_dtype=jnp.float32)
    y2 = noise_rdm_pallas_planes(xrs, xis, plan, l_np, interpret=True,
                                 mul_dtype=jnp.float32,
                                 out_dtype=jnp.float32)
    assert float(jnp.max(jnp.abs(y))) > 0.0
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))


@pytest.mark.slow
def test_gen_pipeline_detects_truth():
    """noise_rdm_impl='pallas_prng' wires through the frame processor and
    still finds the truth target (interpreter PRNG on CPU)."""
    from radar_tpu.pipeline.frame import make_frame_processor
    from radar_tpu.sim.scenario import TargetBatch

    cfg = small_test_config().replace(fused_synth_dbf=True,
                                      lowrank_rdm=True,
                                      noise_dist="uniform",
                                      noise_rdm_impl="pallas_prng")
    process = make_frame_processor(cfg, dtype=jnp.complex64)
    tb = TargetBatch.make([3000.0], [15.0], [10.0], [20.0])
    res = process(jax.random.PRNGKey(0), tb)
    n = int(res.num_final)
    assert n >= 1
    pre = precompute(cfg)
    r = np.asarray(res.targets.range_m)[:n]
    assert np.min(np.abs(r - 3000.0)) < 2 * pre.delta_r


def test_gen_requires_uniform_rails():
    """The in-kernel generator implements only the validated uniform
    rails; normal rails must be rejected at build time."""
    import pytest

    from radar_tpu.pipeline.frame import make_frame_processor

    cfg = small_test_config().replace(fused_synth_dbf=True,
                                      lowrank_rdm=True,
                                      noise_rdm_impl="pallas_prng")
    with pytest.raises(ValueError):
        make_frame_processor(cfg)


@pytest.mark.slow
def test_gen_rolling_matches_per_step_generator():
    """Rolling-chunk all-beams kernel vs the per-step generator: SAME
    chunk-keyed draws, PC dot decomposed into per-chunk partial dots —
    f32-reassociation-level equivalence in f32-multiply interpret mode
    (on hardware the pcr->bf16 cast makes it bf16-rounding-level instead;
    results/rdm_gen.json)."""
    from radar_tpu.ops.pallas_rdm import noise_rdm_pallas_gen

    cfg, pre, mtd_mat, _, l_np = _setup()
    plan = make_rdm_plan(pre, mtd_mat, cfg.sig.prt_num, tile=128, lane=128)
    seed = jnp.asarray([3, 5], jnp.int32)
    a = float(np.sqrt(1.5))
    kw = dict(interpret=True, mul_dtype=jnp.float32, out_dtype=jnp.float32)
    y1 = noise_rdm_pallas_gen(seed, plan, l_np, a, **kw)
    y2 = noise_rdm_pallas_gen(seed, plan, l_np, a, rolling=True, **kw)
    scale = float(jnp.max(jnp.abs(y1)))
    assert scale > 0.0
    np.testing.assert_allclose(np.asarray(y2.real), np.asarray(y1.real),
                               atol=1e-5 * scale)
    np.testing.assert_allclose(np.asarray(y2.imag), np.asarray(y1.imag),
                               atol=1e-5 * scale)


@pytest.mark.slow
def test_signal_fusion_matches_explicit_sig_plus_noise():
    """The rank-K signal fused into the rolling kernel's mix tail
    (lr.noise_rdm_sig) must reproduce signal_rdm + noise_rdm with the
    SAME key to f32-reassociation level, in both layouts."""
    from radar_tpu.ops.mtd import make_mtd_matrix
    from radar_tpu.ops.pulse_compression import make_matmul_plan
    from radar_tpu.pipeline.lowrank import make_lowrank_stages
    from radar_tpu.sim.scenario import TargetBatch

    cfg = small_test_config().replace(fused_synth_dbf=True,
                                      lowrank_rdm=True,
                                      noise_dist="uniform",
                                      noise_rdm_impl="pallas_prng")
    pre = precompute(cfg)
    mtd_mat = make_mtd_matrix(pre.mtd_win, cfg.sig.prt_num,
                              cfg.mtd_fft_len)
    lr = make_lowrank_stages(cfg, pre, None, make_matmul_plan(pre),
                             mtd_mat, pre.mtd_win, jnp.complex64)
    tb = TargetBatch(*[jnp.asarray(x, jnp.float32) for x in
                       TargetBatch.make([3000.0, 6000.0], [15.0, -8.0],
                                        [10.0, 12.0], [20.0, 14.0])])
    key = jax.random.PRNGKey(0)
    ref = lr.signal_rdm(tb) + lr.noise_rdm(key, interpret=True)
    scale = float(jnp.max(jnp.abs(ref)))
    for layout in ("vgb", "bvg"):
        fused = lr.noise_rdm_sig(key, tb, interpret=True, layout=layout)
        if layout == "bvg":
            fused = jnp.transpose(fused, (1, 2, 0))
        d = float(jnp.max(jnp.abs(fused - ref)))
        assert d < 1e-6 * scale, (layout, d, scale)


def test_kernel_out_bf16_is_f32_quantized():
    """cfg.kernel_out_bf16 (bf16 output planes for the signal-fused
    kernel) must reproduce the f32-plane RDM to bf16 quantization level
    (2^-8 relative on each output plane) — the only difference is the
    final cast, honored in interpret mode too so this runs on CPU."""
    from radar_tpu.ops.mtd import make_mtd_matrix
    from radar_tpu.ops.pulse_compression import make_matmul_plan
    from radar_tpu.pipeline.lowrank import make_lowrank_stages
    from radar_tpu.sim.scenario import TargetBatch

    base = small_test_config().replace(fused_synth_dbf=True,
                                       lowrank_rdm=True,
                                       noise_dist="uniform",
                                       noise_rdm_impl="pallas_prng")
    pre = precompute(base)
    mtd_mat = make_mtd_matrix(pre.mtd_win, base.sig.prt_num,
                              base.mtd_fft_len)
    tb = TargetBatch(*[jnp.asarray(x, jnp.float32) for x in
                       TargetBatch.make([3000.0], [15.0], [10.0], [20.0])])
    key = jax.random.PRNGKey(1)
    rdms = {}
    for flag in (False, True):
        cfg = base.replace(kernel_out_bf16=flag)
        lr = make_lowrank_stages(cfg, pre, None, make_matmul_plan(pre),
                                 mtd_mat, pre.mtd_win, jnp.complex64)
        rdms[flag] = lr.noise_rdm_sig(key, tb, interpret=True)
    scale = float(jnp.max(jnp.abs(rdms[False])))
    d = float(jnp.max(jnp.abs(rdms[True] - rdms[False])))
    assert d > 0.0                      # the cast actually happened
    assert d < 2.0 ** -8 * scale, (d, scale)


@pytest.mark.slow
def test_kernel_maps_tail_matches_default():
    """cfg.kernel_maps (kernel-emitted sum maps + qvg detection tail) must
    reproduce the default pair_sum_maps tail: same detections, parameters
    to ULP-level map differences (sqrt(re^2+im^2) vs abs)."""
    from radar_tpu.pipeline.frame import make_frame_processor
    from radar_tpu.sim.scenario import TargetBatch

    base = small_test_config().replace(fused_synth_dbf=True,
                                       lowrank_rdm=True,
                                       noise_dist="uniform",
                                       noise_rdm_impl="pallas_prng")
    tb = TargetBatch(*[jnp.asarray(x, jnp.float32) for x in
                       TargetBatch.make([3000.0, 6000.0], [15.0, -8.0],
                                        [10.0, 12.0], [20.0, 14.0])])
    key = jax.random.PRNGKey(0)
    r0 = make_frame_processor(base)(key, tb)
    r1 = make_frame_processor(base.replace(kernel_maps=True))(key, tb)
    assert int(r1.num_raw_detections) == int(r0.num_raw_detections)
    assert int(r1.num_final) == int(r0.num_final)
    n = int(r0.num_final)
    assert n >= 1
    for f in ("range_m", "velocity_ms", "angle_deg", "power"):
        a = np.asarray(getattr(r0.targets, f))[:n]
        b = np.asarray(getattr(r1.targets, f))[:n]
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-3)
