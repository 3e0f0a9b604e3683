"""Single-frame processing pipeline (the reference's
``fun_process_single_frame``, SURVEY.md section 3.2), end-to-end under one
jit:

  echo synthesis -> AWGN -> DBF -> segmented pulse compression -> MTD ->
  2D GOCA-CFAR -> spline/monopulse parameter estimation -> intra-beam
  clustering -> inter-beam clustering

``make_frame_processor`` closes over all derived constants (waveform, matched
filters, DBF bank, axes, spline stencils) so the compiled program embeds them
as XLA constants; the only runtime inputs are the PRNG key and the per-frame
target state arrays — the host/device boundary sits exactly between scenario
evolution (host, sim/scenario.py) and this function (device), per SURVEY.md
section 3.1.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..cluster.stages import ClusteredTargets, cluster_stage1, cluster_stage2
from ..config.params import RadarConfig
from ..measure.estimate import ParamDetections, estimate_parameters
from ..ops.cfar import (Detections, extract_detections, goca_cfar_2d,
                        pair_sum_maps, pair_sum_maps_bm)
from ..ops.dbf import dbf
from ..ops.mtd import make_mtd_matrix, mtd, mtd_matmul
from ..ops.pulse_compression import (make_matmul_plan, make_plan,
                                     pulse_compress, pulse_compress_matmul)
from ..sim.echo import (add_noise, add_noise_beamspace, beam_noise_factor,
                        synthesize_echo_beams, synthesize_echoes)
from ..sim.scenario import TargetBatch
from ..waveform.precompute import Precomputed, precompute


class MeasureConsts(NamedTuple):
    """Device-side constants consumed by measure/estimate.py."""

    range_axis: jnp.ndarray
    velocity_axis: jnp.ndarray
    delta_r: float
    delta_v: float
    beam_angles_deg: jnp.ndarray
    k_slopes_lut: jnp.ndarray
    q_range: jnp.ndarray
    q_vel: jnp.ndarray


class FrameResult(NamedTuple):
    """Final per-frame output (ref ``final_targets``) plus diagnostics."""

    targets: ClusteredTargets
    num_raw_detections: jnp.ndarray   # int32 (true count, may exceed capacity)
    num_final: jnp.ndarray            # int32


class FrameIntermediates(NamedTuple):
    """Optional stage taps for debug harnesses / golden tests (the formalized
    version of debug_simulated_data_processing.m's stage checklist)."""

    raw_iq: jnp.ndarray
    beams: jnp.ndarray
    pc: jnp.ndarray
    rdm: jnp.ndarray
    pair_maps: jnp.ndarray
    detections: Detections
    params: ParamDetections
    stage1: ClusteredTargets
    result: FrameResult


def measure_consts(cfg: RadarConfig, precomp: Precomputed,
                   real_dtype) -> MeasureConsts:
    n_dop = cfg.mtd_fft_len or cfg.sig.prt_num
    if n_dop == cfg.sig.prt_num:
        vel_axis = precomp.velocity_axis
        delta_v = precomp.delta_v
    else:
        # zero-padded MTD variant (v7_7:150): axis respans the same ambiguity
        # window over n_dop bins
        v_max = cfg.sig.v_max
        vel_axis = np.linspace(-v_max / 2, v_max / 2, n_dop)
        delta_v = v_max / n_dop
    return MeasureConsts(
        range_axis=np.asarray(precomp.range_axis, real_dtype),
        velocity_axis=np.asarray(vel_axis, real_dtype),
        delta_r=float(precomp.delta_r),
        delta_v=float(delta_v),
        beam_angles_deg=np.asarray(precomp.beam_angles_deg, real_dtype),
        k_slopes_lut=np.asarray(precomp.k_slopes_lut, real_dtype),
        q_range=np.asarray(precomp.q_range, real_dtype),
        q_vel=np.asarray(precomp.q_vel, real_dtype),
    )


def make_frame_processor(cfg: RadarConfig, precomp: Precomputed | None = None,
                         dtype=jnp.complex64, return_intermediates=False,
                         jit: bool = True):
    """Build the jitted frame processor.

    Returns ``process(key, targets: TargetBatch) -> FrameResult`` (or
    ``FrameIntermediates`` when ``return_intermediates``)."""
    if precomp is None:
        precomp = precompute(cfg)
    plan = make_plan(precomp)
    mplan = make_matmul_plan(precomp) if cfg.pc_method == "matmul" else None
    real_dtype = jnp.finfo(dtype).dtype
    # host numpy constants: embedded at trace time (a device-
    # resident closure constant would need a device->host readback
    # during lowering, which tunnel TPU backends may not support)
    dbf_w = np.asarray(precomp.dbf_w)
    mtd_win = np.asarray(precomp.mtd_win, real_dtype)
    mtd_mat = (make_mtd_matrix(precomp.mtd_win, cfg.sig.prt_num,
                               cfg.mtd_fft_len)
               if cfg.mtd_method == "matmul" else None)
    mc = measure_consts(cfg, precomp, real_dtype)
    ip = cfg.interp
    fused = cfg.fused_synth_dbf and not return_intermediates
    if fused:
        from ..ops.dbf import dbf_weights_effective_np

        w_eff = dbf_weights_effective_np(dbf_w, cfg.dbf_variant)
        mix_np = np.ascontiguousarray(w_eff.T)        # [C,B]
        l_np = beam_noise_factor(w_eff)               # [B,B]

    lowrank = cfg.lowrank_rdm and fused
    if lowrank:
        from .lowrank import make_lowrank_stages

        lr = make_lowrank_stages(cfg, precomp, plan, mplan, mtd_mat,
                                 mtd_win, dtype)

    bm_tail = (cfg.beams_major_tail and lowrank
               and cfg.noise_rdm_impl in ("pallas", "pallas_prng"))

    km = (cfg.kernel_maps and lowrank
          and cfg.noise_rdm_impl == "pallas_prng")

    # flag-precedence guard: the kernel-tail branches (kernel_maps,
    # beams_major_tail) run their own CFAR/extraction layouts and would
    # silently ignore the alternative CFAR/extraction implementations
    if km or bm_tail:
        import warnings

        branch = "kernel_maps" if km else "beams_major_tail"
        for flag in ("use_pallas_cfar", "extract_native_scan"):
            if getattr(cfg, flag):
                warnings.warn(
                    f"cfg.{flag} is ignored when cfg.{branch} is active: "
                    f"the {branch} tail uses its own CFAR/extraction "
                    "layout", stacklevel=2)
        if km and cfg.beams_major_tail:
            warnings.warn(
                "cfg.kernel_maps takes precedence over "
                "cfg.beams_major_tail (both set)", stacklevel=2)
    elif cfg.use_pallas_cfar:
        import warnings

        if cfg.tail_from_rdm:
            warnings.warn(
                "cfg.use_pallas_cfar takes precedence over cfg.tail_from_rdm "
                "(both set): the Pallas-CFAR tail always materializes the qvg "
                "pair-sum maps", stacklevel=2)
        if cfg.extract_native_scan:
            warnings.warn(
                "cfg.extract_native_scan is ignored when cfg.use_pallas_cfar "
                "is set: the qvg tail has no native-scan extraction",
                stacklevel=2)
    elif cfg.tail_from_rdm and (cfg.extract_impl != "direct"
                                or cfg.extract_native_scan):
        import warnings

        warnings.warn(
            "cfg.tail_from_rdm is ignored unless extract_impl='direct' and "
            "extract_native_scan=False: falling back to the materialized-"
            "maps tail", stacklevel=2)

    def process(key, targets: TargetBatch):
        if lowrank and km and lr.noise_rdm_sig is not None:
            # kernel-maps tail: the fused kernel returns BOTH the complete
            # [B, V, G] RDM and the [pairs, V, G] sum maps computed from
            # its resident f32 tiles — pair_sum_maps and its full-cube
            # read disappear; only the bool mask is relaid to the
            # reference (pair, range, velocity) scan order
            interp = jax.default_backend() == "cpu"
            rdm_bm, maps_qvg = lr.noise_rdm_sig(
                key, targets, interpret=interp, layout="bvg",
                emit_maps=True)
            mask, _ = goca_cfar_2d(maps_qvg, cfg.cfar, layout="qvg")
            dets = extract_detections(mask, maps_qvg,
                                      cfg.cfar.max_detections,
                                      layout="qvg", impl=cfg.extract_impl)
            params = estimate_parameters(
                dets, maps_qvg, rdm_bm, mc, ip.extra_dots,
                ip.r_interp_times, ip.v_interp_times,
                monopulse_complex=cfg.monopulse_complex,
                monopulse_refined=cfg.monopulse_refined, layout="bvg",
                maps_layout="qvg")
            s1 = cluster_stage1(params, cfg.cluster)
            final = cluster_stage2(s1, cfg.cluster)
            return FrameResult(targets=final,
                               num_raw_detections=dets.count,
                               num_final=final.count.astype(jnp.int32))
        if lowrank:
            # rank-K deterministic RDM + post-MTD noise mixing: PC contracts
            # fast time, MTD slow time, the Cholesky mix beams — disjoint
            # axes, so all three commute (exact up to float reassociation)
            if bm_tail and lr.noise_rdm is not None:
                # beams-major tail: RDM stays in the kernel's [B, V, G]
                # layout end-to-end and the maps/mask go [pairs, G, V],
                # whose native ravel IS the reference's (pair, range,
                # velocity)-major scan order — no transposed complex copy,
                # no 13.6M-bool relayout. Same arithmetic, same detections.
                interp = jax.default_backend() == "cpu"
                if lr.noise_rdm_sig is not None:
                    # complete RDM from one kernel (rank-K signal fused
                    # into the mix tail)
                    rdm_bm = lr.noise_rdm_sig(key, targets,
                                              interpret=interp,
                                              layout="bvg")
                else:
                    rdm_bm = (lr.signal_rdm(targets, layout="bvg")
                              + lr.noise_rdm(key, interpret=interp,
                                             layout="bvg"))
                maps_t = pair_sum_maps_bm(rdm_bm)
                mask, _ = goca_cfar_2d(maps_t, cfg.cfar, layout="qgv")
                dets = extract_detections(mask, maps_t,
                                          cfg.cfar.max_detections,
                                          layout="qgv",
                                          impl=cfg.extract_impl)
                params = estimate_parameters(
                    dets, maps_t, rdm_bm, mc, ip.extra_dots,
                    ip.r_interp_times, ip.v_interp_times,
                    monopulse_complex=cfg.monopulse_complex,
                monopulse_refined=cfg.monopulse_refined, layout="bvg")
                s1 = cluster_stage1(params, cfg.cluster)
                final = cluster_stage2(s1, cfg.cluster)
                return FrameResult(targets=final,
                                   num_raw_detections=dets.count,
                                   num_final=final.count.astype(jnp.int32))
            if lr.noise_rdm_sig is not None:
                # complete RDM from one kernel pass (rank-K signal fused
                # into the mix tail) — no signal cube, no add
                rdm = lr.noise_rdm_sig(
                    key, targets, interpret=jax.default_backend() == "cpu")
            elif lr.noise_rdm is not None:
                rdm = lr.signal_rdm(targets) + lr.noise_rdm(
                    key, interpret=jax.default_backend() == "cpu")
            else:
                rdm = lr.mix_add(lr.signal_rdm(targets),
                                 lr.mtd(lr.pc(lr.gen_noise(key))))
        elif fused:
            sig_beams = synthesize_echo_beams(targets, precomp, cfg, mix_np,
                                              dtype=dtype)
            beams = add_noise_beamspace(key, sig_beams, l_np)
        else:
            raw = synthesize_echoes(targets, precomp, cfg, dtype=dtype)
            if cfg.noise_impl == "pallas":
                from ..ops.pallas_noise import add_noise_pallas

                noisy = add_noise_pallas(
                    key, raw, interpret=jax.default_backend() == "cpu")
            else:
                noisy = add_noise(key, raw)
            beams = dbf(noisy, dbf_w, cfg.dbf_variant)
        if not lowrank:
            if mplan is not None:
                pc = pulse_compress_matmul(beams, mplan,
                                           precision=cfg.matmul_precision)
            else:
                pc = pulse_compress(beams, precomp, plan)
            rdm = (mtd_matmul(pc, mtd_mat, precision=cfg.matmul_precision)
                   if mtd_mat is not None
                   else mtd(pc, mtd_win, cfg.mtd_fft_len))
        if cfg.use_pallas_cfar:
            # standalone Pallas CFAR on qvg maps: the pair-sum maps are
            # produced directly in the kernel's [pairs, V, G] layout (XLA
            # fuses the transpose + pad into the elementwise producer, cf.
            # the beams-major-tail study), the kernel emits the bool mask
            # plus the extraction's per-(pair, gate) row counts, and the
            # whole detection tail runs the existing qvg machinery —
            # detections are bit-identical to the default path
            from ..ops.pallas_kernels import (HALO, goca_cfar_qvg_pallas,
                                              pad_maps_qvg)

            num_v, num_g = rdm.shape[0], rdm.shape[1]
            mag_q = jnp.abs(jnp.transpose(rdm, (2, 0, 1)))    # [B, V, G]
            maps_qp = pad_maps_qvg(mag_q[:-1] + mag_q[1:])
            direct = cfg.extract_impl == "direct" and not cfg.extract_native_scan
            mask, rc = goca_cfar_qvg_pallas(
                maps_qp, cfg.cfar, num_g, num_v,
                interpret=jax.default_backend() == "cpu")
            maps_q = maps_qp[:, :num_v, HALO:HALO + num_g]    # [Q, V, G]
            dets = extract_detections(mask, maps_q,
                                      cfg.cfar.max_detections,
                                      layout="qvg", impl=cfg.extract_impl,
                                      row_counts=rc if direct else None)
            params = estimate_parameters(
                dets, maps_q, rdm, mc, ip.extra_dots,
                ip.r_interp_times, ip.v_interp_times,
                monopulse_complex=cfg.monopulse_complex,
                monopulse_refined=cfg.monopulse_refined,
                maps_layout="qvg")
            s1 = cluster_stage1(params, cfg.cluster)
            final = cluster_stage2(s1, cfg.cluster)
            result = FrameResult(targets=final,
                                 num_raw_detections=dets.count,
                                 num_final=final.count.astype(jnp.int32))
            if return_intermediates:
                return FrameIntermediates(
                    raw_iq=noisy, beams=beams, pc=pc, rdm=rdm,
                    pair_maps=jnp.transpose(maps_q, (1, 2, 0)),
                    detections=dets, params=params, stage1=s1,
                    result=result)
            return result
        maps = pair_sum_maps(rdm)
        mask, _ = goca_cfar_2d(maps, cfg.cfar)
        # maps-free tail: amplitudes/stencils gather pointwise from the
        # RDM (identical values); the pair-sum cube then feeds ONLY the
        # CFAR box filters, so XLA can fuse it away instead of writing it
        tfr = (cfg.tail_from_rdm and cfg.extract_impl == "direct"
               and not cfg.extract_native_scan and not return_intermediates)
        dets = extract_detections(mask, None if tfr else maps,
                                  cfg.cfar.max_detections,
                                  native_scan=cfg.extract_native_scan,
                                  impl=cfg.extract_impl,
                                  rdm=rdm if tfr else None)
        params = estimate_parameters(
            dets, None if tfr else maps, rdm, mc, ip.extra_dots,
            ip.r_interp_times, ip.v_interp_times,
            monopulse_complex=cfg.monopulse_complex,
                monopulse_refined=cfg.monopulse_refined)
        s1 = cluster_stage1(params, cfg.cluster)
        final = cluster_stage2(s1, cfg.cluster)
        result = FrameResult(targets=final, num_raw_detections=dets.count,
                             num_final=final.count.astype(jnp.int32))
        if return_intermediates:
            return FrameIntermediates(raw_iq=noisy, beams=beams, pc=pc,
                                      rdm=rdm, pair_maps=maps,
                                      detections=dets, params=params,
                                      stage1=s1, result=result)
        return result

    return jax.jit(process) if jit else process
