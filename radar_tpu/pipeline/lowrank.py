"""Shared stage callables for the rank-K closed-form RDM pipeline
(cfg.lowrank_rdm): the deterministic signal RDM as K outer products, white
beam noise through PC+MTD, and the post-MTD Cholesky beam mixing — exact
linear commutation with the fused beam-space path (tests/test_fused.py).

Factored out so the single-device processor (pipeline/frame.py), the
Monte-Carlo trial fn (pipeline/montecarlo.py) and the GSPMD-sharded
processor (parallel/sharded.py) compose the SAME stages; the sharded
version just inserts sharding constraints between them."""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp
import numpy as np

from ..config.params import RadarConfig
from ..ops.dbf import dbf_weights_effective_np
from ..ops.mtd import mtd, mtd_matmul
from ..ops.pulse_compression import (compact_noise_plan, pulse_compress,
                                     pulse_compress_matmul)
from ..sim.echo import (beam_noise_factor, synthesize_factors,
                        white_complex_noise)


class LowrankStages(NamedTuple):
    signal_rdm: Callable    # targets -> [V, G, B] complex (rank-K closed form)
    gen_noise: Callable     # key -> white z [P, S(_compact), B]
    pc: Callable            # z -> [P, G, B] (compact plan when enabled)
    mtd: Callable           # pc -> [V, G, B]
    mix_add: Callable       # (rdm_sig, rdm_z) -> final RDM [V, G, B]
    # fused one-pass alternative (cfg.noise_rdm_impl="pallas"): (key,
    # interpret) -> beam-mixed noise RDM [V, G, B]; None when unavailable
    noise_rdm: Callable | None = None
    # the pallas path's plane generator: (key, interpret) -> (xrs, xis)
    # per-segment padded plane pairs (exposed for profiling; noise_rdm ==
    # kernel(noise_planes(key)))
    noise_planes: Callable | None = None
    # pallas_prng only: (key, targets, interpret, layout) -> COMPLETE RDM
    # (rank-K signal fused into the kernel's mix tail; supersedes
    # signal_rdm + noise_rdm + add when present)
    noise_rdm_sig: Callable | None = None


def make_lowrank_stages(cfg: RadarConfig, precomp, plan, mplan,
                        mtd_mat, mtd_win, dtype) -> LowrankStages:
    dbf_w = np.asarray(precomp.dbf_w)
    w_eff = dbf_weights_effective_np(dbf_w, cfg.dbf_variant)
    mix_np = np.ascontiguousarray(w_eff.T)        # [C, B]
    l_np = beam_noise_factor(w_eff)               # [B, B]
    nplan, nlen = (None, 0)
    if cfg.compact_noise and mplan is not None:
        nplan, nlen = compact_noise_plan(mplan)
    num_b = dbf_w.shape[0]

    def _pc_full(x):
        return (pulse_compress_matmul(x, mplan,
                                      precision=cfg.matmul_precision)
                if mplan is not None else pulse_compress(x, precomp, plan))

    def _mtd(x):
        return (mtd_matmul(x, mtd_mat, precision=cfg.matmul_precision)
                if mtd_mat is not None else mtd(x, mtd_win, cfg.mtd_fft_len))

    def signal_rdm(targets, layout="vgb"):
        dop_amp, base, steer_b = synthesize_factors(targets, precomp, cfg,
                                                    mix_np, dtype=dtype)
        pc_base = _pc_full(base[:, :, None])[:, :, 0]          # [K, gates]
        dop_v = _mtd(dop_amp.T[:, None, :])[:, 0, :].T         # [K, n_dop]
        spec = "kv,kj,kb->bvj" if layout == "bvg" else "kv,kj,kb->vjb"
        return jnp.einsum(spec, dop_v, pc_base, steer_b,
                          preferred_element_type=dtype)

    def gen_noise(key):
        s = nlen if nplan is not None else cfg.sig.point_prt
        return white_complex_noise(key, (cfg.sig.prt_num, s, num_b), dtype,
                                   impl=cfg.noise_prng)

    def pc(z):
        if nplan is not None:
            return pulse_compress_matmul(z, nplan,
                                         precision=cfg.matmul_precision)
        return _pc_full(z)

    def mix_add(rdm_sig, rdm_z):
        return rdm_sig + jnp.einsum(
            "vgj,bj->vgb", rdm_z, jnp.asarray(l_np).astype(dtype),
            preferred_element_type=dtype)

    noise_rdm = None
    noise_rdm_sig = None
    if (str(cfg.noise_rdm_impl).startswith("pallas")
            and (mplan is None or mtd_mat is None)):
        # refuse rather than silently running the XLA Gaussian chain:
        # the user asked for the fused kernel (and, for pallas_prng, its
        # uniform rails), and every other flag conflict in frame.py
        # fails loudly (round-5 self-review)
        raise ValueError(
            f"noise_rdm_impl={cfg.noise_rdm_impl!r} requires the matmul "
            "PC plan and the MTD matrix (pc_method='matmul' and the "
            "matmul MTD route); this config resolves "
            f"mplan={'ok' if mplan is not None else None}, "
            f"mtd_mat={'ok' if mtd_mat is not None else None}")
    if (cfg.noise_rdm_impl == "pallas_prng" and mplan is not None
            and mtd_mat is not None):
        # in-kernel noise generation: the hardware PRNG draws each grid
        # step's window on-core — no white cube in HBM at all (no zgen
        # stage, no write, no overlap-amplified window reads). Only the
        # uniform-rail distribution is implemented in the kernel (the CLT
        # argument validated in results/snr_sweep_uniform*.json); bit- and
        # statistics-level validation vs the DMA-plane kernel on real
        # hardware: scripts/validate_rdm_gen.py -> results/rdm_gen.json.
        if cfg.noise_dist != "uniform":
            raise ValueError(
                "noise_rdm_impl='pallas_prng' implements uniform rails "
                "only; set noise_dist='uniform'")
        import jax

        from ..ops.pallas_rdm import make_rdm_plan, noise_rdm_pallas_gen

        rplan = make_rdm_plan(precomp, mtd_mat, cfg.sig.prt_num, tile=128,
                              lane=128)
        a_unif = float(np.sqrt(1.5))   # unit rail variance: a^2/3 = 1/2

        def _frame_seed(key):
            # two int32 words from the frame key (domain-separated so the
            # kernel's stream never aliases the jax.random draws elsewhere
            # in the frame)
            k = jax.random.fold_in(key, 0x5eed)
            data = (k if jnp.issubdtype(k.dtype, jnp.integer)
                    else jax.random.key_data(k))
            return jax.lax.bitcast_convert_type(
                data.reshape(-1)[:2].astype(jnp.uint32), jnp.int32)

        def noise_rdm(key, interpret=False, layout="vgb"):
            # rolling-chunk all-beams kernel: each gate tile draws only
            # its NEW 128-lane chunks into a circular VMEM buffer (same
            # chunk-keyed draws; banded-PC dot decomposed per chunk —
            # bf16-rounding-level equivalence, results/rdm_gen.json);
            # measured 1.458 -> 1.303 ms standalone
            # (results/rdm_gen_tile.json)
            return noise_rdm_pallas_gen(
                _frame_seed(key), rplan, l_np, a_unif,
                interpret=interpret,
                mul_dtype=jnp.float32 if interpret else jnp.bfloat16,
                out_dtype=jnp.float32 if interpret else jnp.bfloat16,
                layout=layout, rolling=True)

        def noise_rdm_sig(key, targets, interpret=False, layout="vgb",
                          emit_maps=False):
            # COMPLETE RDM in one kernel pass: the rank-K signal factors
            # (tiny [K, *] arrays) fuse into the rolling kernel's mix tail
            # — the [V, G, B] signal-cube einsum and the signal+noise add
            # disappear. Default f32 output planes so the SIGNAL is never
            # bf16-quantized (monopulse ratio precision); the noise
            # thereby skips the bf16 output quantization of the noise-only
            # path (strictly more accurate, same validated statistics
            # class). cfg.kernel_out_bf16 opts back into bf16 planes
            # (halved output + downstream-read traffic; honored in
            # interpret mode too so CPU tests exercise the quantization).
            dop_amp, base, steer_b = synthesize_factors(
                targets, precomp, cfg, mix_np, dtype=dtype)
            pc_base = _pc_full(base[:, :, None])[:, :, 0]      # [K, gates]
            dop_v = _mtd(dop_amp.T[:, None, :])[:, 0, :].T     # [K, n_dop]
            return noise_rdm_pallas_gen(
                _frame_seed(key), rplan, l_np, a_unif,
                interpret=interpret,
                mul_dtype=jnp.float32 if interpret else jnp.bfloat16,
                out_dtype=(jnp.bfloat16 if cfg.kernel_out_bf16
                           else jnp.float32),
                layout=layout, rolling=True,
                signal=(dop_v, pc_base, steer_b), emit_maps=emit_maps)

        noise_planes = None
    elif (cfg.noise_rdm_impl == "pallas" and mplan is not None
            and mtd_mat is not None):
        import jax

        from ..ops.pallas_rdm import (make_rdm_plan, noise_rdm_pallas_planes,
                                      segment_buffer_len)
        from ..sim.echo import _as_impl_key

        rplan = make_rdm_plan(precomp, mtd_mat, cfg.sig.prt_num, tile=128)
        root2inv = np.sqrt(0.5).astype(np.float32)
        # unit rail variance for uniform rails: var(U[-a,a]) = a^2/3 = 1/2
        a_unif = np.sqrt(1.5).astype(np.float32)

        def draw(k, shape):
            k = _as_impl_key(k, cfg.noise_prng)
            if cfg.noise_dist == "uniform":
                # zero-mean unit-variance uniform rails straight from PRNG
                # bits (no erfinv): the noise RDM is a >=10k-term weighted
                # sum of these, Gaussian by CLT to ~1e-3 (see
                # config/params.py noise_dist and the moment test in
                # tests/test_pallas_rdm.py)
                return jax.random.uniform(k, shape, jnp.float32,
                                          -a_unif, a_unif)
            return jax.random.normal(k, shape, jnp.float32) * root2inv

        def noise_planes(key, interpret=False):
            # generate the kernel's padded bf16 segment planes DIRECTLY
            # (free relabeling of iid draws): no complex cube, no slice/pad
            # copies, no separate bf16 casts — measured 2.8 -> 0.6 ms
            # (results/zgen2.json). Tail pads and pulse-pad rows keep
            # their garbage draws: they only reach gates/Doppler rows that
            # are sliced away (bit-level test in tests/test_pallas_rdm.py);
            # only the pad_front causal history must be zeroed.
            mul = jnp.float32 if interpret else jnp.bfloat16
            keys = jax.random.split(key, len(rplan.segments))
            xrs, xis = [], []
            for seg, k in zip(rplan.segments, keys):
                n = segment_buffer_len(seg)
                g = draw(k, (2, num_b, rplan.p_pad, n))
                if seg.pad_front:
                    g = g * (jnp.arange(n) >= seg.pad_front)
                xrs.append(g[0].astype(mul))
                xis.append(g[1].astype(mul))
            return xrs, xis

        def noise_rdm(key, interpret=False, layout="vgb"):
            xrs, xis = noise_planes(key, interpret)
            # bf16 output planes halve the kernel write + downstream read
            # traffic (measured 1.77 -> 1.62 ms for gen+kernel); a 2^-8
            # relative quantization of the NOISE, same class as the bf16
            # multiply planes already validated in results/bf16_matmul.json
            # and re-validated end-to-end by the uniform-rails sweeps
            return noise_rdm_pallas_planes(
                xrs, xis, rplan, l_np, interpret=interpret,
                mul_dtype=jnp.float32 if interpret else jnp.bfloat16,
                out_dtype=jnp.float32 if interpret else jnp.bfloat16,
                layout=layout)
    else:
        noise_planes = None

    return LowrankStages(signal_rdm=signal_rdm, gen_noise=gen_noise, pc=pc,
                         mtd=_mtd, mix_add=mix_add, noise_rdm=noise_rdm,
                         noise_planes=noise_planes,
                         noise_rdm_sig=noise_rdm_sig)
