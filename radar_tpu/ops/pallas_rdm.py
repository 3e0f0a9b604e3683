"""Fused white-noise RDM Pallas kernel: PC + MTD + Cholesky beam mixing in
ONE pass.

The lowrank noise chain (pipeline/lowrank.py) is three XLA stages —
banded-Toeplitz PC, MTD DFT matmul, 13x13 beam mix — each of which round-
trips the ~118 MB cube through HBM (measured 2.35 ms total, ~2.5x the
traffic floor). This kernel chains all three on-chip: each grid step DMAs
one overlapping [pulses, tile+filter-1] window of the white-noise cube into
VMEM, runs the banded PC matmul and the MTD DFT matmul back to back on the
MXU (bf16 multiply planes, f32 accumulation), and accumulates the beam-
mixed contribution L[c,b]*tile_b into the resident output block across the
beam-innermost grid dimension. z is read once; the mixed noise RDM is
written once, in beams-major [B, n_dop, gates] layout (lanes = gates).

Exact same arithmetic as
  einsum('vgj,bj->vgb', mtd_matmul(pulse_compress_matmul(z, bf16), bf16), L)
up to tile reassociation and the f32 accumulation of 13 beam terms.

Reference semantics unchanged: segmented causal convolution
(fun_process_single_frame.m:99-127), windowed slow-time DFT (:129-136),
beam-space noise with the DBF-output covariance (see sim/echo.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu



class RdmSegSpec(NamedTuple):
    c0: int          # first sample in the compact-z layout
    r_len: int       # samples read from compact z
    pad_front: int   # zero causal history
    pad_tail: int
    j_len: int       # true output gates
    tile: int        # output gate tile T
    window: int      # padded input window W (128-aligned)
    mpr: np.ndarray  # [W, T] PC filter planes
    mpi: np.ndarray


class RdmPlan(NamedTuple):
    segments: tuple[RdmSegSpec, ...]
    s_compact: int
    n_gates: int
    n_dop: int
    dr: np.ndarray   # [V_pad, P_pad] MTD DFT planes (window+fftshift folded)
    di: np.ndarray
    p_pad: int
    v_pad: int


def _seg_matrices(h: np.ndarray, tile: int) -> tuple[np.ndarray, np.ndarray]:
    """Banded-convolution (re, im) filter planes [tile+len(h)-1, tile] for
    one segment: column t holds h reversed at offset t (causal linear
    convolution = MATLAB filter() semantics). Shared with the
    studies/pallas_pc.py kernel, which this fused kernel superseded."""
    lh = len(h)
    w = tile + lh - 1
    m = np.zeros((w, tile), np.complex128)
    for tt in range(tile):
        k = tt + lh - 1 - np.arange(w)
        sel = (k >= 0) & (k < lh)
        m[sel, tt] = h[k[sel]]
    return (np.ascontiguousarray(m.real.astype(np.float32)),
            np.ascontiguousarray(m.imag.astype(np.float32)))


def make_rdm_plan(precomp, mtd_matrix, num_pulses: int,
                  tile: int = 256, lane: int = 1) -> RdmPlan:
    g1, g2, _ = precomp.gate_splits
    n_total = precomp.n_total_gate
    fd = precomp.fir_delay
    p_pad = -(-num_pulses // 16) * 16
    m = np.asarray(mtd_matrix)
    n_dop = m.shape[0]
    v_pad = -(-n_dop // 16) * 16
    dr = np.zeros((v_pad, p_pad), np.float32)
    di = np.zeros((v_pad, p_pad), np.float32)
    dr[:n_dop, :num_pulses] = m.real
    di[:n_dop, :num_pulses] = m.imag
    segs = []
    c0 = 0
    for h, out_lo, out_hi in (
            (np.asarray(precomp.mf_narrow, np.complex128), fd, fd + g1),
            (np.asarray(precomp.mf_medium_win), g1, g1 + g2),
            (np.asarray(precomp.mf_long_win), g1 + g2, n_total)):
        lh = len(h)
        t = min(tile, int(2 ** np.ceil(np.log2(out_hi - out_lo))))
        # the in-kernel-PRNG variant keys draws by absolute 128-lane chunk
        # position, which needs 128-aligned tiles (lane=128); the DMA
        # variants take any tile (lane=1, the default, unchanged)
        t = -(-t // lane) * lane
        r0 = max(out_lo - (lh - 1), 0)
        r_len = out_hi - r0
        pad_front = (lh - 1) - (out_lo - r0)
        j_len = out_hi - out_lo
        ntiles = -(-j_len // t)
        w = t + lh - 1
        w_pad = -(-w // 128) * 128
        xlen_needed = (ntiles - 1) * t + w_pad
        if lane == 128 and xlen_needed // 128 >= 65536:
            # the in-kernel PRNG packs (beam, chunk) as b*2^16 + c into one
            # seed word; a chunk index >= 2^16 would silently alias draw
            # streams across beams (see _draw_uniform_chunk)
            raise ValueError(
                f"segment needs {xlen_needed // 128} 128-lane chunks "
                f">= 2^16; the (beam, chunk) seed packing would alias")
        pad_tail = max(xlen_needed - (pad_front + r_len), 0)
        mpr, mpi = _seg_matrices(h, t)
        mpr = np.pad(mpr, ((0, w_pad - w), (0, 0)))
        mpi = np.pad(mpi, ((0, w_pad - w), (0, 0)))
        segs.append(RdmSegSpec(c0=c0, r_len=r_len, pad_front=pad_front,
                               pad_tail=pad_tail, j_len=j_len, tile=t,
                               window=w_pad, mpr=mpr, mpi=mpi))
        c0 += r_len
    return RdmPlan(segments=tuple(segs), s_compact=c0, n_gates=n_total,
                   n_dop=n_dop, dr=dr, di=di, p_pad=p_pad, v_pad=v_pad)


def _pc_mtd_step(xr, xi, mpr_ref, mpi_ref, dr_ref, di_ref, mtr_s, mti_s,
                 b, mul_dtype):
    """Shared per-step compute: banded-PC dot + MTD DFT dot for one beam's
    [p_pad, window] white planes, buffered unmixed into mtr/mti scratch."""
    f32 = jnp.float32
    mpr = mpr_ref[:]
    mpi = mpi_ref[:]
    pcr = (jnp.dot(xr, mpr, preferred_element_type=f32)
           - jnp.dot(xi, mpi, preferred_element_type=f32))
    pci = (jnp.dot(xr, mpi, preferred_element_type=f32)
           + jnp.dot(xi, mpr, preferred_element_type=f32))
    _mtd_store(pcr, pci, dr_ref, di_ref, mtr_s, mti_s, b, mul_dtype)


def _mtd_store(pcr, pci, dr_ref, di_ref, mtr_s, mti_s, b, mul_dtype):
    """MTD DFT dot on one beam's f32 PC tile, stored unmixed into scratch."""
    f32 = jnp.float32
    pcr16 = pcr.astype(mul_dtype)
    pci16 = pci.astype(mul_dtype)
    dr = dr_ref[:]
    di = di_ref[:]
    # buffer this beam's UNMIXED mtd tile; the 13x13 mix runs once per
    # gate tile as an MXU contraction (a per-beam VPU accumulation is
    # B^2 elementwise passes — measured 28% slower than the XLA chain)
    mtr_s[b] = (jnp.dot(dr, pcr16, preferred_element_type=f32)
                - jnp.dot(di, pci16, preferred_element_type=f32)
                ).astype(mul_dtype)
    mti_s[b] = (jnp.dot(dr, pci16, preferred_element_type=f32)
                + jnp.dot(di, pcr16, preferred_element_type=f32)
                ).astype(mul_dtype)


def _mix_vals(lr_ref, li_ref, mtr_s, mti_s):
    """Cholesky beam mix of the buffered [num_b, v_pad, tile] MTD tiles
    as one MXU contraction; returns the mixed f32 (re, im) blocks."""
    f32 = jnp.float32
    lr = lr_ref[:]
    li = li_ref[:]
    mtr = mtr_s[:]
    mti = mti_s[:]
    dn = (((1,), (0,)), ((), ()))
    rr = jax.lax.dot_general(lr, mtr, dn, preferred_element_type=f32)
    ri = jax.lax.dot_general(lr, mti, dn, preferred_element_type=f32)
    ir = jax.lax.dot_general(li, mtr, dn, preferred_element_type=f32)
    ii = jax.lax.dot_general(li, mti, dn, preferred_element_type=f32)
    return rr - ii, ri + ir


def _mix_tail(lr_ref, li_ref, mtr_s, mti_s, yr_ref, yi_ref, out_dtype):
    """_mix_vals written to the output blocks (run on each gate tile's
    last beam step)."""
    yr, yi = _mix_vals(lr_ref, li_ref, mtr_s, mti_s)
    yr_ref[...] = yr.astype(out_dtype)
    yi_ref[...] = yi.astype(out_dtype)


def _make_kernel(p_pad: int, v_pad: int, window: int, num_b: int,
                 mul_dtype, out_dtype=jnp.float32):
    def kernel(xr_hbm, xi_hbm, mpr_ref, mpi_ref, dr_ref, di_ref,
               lr_ref, li_ref, yr_ref, yi_ref, mtr_s, mti_s, sems,
               xr_s, xi_s):
        t = pl.program_id(0)
        b = pl.program_id(1)
        n_t = pl.num_programs(0)
        tile = yr_ref.shape[-1]

        # double-buffered window prefetch: scratch slot alternates with the
        # linear step index; each step starts the NEXT step's DMA before
        # waiting on its own (started by the previous step; step 0 warms up)
        step = t * num_b + b
        slot = jax.lax.rem(step, jnp.int32(2))
        nslot = 1 - slot

        def dma(s, stp):
            tt = stp // num_b
            bb = jax.lax.rem(stp, jnp.int32(num_b))
            return (pltpu.make_async_copy(
                        xr_hbm.at[bb, :, pl.ds(tt * tile, window)],
                        xr_s.at[s], sems.at[s, 0]),
                    pltpu.make_async_copy(
                        xi_hbm.at[bb, :, pl.ds(tt * tile, window)],
                        xi_s.at[s], sems.at[s, 1]))

        @pl.when(step == 0)
        def _():
            r0, i0 = dma(slot, step)
            r0.start()
            i0.start()

        @pl.when(step + 1 < n_t * num_b)
        def _():
            rn, in_ = dma(nslot, step + 1)
            rn.start()
            in_.start()

        cur_r, cur_i = dma(slot, step)
        cur_r.wait()
        cur_i.wait()
        _pc_mtd_step(xr_s[slot], xi_s[slot], mpr_ref, mpi_ref, dr_ref,
                     di_ref, mtr_s, mti_s, b, mul_dtype)

        @pl.when(b == num_b - 1)
        def _():
            _mix_tail(lr_ref, li_ref, mtr_s, mti_s, yr_ref, yi_ref,
                      out_dtype)

    return kernel


def _draw_uniform_chunk(seed_ref, b, c, p_pad: int, pad_front: int,
                        a_scale: float):
    """One 128-lane chunk of U[-a, a) re/im rails from the on-core
    hardware PRNG, keyed by (frame seed, segment, beam, ABSOLUTE chunk
    index) — so any window that covers chunk ``c`` regenerates the exact
    same values, preserving the banded-convolution semantics across
    overlapping tile windows. 24-bit mantissa uniforms (same idiom as
    ops/pallas_noise.py); the first ``pad_front`` samples (pre-PRT causal
    history) are zeroed. Returns (re, im) f32 [p_pad, 128] planes.

    Mosaic accepts at most TWO seed words, so (beam, chunk) fold into the
    second via a Knuth multiplicative hash of the unique index b*2^16+c
    (c < 2^16 always); the segment id is folded into the first word at
    trace time (see noise_rdm_pallas_gen)."""
    pltpu.prng_seed(seed_ref[0],
                    seed_ref[1] + (b * np.int32(65536) + c)
                    * np.int32(-1640531527))
    bits = pltpu.bitcast(pltpu.prng_random_bits((p_pad, 256)), jnp.uint32)
    # Mosaic has no uint32->f32 cast; >>8 fits in int32, bitcast first.
    k24 = pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32)
    # (k + 0.5 - 2^23) * 2a/2^24: exactly zero-mean, var a^2/3 (+O(2^-48))
    u = (k24 - np.float32(2.0 ** 23 - 0.5)) * np.float32(
        2.0 * a_scale * 2.0 ** -24)
    ur = u[:, :128]
    ui = u[:, 128:]
    if pad_front:
        pos = c * 128 + jax.lax.broadcasted_iota(jnp.int32, (p_pad, 128), 1)
        m = (pos >= pad_front).astype(jnp.float32)
        ur = ur * m
        ui = ui * m
    return ur, ui


def _make_kernel_gen(p_pad: int, v_pad: int, window: int, num_b: int,
                     tile: int, pad_front: int, a_scale: float,
                     mul_dtype, out_dtype=jnp.float32,
                     beams_per_step: int = 1):
    """In-kernel-noise variant of ``_make_kernel``: instead of DMA-ing
    pre-generated white planes from HBM, each grid step draws its own
    [p_pad, window] uniform window straight from the hardware PRNG
    (``_draw_uniform_chunk`` per 128-lane chunk). No input cube exists in
    HBM at all — the zgen stage, its HBM write, and the kernel's
    overlap-amplified window reads all disappear. Requires
    ``cfg.noise_dist="uniform"`` rails (the validated CLT argument,
    results/snr_sweep_uniform*.json) and 128-aligned gate tiles.

    ``beams_per_step`` unrolls that many beams into one grid step as
    SEPARATE per-beam draw+dot chains (not the stacked-matrix formulation
    that lost for the DMA kernel — no relayouts): the grid's beam
    dimension shrinks accordingly, amortizing per-step framework cost.
    Draw streams are keyed by the true beam index, so any unroll factor
    produces bit-identical output."""
    assert tile % 128 == 0 and window % 128 == 0
    nchunks = window // 128
    stride = tile // 128

    def kernel(seed_ref, mpr_ref, mpi_ref, dr_ref, di_ref,
               lr_ref, li_ref, yr_ref, yi_ref, mtr_s, mti_s):
        t = pl.program_id(0)
        b0 = pl.program_id(1) * beams_per_step

        def one_beam(b):
            rp, ip = [], []
            for i in range(nchunks):
                ur, ui = _draw_uniform_chunk(seed_ref, b,
                                             t * stride + np.int32(i),
                                             p_pad, pad_front, a_scale)
                rp.append(ur.astype(mul_dtype))
                ip.append(ui.astype(mul_dtype))
            xr = jnp.concatenate(rp, axis=1)
            xi = jnp.concatenate(ip, axis=1)
            _pc_mtd_step(xr, xi, mpr_ref, mpi_ref, dr_ref, di_ref,
                         mtr_s, mti_s, b, mul_dtype)

        for ub in range(beams_per_step):
            b = b0 + np.int32(ub)
            if num_b % beams_per_step == 0:
                one_beam(b)
            else:   # ragged last step: skip beams past num_b
                pl.when(b < num_b)(lambda bb=b: one_beam(bb))

        @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
        def _():
            _mix_tail(lr_ref, li_ref, mtr_s, mti_s, yr_ref, yi_ref,
                      out_dtype)

    return kernel


def _make_kernel_gen_rolling(p_pad: int, v_pad: int, window: int,
                             num_b: int, tile: int, pad_front: int,
                             a_scale: float, mul_dtype,
                             out_dtype=jnp.float32,
                             num_k: int = 0,
                             emit_maps: bool = False,
                             stacked: bool = False,
                             _static_slots: bool = False):
    """Rolling-chunk variant of ``_make_kernel_gen`` (all beams per step):
    consecutive gate tiles share ``window - tile`` samples, so each step
    draws only the ``tile/128`` NEW 128-lane chunks per beam into a
    circular VMEM buffer — a window/tile-fold PRNG saving (7x on the long
    segment) — and the banded-PC dot decomposes over the resident chunks:
    pc = sum_i x[slot(c_t + i)] @ MP[i*128:(i+1)*128]. The four partial-
    dot accumulators (xr*mpr, xi*mpi, xr*mpi, xi*mpr) are summed
    separately before combining, mirroring the single big dot's f32
    K-loop accumulation order.

    ``num_k > 0`` additionally fuses the RANK-K SIGNAL RDM into the mix
    tail (cfg.lowrank_rdm's closed form): six extra refs carry the tiny
    per-target factors — Doppler columns dv [v_pad, K] (re/im), this
    segment's pulse-compressed base rows pb [K, tile] (re/im, tile-
    blocked), and steering scalars in SMEM [K, num_b] — and each gate
    tile adds sum_k steer[k,b] * (dv[:,k] (x) pb[k,:]) before the single
    f32 output write. The separate [V, G, B] signal-cube einsum and the
    signal+noise add disappear from the XLA graph entirely."""
    assert tile % 128 == 0 and window % 128 == 0
    nchunks = window // 128
    stride = tile // 128

    assert not (emit_maps and not num_k), \
        "emit_maps is implemented on the signal-fused tail"

    def kernel(seed_ref, mpr_ref, mpi_ref, dr_ref, di_ref,
               lr_ref, li_ref, *rest):
        # ``stacked``: mpr_ref actually holds MP2=[mpr|mpi] ([W, 2T]) and
        # dr_ref holds D2=[dr;di] ([2V, P]); mpi_ref/di_ref hold unused
        # 1-element placeholders (the arg structure stays fixed)
        mp_ref = None
        if num_k:
            (dvr_ref, dvi_ref, pbr_ref, pbi_ref, str_ref, sti_ref,
             *rest) = rest
            if emit_maps:
                yr_ref, yi_ref, mp_ref, mtr_s, mti_s, xr_roll, \
                    xi_roll = rest
            else:
                yr_ref, yi_ref, mtr_s, mti_s, xr_roll, xi_roll = rest
        else:
            yr_ref, yi_ref, mtr_s, mti_s, xr_roll, xi_roll = rest
        t = pl.program_id(0)
        f32 = jnp.float32

        def draw_to(b, c):
            ur, ui = _draw_uniform_chunk(seed_ref, np.int32(b), c,
                                         p_pad, pad_front, a_scale)
            slot = jax.lax.rem(c, jnp.int32(nchunks))
            xr_roll[b, slot] = ur.astype(mul_dtype)
            xi_roll[b, slot] = ui.astype(mul_dtype)

        # warm-up: the first window's leading chunks; every step then draws
        # the trailing `stride` chunks of ITS window — at t=0 the two parts
        # exactly tile chunks [0, nchunks)
        @pl.when(t == 0)
        def _():
            for b in range(num_b):
                for i in range(nchunks - stride):
                    draw_to(b, jnp.int32(i))

        for b in range(num_b):
            for k in range(stride):
                draw_to(b, t * stride + jnp.int32(nchunks - stride + k))

        p_real = p_pad
        for b in range(num_b):
            if stacked:
                # ONE [2P,128]x[128,2T] dot per chunk (re/im stacked on M
                # and N), accumulated stacked; quadrants combine once per
                # tile. Same MACs, ~4x fewer MXU issues.
                acc = None
                for i in range(nchunks):
                    slot = (i if _static_slots else
                            jax.lax.rem(t * stride + jnp.int32(i),
                                        jnp.int32(nchunks)))
                    x2 = jnp.concatenate([xr_roll[b, slot],
                                          xi_roll[b, slot]], axis=0)
                    mp2 = mpr_ref[i * 128:(i + 1) * 128, :]
                    d = jnp.dot(x2, mp2, preferred_element_type=f32)
                    acc = d if acc is None else acc + d
                tl = acc.shape[-1] // 2
                pcr = acc[:p_real, :tl] - acc[p_real:, tl:]
                pci = acc[:p_real, tl:] + acc[p_real:, :tl]
                pc2 = jnp.concatenate([pcr.astype(mul_dtype),
                                       pci.astype(mul_dtype)], axis=1)
                r2 = jnp.dot(dr_ref[:], pc2, preferred_element_type=f32)
                mtr_s[b] = (r2[:v_pad, :tl] - r2[v_pad:, tl:]
                            ).astype(mul_dtype)
                mti_s[b] = (r2[:v_pad, tl:] + r2[v_pad:, :tl]
                            ).astype(mul_dtype)
                continue
            rr = ii = ri = ir = None
            for i in range(nchunks):
                if _static_slots:   # timing ablation ONLY (wrong values):
                    slot = i        # sizes the dynamic-index access cost
                else:
                    slot = jax.lax.rem(t * stride + jnp.int32(i),
                                       jnp.int32(nchunks))
                xr = xr_roll[b, slot]
                xi = xi_roll[b, slot]
                mpr = mpr_ref[i * 128:(i + 1) * 128, :]
                mpi = mpi_ref[i * 128:(i + 1) * 128, :]
                d = lambda a, m: jnp.dot(a, m, preferred_element_type=f32)
                rr = d(xr, mpr) if rr is None else rr + d(xr, mpr)
                ii = d(xi, mpi) if ii is None else ii + d(xi, mpi)
                ri = d(xr, mpi) if ri is None else ri + d(xr, mpi)
                ir = d(xi, mpr) if ir is None else ir + d(xi, mpr)
            _mtd_store(rr - ii, ri + ir, dr_ref, di_ref, mtr_s, mti_s,
                       b, mul_dtype)

        if not num_k:
            _mix_tail(lr_ref, li_ref, mtr_s, mti_s, yr_ref, yi_ref,
                      out_dtype)
            return
        yrv, yiv = _mix_vals(lr_ref, li_ref, mtr_s, mti_s)
        outers = []
        for k in range(num_k):
            dvr = dvr_ref[:, k:k + 1]            # [v_pad, 1]
            dvi = dvi_ref[:, k:k + 1]
            pbr = pbr_ref[k:k + 1, :]            # [1, tile]
            pbi = pbi_ref[k:k + 1, :]
            outers.append((dvr * pbr - dvi * pbi,   # [v_pad, tile] outer
                           dvr * pbi + dvi * pbr))
        # static per-beam ref writes (no scatter): out[b] = mix[b] +
        # sum_k steer[k,b] * outer_k
        mags = []
        for b in range(num_b):
            accr = yrv[b]
            acci = yiv[b]
            for k, (ar, ai) in enumerate(outers):
                sr = str_ref[k, b]
                si = sti_ref[k, b]
                accr = accr + (sr * ar - si * ai)
                acci = acci + (sr * ai + si * ar)
            yr_ref[b] = accr.astype(out_dtype)
            yi_ref[b] = acci.astype(out_dtype)
            if emit_maps:
                mags.append(jnp.sqrt(accr * accr + acci * acci))
        if emit_maps:
            # adjacent-beam sum maps straight from the resident f32 tiles
            # (the pair_sum_maps pass and its full-cube read disappear);
            # sqrt(re^2+im^2) vs jnp.abs(complex): ULP-level only at these
            # magnitudes
            for p in range(num_b - 1):
                mp_ref[p] = (mags[p] + mags[p + 1]).astype(jnp.float32)

    return kernel


def _make_kernel_resident(p_pad: int, v_pad: int, window: int, num_b: int,
                          buf_len: int, mul_dtype, out_dtype=jnp.float32):
    """Same grid/compute as _make_kernel, but each beam's WHOLE padded
    segment buffer is DMA'd to VMEM once (all 2*B copies start at step 0,
    each beam waits at its first tile) and the per-tile overlapping windows
    are VMEM slices. Kills the window/tile read amplification — the
    dominant cost in the ablation (results/rdm_ablation.json: DMA-only
    variant 0.63 ms of the 1.24 ms kernel): HBM reads drop from
    ~window/tile x planes (~360 MB) to exactly the planes (~90 MB)."""
    def kernel(xr_hbm, xi_hbm, mpr_ref, mpi_ref, dr_ref, di_ref,
               lr_ref, li_ref, yr_ref, yi_ref, mtr_s, mti_s, sems,
               xr_all, xi_all):
        t = pl.program_id(0)
        b = pl.program_id(1)
        tile = yr_ref.shape[-1]
        step = t * num_b + b

        def dma(bb):
            return (pltpu.make_async_copy(xr_hbm.at[bb], xr_all.at[bb],
                                          sems.at[bb, 0]),
                    pltpu.make_async_copy(xi_hbm.at[bb], xi_all.at[bb],
                                          sems.at[bb, 1]))

        @pl.when(step == 0)
        def _():
            for bb in range(num_b):      # static unroll: start all buffers
                r, i = dma(bb)
                r.start()
                i.start()

        @pl.when(t == 0)
        def _():
            r, i = dma(b)                # wait this beam's buffers once
            r.wait()
            i.wait()

        xr = xr_all[b, :, pl.ds(t * tile, window)]
        xi = xi_all[b, :, pl.ds(t * tile, window)]
        mpr = mpr_ref[:]
        mpi = mpi_ref[:]
        f32 = jnp.float32
        pcr = (jnp.dot(xr, mpr, preferred_element_type=f32)
               - jnp.dot(xi, mpi, preferred_element_type=f32))
        pci = (jnp.dot(xr, mpi, preferred_element_type=f32)
               + jnp.dot(xi, mpr, preferred_element_type=f32))
        pcr16 = pcr.astype(mul_dtype)
        pci16 = pci.astype(mul_dtype)
        dr = dr_ref[:]
        di = di_ref[:]
        mtr_s[b] = (jnp.dot(dr, pcr16, preferred_element_type=f32)
                    - jnp.dot(di, pci16, preferred_element_type=f32)
                    ).astype(mul_dtype)
        mti_s[b] = (jnp.dot(dr, pci16, preferred_element_type=f32)
                    + jnp.dot(di, pcr16, preferred_element_type=f32)
                    ).astype(mul_dtype)

        @pl.when(b == num_b - 1)
        def _():
            lr = lr_ref[:]
            li = li_ref[:]
            mtr = mtr_s[:]
            mti = mti_s[:]
            dn = (((1,), (0,)), ((), ()))
            rr = jax.lax.dot_general(lr, mtr, dn, preferred_element_type=f32)
            ri = jax.lax.dot_general(lr, mti, dn, preferred_element_type=f32)
            ir = jax.lax.dot_general(li, mtr, dn, preferred_element_type=f32)
            ii = jax.lax.dot_general(li, mti, dn, preferred_element_type=f32)
            yr_ref[...] = (rr - ii).astype(out_dtype)
            yi_ref[...] = (ri + ir).astype(out_dtype)

    return kernel


def _make_kernel_stacked(p_pad: int, v_pad: int, window: int, num_b: int,
                         buf_len: int, mul_dtype):
    """Resident per-beam buffers (see _make_kernel_resident) plus stacked
    dots: the four real PC matmuls collapse into ONE
    [2*p_pad, window] x [window, 2*tile] dot (re/im planes stacked on M,
    mpr|mpi stacked on N), the four MTD matmuls into ONE
    [2*v_pad, p_pad] x [p_pad, 2*tile] dot, and the beam mix into TWO
    dot_generals. Same per-element inner products — the win is ~4x fewer
    MXU issue slots, which the ablation showed dominate
    (results/rdm_ablation.json: compute ~0.6 ms of a 1.5 ms kernel)."""
    def kernel(xr_hbm, xi_hbm, mp_ref, d2_ref, lr_ref, li_ref,
               yr_ref, yi_ref, mt_s, sems, x_all):
        t = pl.program_id(0)
        b = pl.program_id(1)
        tile = yr_ref.shape[-1]
        step = t * num_b + b

        def dma(bb):
            return (pltpu.make_async_copy(xr_hbm.at[bb], x_all.at[0, bb],
                                          sems.at[bb, 0]),
                    pltpu.make_async_copy(xi_hbm.at[bb], x_all.at[1, bb],
                                          sems.at[bb, 1]))

        @pl.when(step == 0)
        def _():
            for bb in range(num_b):
                r, i = dma(bb)
                r.start()
                i.start()

        @pl.when(t == 0)
        def _():
            r, i = dma(b)
            r.wait()
            i.wait()

        f32 = jnp.float32
        xw = x_all[:, b, :, pl.ds(t * tile, window)]      # [2, P, W]
        x2 = xw.reshape(2 * p_pad, window)
        r = jnp.dot(x2, mp_ref[:], preferred_element_type=f32)  # [2P, 2T]
        pcr = (r[:p_pad, :tile] - r[p_pad:, tile:]).astype(mul_dtype)
        pci = (r[:p_pad, tile:] + r[p_pad:, :tile]).astype(mul_dtype)
        pc2 = jnp.concatenate([pcr, pci], axis=1)         # [P, 2T]
        r2 = jnp.dot(d2_ref[:], pc2, preferred_element_type=f32)  # [2V, 2T]
        mt_s[b] = jnp.concatenate(
            [r2[:v_pad, :tile] - r2[v_pad:, tile:],
             r2[:v_pad, tile:] + r2[v_pad:, :tile]],
            axis=1).astype(mul_dtype)                     # [V, 2T] = mtr|mti

        @pl.when(b == num_b - 1)
        def _():
            dn = (((1,), (0,)), ((), ()))
            mt = mt_s[:]
            a = jax.lax.dot_general(lr_ref[:], mt, dn,
                                    preferred_element_type=f32)
            c = jax.lax.dot_general(li_ref[:], mt, dn,
                                    preferred_element_type=f32)
            yr_ref[...] = a[:, :, :tile] - c[:, :, tile:]
            yi_ref[...] = a[:, :, tile:] + c[:, :, :tile]

    return kernel


def _call_stacked(seg: RdmSegSpec, xr, xi, plan: RdmPlan, l_np, num_b,
                  ntiles, jpad, mul_dtype, interpret):
    mp = np.concatenate([seg.mpr, seg.mpi], axis=1)       # [W, 2T]
    d2 = np.concatenate([plan.dr, plan.di], axis=0)       # [2V, P]
    buf_len = xr.shape[-1]
    kernel = _make_kernel_stacked(plan.p_pad, plan.v_pad, seg.window,
                                  num_b, buf_len, mul_dtype)
    const_spec = lambda shp: pl.BlockSpec(shp, lambda t, b: (0, 0),
                                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(ntiles, num_b),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            const_spec((seg.window, 2 * seg.tile)),
            const_spec((2 * plan.v_pad, plan.p_pad)),
            const_spec((num_b, num_b)),
            const_spec((num_b, num_b)),
        ],
        out_specs=[
            pl.BlockSpec((num_b, plan.v_pad, seg.tile),
                         lambda t, b: (0, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((num_b, plan.v_pad, seg.tile),
                         lambda t, b: (0, 0, t), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((num_b, plan.v_pad, jpad), jnp.float32),
            jax.ShapeDtypeStruct((num_b, plan.v_pad, jpad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((num_b, plan.v_pad, 2 * seg.tile), mul_dtype),
            pltpu.SemaphoreType.DMA((num_b, 2)),
            pltpu.VMEM((2, num_b, plan.p_pad, buf_len), mul_dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(xr, xi, jnp.asarray(mp, mul_dtype), jnp.asarray(d2, mul_dtype),
      jnp.asarray(np.asarray(l_np).real, mul_dtype),
      jnp.asarray(np.asarray(l_np).imag, mul_dtype))


def _make_kernel_allbeams(p_pad: int, v_pad: int, window: int, num_b: int,
                          mul_dtype):
    """One grid step per gate tile, ALL beams at once: both planes of all
    beams' windows arrive in one DMA and the four real PC matmuls for all
    beams collapse into a single [2*B*p_pad, window] x [window, 2*tile] MXU
    dot (re/im stacked on M and N). Identical arithmetic to _make_kernel —
    every output element is the same inner product — with 13x fewer grid
    steps, 26x fewer DMAs and ~7x fewer Mosaic dot ops."""
    def kernel(xr_hbm, xi_hbm, mp_ref, d2_ref, l2_ref, yr_ref, yi_ref,
               mt_s, sems, x_s):
        t = pl.program_id(0)
        n_t = pl.num_programs(0)
        tile = yr_ref.shape[-1]
        slot = jax.lax.rem(t, jnp.int32(2))
        nslot = 1 - slot

        def dma(s, tt):
            return (pltpu.make_async_copy(
                        xr_hbm.at[:, :, pl.ds(tt * tile, window)],
                        x_s.at[s, 0], sems.at[s, 0]),
                    pltpu.make_async_copy(
                        xi_hbm.at[:, :, pl.ds(tt * tile, window)],
                        x_s.at[s, 1], sems.at[s, 1]))

        @pl.when(t == 0)
        def _():
            r0, i0 = dma(slot, t)
            r0.start()
            i0.start()

        @pl.when(t + 1 < n_t)
        def _():
            rn, in_ = dma(nslot, t + 1)
            rn.start()
            in_.start()

        cur_r, cur_i = dma(slot, t)
        cur_r.wait()
        cur_i.wait()
        f32 = jnp.float32
        half = num_b * p_pad
        x2 = x_s[slot].reshape(2 * half, window)
        r = jnp.dot(x2, mp_ref[:], preferred_element_type=f32)
        pcr = (r[:half, :tile] - r[half:, tile:]).astype(mul_dtype)
        pci = (r[:half, tile:] + r[half:, :tile]).astype(mul_dtype)
        pc2 = jnp.concatenate([pcr, pci], axis=1)     # [B*P, 2T]
        d2 = d2_ref[:]
        for b in range(num_b):                        # static unroll
            rb = jnp.dot(d2, pc2[b * p_pad:(b + 1) * p_pad],
                         preferred_element_type=f32)  # [2V, 2T]
            mt_s[b] = jnp.concatenate(
                [rb[:v_pad, :tile] - rb[v_pad:, tile:],
                 rb[:v_pad, tile:] + rb[v_pad:, :tile]],
                axis=1).astype(mul_dtype)             # [V, 2T] = [mtr|mti]
        dn = (((1,), (0,)), ((), ()))
        m = jax.lax.dot_general(l2_ref[:], mt_s[:], dn,
                                preferred_element_type=f32)  # [2B, V, 2T]
        yr_ref[...] = m[:num_b, :, :tile] - m[num_b:, :, tile:]
        yi_ref[...] = m[:num_b, :, tile:] + m[num_b:, :, :tile]

    return kernel


def segment_buffer_len(seg: RdmSegSpec) -> int:
    """Length of the padded per-segment sample buffer the kernel DMAs from
    (pad_front + r_len + pad_tail)."""
    return seg.pad_front + seg.r_len + seg.pad_tail


def noise_rdm_pallas_planes(xrs, xis, plan: RdmPlan, l_factor,
                            interpret: bool = False,
                            mul_dtype=jnp.bfloat16,
                            variant: str = "beams",
                            out_dtype=jnp.float32,
                            layout: str = "vgb") -> jnp.ndarray:
    """Run the fused PC+MTD+mix kernel on pre-padded per-segment plane
    pairs.

    ``xrs[i]``/``xis[i]``: real/imag planes [beams, p_pad,
    segment_buffer_len(seg_i)] in ``mul_dtype``. The first ``pad_front``
    samples of each buffer MUST be zero (pre-PRT causal history); the
    ``pad_tail`` samples and the pulse rows >= num_pulses may hold anything
    (they only reach gates/Doppler rows that are sliced away — the PC
    matrices' zero rows and the MTD matrix's zero columns, see the
    correctness test in tests/test_pallas_rdm.py).

    Returns the beam-mixed noise RDM complex64: ``layout="vgb"`` gives the
    downstream [V, G, B] layout (the kernel computes beams-major and one
    transposed copy restores it); ``layout="bvg"`` returns the kernel's
    native [B, V, G] layout with no transposed copy (the beams-major
    detection tail, cfg.beams_major_tail)."""
    num_b = xrs[0].shape[0]
    l_np = np.asarray(l_factor)
    lr = jnp.asarray(l_np.real, jnp.float32)
    li = jnp.asarray(l_np.imag, jnp.float32)
    pieces = []
    for seg, xr, xi in zip(plan.segments, xrs, xis):
        ntiles = -(-seg.j_len // seg.tile)
        jpad = ntiles * seg.tile
        if variant in ("allbeams", "stacked"):
            if jnp.dtype(out_dtype) != jnp.dtype(jnp.float32):
                # these ablation variants hardcode f32 output planes; a
                # silently-ignored out_dtype would fake a bf16-planes A/B
                raise ValueError(f"variant {variant!r} implements f32 "
                                 "output planes only")
            call = (_call_allbeams if variant == "allbeams"
                    else _call_stacked)
            yr, yi = call(seg, xr, xi, plan, l_np, num_b, ntiles,
                          jpad, mul_dtype, interpret)
            pieces.append(jax.lax.complex(yr[:, :plan.n_dop, :seg.j_len],
                                          yi[:, :plan.n_dop, :seg.j_len]))
            continue
        buf_len = xr.shape[-1]
        if variant == "resident":
            kernel = _make_kernel_resident(plan.p_pad, plan.v_pad,
                                           seg.window, num_b, buf_len,
                                           mul_dtype, out_dtype)
            x_scratch = [pltpu.VMEM((num_b, plan.p_pad, buf_len), mul_dtype),
                         pltpu.VMEM((num_b, plan.p_pad, buf_len), mul_dtype)]
            dma_sems = pltpu.SemaphoreType.DMA((num_b, 2))
        else:
            kernel = _make_kernel(plan.p_pad, plan.v_pad, seg.window, num_b,
                                  mul_dtype, out_dtype)
            x_scratch = [pltpu.VMEM((2, plan.p_pad, seg.window), mul_dtype),
                         pltpu.VMEM((2, plan.p_pad, seg.window), mul_dtype)]
            dma_sems = pltpu.SemaphoreType.DMA((2, 2))
        const_spec = lambda shp: pl.BlockSpec(shp, lambda t, b: (0, 0),
                                              memory_space=pltpu.VMEM)
        yr, yi = pl.pallas_call(
            kernel,
            grid=(ntiles, num_b),   # beams innermost: out block accumulates
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
                const_spec((seg.window, seg.tile)),
                const_spec((seg.window, seg.tile)),
                const_spec((plan.v_pad, plan.p_pad)),
                const_spec((plan.v_pad, plan.p_pad)),
                const_spec((num_b, num_b)),
                const_spec((num_b, num_b)),
            ],
            out_specs=[
                pl.BlockSpec((num_b, plan.v_pad, seg.tile),
                             lambda t, b: (0, 0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((num_b, plan.v_pad, seg.tile),
                             lambda t, b: (0, 0, t),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((num_b, plan.v_pad, jpad), out_dtype),
                jax.ShapeDtypeStruct((num_b, plan.v_pad, jpad), out_dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((num_b, plan.v_pad, seg.tile), mul_dtype),
                pltpu.VMEM((num_b, plan.v_pad, seg.tile), mul_dtype),
                dma_sems,
            ] + x_scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(xr, xi, jnp.asarray(seg.mpr, mul_dtype),
          jnp.asarray(seg.mpi, mul_dtype),
          jnp.asarray(plan.dr, mul_dtype), jnp.asarray(plan.di, mul_dtype),
          lr.astype(mul_dtype), li.astype(mul_dtype))
        pieces.append(jax.lax.complex(
            yr[:, :plan.n_dop, :seg.j_len].astype(jnp.float32),
            yi[:, :plan.n_dop, :seg.j_len].astype(jnp.float32)))
    bm = jnp.concatenate(pieces, axis=2)          # [B, V, G]
    if layout == "bvg":
        return bm.astype(jnp.complex64)
    return jnp.transpose(bm, (1, 2, 0)).astype(jnp.complex64)


def noise_rdm_pallas_gen(seed, plan: RdmPlan, l_factor,
                         a_scale: float,
                         interpret: bool = False,
                         mul_dtype=jnp.bfloat16,
                         out_dtype=jnp.float32,
                         layout: str = "vgb",
                         beams_per_step: int = 1,
                         rolling: bool = False,
                         signal=None,
                         emit_maps: bool = False,
                         stacked: bool = False,
                         _static_slots: bool = False):
    """Fused PC+MTD+mix kernel with IN-KERNEL white-noise generation: the
    hardware PRNG draws each step's [p_pad, window] uniform window on-core
    (``_make_kernel_gen``), so no white cube ever exists in HBM — the zgen
    stage, its ~45 MB write and the kernel's overlap-amplified window
    reads are all eliminated.

    ``seed``: int32[2] per-frame stream id (from the frame PRNG key);
    draws are keyed (seed, segment, beam, absolute-chunk), giving
    independent streams across frames/segments/beams and bit-identical
    regeneration of overlapping window chunks. ``a_scale``: uniform rail
    half-width (sqrt(1.5) for unit rail variance — the validated
    cfg.noise_dist="uniform" rails). The plan must be built with
    ``lane=128``. Under ``interpret`` (CPU tests) the TPU-semantics
    interpreter runs the kernel functionally and its PRNG produces real
    pseudo-random bits — just not the HARDWARE bit stream, so CPU runs
    check structure and statistics (tests/test_pallas_rdm.py asserts
    nonzero output) while bit-level validation vs the hardware generator
    runs via scripts/validate_rdm_gen.py (results/rdm_gen.json).

    ``signal=(dop_v [K, n_dop], pc_base [K, n_gates], steer [K, num_b])``
    (complex, traced) fuses the rank-K closed-form SIGNAL RDM into the
    kernel's mix tail (requires ``rolling``): the returned cube is the
    COMPLETE RDM — no separate signal einsum or add. Use f32 out_dtype so
    the signal is not bf16-quantized (monopulse precision).

    ``emit_maps`` (requires ``signal``) additionally writes the adjacent-
    beam SUM MAPS from the resident f32 tiles and returns
    ``(rdm, maps [pairs, V, G] f32)`` — the downstream pair_sum_maps pass
    and its full-cube read disappear (cfg.kernel_maps)."""
    num_b = l_factor.shape[0]
    l_np = np.asarray(l_factor)
    lr = jnp.asarray(l_np.real, jnp.float32)
    li = jnp.asarray(l_np.imag, jnp.float32)
    const_spec = lambda shp: pl.BlockSpec(shp, lambda t, b: (0, 0),
                                          memory_space=pltpu.VMEM)
    num_k = 0
    if emit_maps:
        assert signal is not None, "emit_maps requires the fused signal"
    if (stacked or _static_slots) and not rolling:
        # only the rolling kernel implements these ablation variants — a
        # silent ignore would make an A/B time the plain kernel twice
        raise ValueError("stacked/_static_slots require rolling=True")
    if signal is not None:
        assert rolling, "signal fusion is implemented on the rolling kernel"
        dop_v, pc_base, steer = signal
        num_k = dop_v.shape[0]
        k8 = -(-num_k // 8) * 8
        f32 = jnp.float32
        # Doppler columns [v_pad, K8] (K on lanes so dv[:, k] slices to a
        # [v_pad, 1] column with no relayout); zero K/row pads contribute 0
        dv = jnp.pad(dop_v.T, ((0, plan.v_pad - dop_v.shape[1]),
                               (0, k8 - num_k)))
        dvr, dvi = jnp.real(dv).astype(f32), jnp.imag(dv).astype(f32)
        str_ = jnp.pad(jnp.real(steer).astype(f32), ((0, k8 - num_k),
                                                     (0, 0)))
        sti = jnp.pad(jnp.imag(steer).astype(f32), ((0, k8 - num_k),
                                                    (0, 0)))
    g0 = 0
    pieces = []
    map_pieces = []
    for si, seg in enumerate(plan.segments):
        ntiles = -(-seg.j_len // seg.tile)
        jpad = ntiles * seg.tile
        nch = seg.window // 128
        sig_inputs, sig_specs = (), []
        if rolling:
            kernel = _make_kernel_gen_rolling(
                plan.p_pad, plan.v_pad, seg.window, num_b, seg.tile,
                seg.pad_front, float(a_scale), mul_dtype, out_dtype,
                num_k=num_k, emit_maps=emit_maps, stacked=stacked,
                _static_slots=_static_slots)
            nb_steps = 1
            roll_scratch = [
                pltpu.VMEM((num_b, nch, plan.p_pad, 128), mul_dtype),
                pltpu.VMEM((num_b, nch, plan.p_pad, 128), mul_dtype),
            ]
            if num_k:
                pb = jnp.pad(pc_base[:, g0:g0 + seg.j_len],
                             ((0, k8 - num_k), (0, jpad - seg.j_len)))
                sig_inputs = (dvr, dvi,
                              jnp.real(pb).astype(jnp.float32),
                              jnp.imag(pb).astype(jnp.float32),
                              str_, sti)
                sig_specs = [
                    const_spec((plan.v_pad, k8)),
                    const_spec((plan.v_pad, k8)),
                    pl.BlockSpec((k8, seg.tile), lambda t, b: (0, t),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((k8, seg.tile), lambda t, b: (0, t),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ]
        else:
            kernel = _make_kernel_gen(plan.p_pad, plan.v_pad, seg.window,
                                      num_b, seg.tile, seg.pad_front,
                                      float(a_scale), mul_dtype, out_dtype,
                                      beams_per_step=beams_per_step)
            nb_steps = -(-num_b // beams_per_step)
            roll_scratch = []
        h = (si * -1640531527) & 0xFFFFFFFF   # static int32 wraparound
        seeds = jnp.asarray(seed, jnp.int32).reshape(2).at[0].add(
            np.int32(h - (1 << 32) if h >= (1 << 31) else h))
        maps_specs, maps_shapes = [], []
        if emit_maps:
            maps_specs = [pl.BlockSpec((num_b - 1, plan.v_pad, seg.tile),
                                       lambda t, b: (0, 0, t),
                                       memory_space=pltpu.VMEM)]
            maps_shapes = [jax.ShapeDtypeStruct(
                (num_b - 1, plan.v_pad, jpad), jnp.float32)]
        if stacked and rolling:
            # MP2=[mpr|mpi], D2=[dr;di]; mpi/di slots hold placeholders
            mat_inputs = (jnp.asarray(
                              np.concatenate([seg.mpr, seg.mpi], axis=1),
                              mul_dtype),
                          jnp.zeros((8, 128), mul_dtype),
                          jnp.asarray(
                              np.concatenate([plan.dr, plan.di], axis=0),
                              mul_dtype),
                          jnp.zeros((8, 128), mul_dtype))
            mat_specs = [const_spec((seg.window, 2 * seg.tile)),
                         const_spec((8, 128)),
                         const_spec((2 * plan.v_pad, plan.p_pad)),
                         const_spec((8, 128))]
        else:
            mat_inputs = (jnp.asarray(seg.mpr, mul_dtype),
                          jnp.asarray(seg.mpi, mul_dtype),
                          jnp.asarray(plan.dr, mul_dtype),
                          jnp.asarray(plan.di, mul_dtype))
            mat_specs = [const_spec((seg.window, seg.tile)),
                         const_spec((seg.window, seg.tile)),
                         const_spec((plan.v_pad, plan.p_pad)),
                         const_spec((plan.v_pad, plan.p_pad))]
        outs = pl.pallas_call(
            kernel,
            # beams innermost: out block accumulates across beam steps
            grid=(ntiles, nb_steps),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ] + mat_specs + [
                const_spec((num_b, num_b)),
                const_spec((num_b, num_b)),
            ] + sig_specs,
            out_specs=[
                pl.BlockSpec((num_b, plan.v_pad, seg.tile),
                             lambda t, b: (0, 0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((num_b, plan.v_pad, seg.tile),
                             lambda t, b: (0, 0, t),
                             memory_space=pltpu.VMEM),
            ] + maps_specs,
            out_shape=[
                jax.ShapeDtypeStruct((num_b, plan.v_pad, jpad), out_dtype),
                jax.ShapeDtypeStruct((num_b, plan.v_pad, jpad), out_dtype),
            ] + maps_shapes,
            scratch_shapes=[
                pltpu.VMEM((num_b, plan.v_pad, seg.tile), mul_dtype),
                pltpu.VMEM((num_b, plan.v_pad, seg.tile), mul_dtype),
            ] + roll_scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=pltpu.InterpretParams() if interpret else False,
        )(seeds, *mat_inputs,
          lr.astype(mul_dtype), li.astype(mul_dtype), *sig_inputs)
        yr, yi = outs[0], outs[1]
        if emit_maps:
            map_pieces.append(outs[2][:, :plan.n_dop, :seg.j_len])
        pieces.append(jax.lax.complex(
            yr[:, :plan.n_dop, :seg.j_len].astype(jnp.float32),
            yi[:, :plan.n_dop, :seg.j_len].astype(jnp.float32)))
        g0 += seg.j_len
    bm = jnp.concatenate(pieces, axis=2)          # [B, V, G]
    rdm = (bm.astype(jnp.complex64) if layout == "bvg"
           else jnp.transpose(bm, (1, 2, 0)).astype(jnp.complex64))
    if emit_maps:
        return rdm, jnp.concatenate(map_pieces, axis=2)  # maps [Q, V, G]
    return rdm


def gen_noise_planes_pallas(seed, plan: RdmPlan, num_b: int,
                            a_scale: float,
                            interpret: bool = False,
                            mul_dtype=jnp.bfloat16):
    """Debug twin of ``noise_rdm_pallas_gen``'s draw stage: exports the
    exact planes the in-kernel generator produces (same seeding, same
    chunk addressing, same bf16 cast), padded to ``segment_buffer_len``,
    so the DMA-path kernel can be fed the SAME noise — the bit-level
    equivalence check between the two kernels on real hardware."""
    planes = []
    for si, seg in enumerate(plan.segments):
        ntiles = -(-seg.j_len // seg.tile)
        xlen = (ntiles - 1) * seg.tile + seg.window   # samples windows read
        nch = xlen // 128

        def kernel(seed_ref, yr_ref, yi_ref, *, pad_front=seg.pad_front):
            c = pl.program_id(0)
            b = pl.program_id(1)
            ur, ui = _draw_uniform_chunk(seed_ref, b, c, plan.p_pad,
                                         pad_front, float(a_scale))
            yr_ref[...] = ur.astype(mul_dtype)[None]
            yi_ref[...] = ui.astype(mul_dtype)[None]

        h = (si * -1640531527) & 0xFFFFFFFF   # static int32 wraparound
        seeds = jnp.asarray(seed, jnp.int32).reshape(2).at[0].add(
            np.int32(h - (1 << 32) if h >= (1 << 31) else h))
        yr, yi = pl.pallas_call(
            kernel,
            grid=(nch, num_b),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=[
                pl.BlockSpec((1, plan.p_pad, 128), lambda c, b: (b, 0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, plan.p_pad, 128), lambda c, b: (b, 0, c),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((num_b, plan.p_pad, xlen), mul_dtype),
                jax.ShapeDtypeStruct((num_b, plan.p_pad, xlen), mul_dtype),
            ],
            interpret=pltpu.InterpretParams() if interpret else False,
        )(seeds)
        buf = segment_buffer_len(seg)
        if buf > xlen:   # trailing samples no window reads: value irrelevant
            yr = jnp.pad(yr, ((0, 0), (0, 0), (0, buf - xlen)))
            yi = jnp.pad(yi, ((0, 0), (0, 0), (0, buf - xlen)))
        planes.append((yr, yi))
    return [p[0] for p in planes], [p[1] for p in planes]


def _call_allbeams(seg: RdmSegSpec, xr, xi, plan: RdmPlan, l_np, num_b,
                   ntiles, jpad, mul_dtype, interpret):
    """pallas_call wrapper for the all-beams kernel: stacked constant
    matrices MP=[mpr|mpi], D2=[dr;di], L2=[lr;li] and a single
    [2, 2, B, p_pad, window] double-buffered window scratch."""
    mp = np.concatenate([seg.mpr, seg.mpi], axis=1)       # [W, 2T]
    d2 = np.concatenate([plan.dr, plan.di], axis=0)       # [2V, P]
    l2 = np.concatenate([l_np.real, l_np.imag], axis=0)   # [2B, B]
    kernel = _make_kernel_allbeams(plan.p_pad, plan.v_pad, seg.window,
                                   num_b, mul_dtype)
    const_spec = lambda shp: pl.BlockSpec(shp, lambda t: (0, 0),
                                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            const_spec((seg.window, 2 * seg.tile)),
            const_spec((2 * plan.v_pad, plan.p_pad)),
            const_spec((2 * num_b, num_b)),
        ],
        out_specs=[
            pl.BlockSpec((num_b, plan.v_pad, seg.tile), lambda t: (0, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_b, plan.v_pad, seg.tile), lambda t: (0, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((num_b, plan.v_pad, jpad), jnp.float32),
            jax.ShapeDtypeStruct((num_b, plan.v_pad, jpad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((num_b, plan.v_pad, 2 * seg.tile), mul_dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.VMEM((2, 2, num_b, plan.p_pad, seg.window), mul_dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(xr, xi, jnp.asarray(mp, mul_dtype), jnp.asarray(d2, mul_dtype),
      jnp.asarray(l2, mul_dtype))


def noise_rdm_pallas(z: jnp.ndarray, plan: RdmPlan, l_factor,
                     interpret: bool = False,
                     mul_dtype=jnp.bfloat16,
                     variant: str = "beams") -> jnp.ndarray:
    """White compact noise z [beams, pulses, s_compact] complex ->
    beam-mixed noise RDM [n_dop, gates, beams] complex64.

    Slices the compact cube into the per-segment padded plane pairs and
    delegates to :func:`noise_rdm_pallas_planes`. The pipeline's perf path
    generates the plane pairs directly instead (pipeline/lowrank.py) —
    skipping the complex cube, the slice/pad copies and the bf16 casts;
    this entry point is kept for bit-level A/B against the XLA chain."""
    num_b, num_p, s_c = z.shape
    assert s_c == plan.s_compact, (s_c, plan.s_compact)
    zr = jnp.real(z).astype(mul_dtype)
    zi = jnp.imag(z).astype(mul_dtype)
    xrs, xis = [], []
    for seg in plan.segments:
        pad = ((0, 0), (0, plan.p_pad - num_p),
               (seg.pad_front, seg.pad_tail))
        xrs.append(jnp.pad(zr[:, :, seg.c0:seg.c0 + seg.r_len], pad))
        xis.append(jnp.pad(zi[:, :, seg.c0:seg.c0 + seg.r_len], pad))
    return noise_rdm_pallas_planes(xrs, xis, plan, l_factor,
                                   interpret=interpret, mul_dtype=mul_dtype,
                                   variant=variant)
