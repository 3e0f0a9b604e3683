"""Pallas banded-convolution pulse compression for the white-noise path.

The XLA banded-Toeplitz formulation (ops/pulse_compression.py) re-slices the
input per chunk and concatenates the outputs — ~3x the HBM floor at frame
size. This kernel owns the windowing: the padded per-segment input stays in
HBM, each grid step DMAs ONE overlapping [pulses, tile+filter-1] window into
VMEM (double-buffered across grid steps), runs the four real bf16 matmuls of
the complex banded product on the MXU with f32 accumulation, and writes its
[pulses, tile] output block — no relayouts, no concatenate pass.

Same arithmetic as pulse_compress_matmul(precision="bf16") up to tile-size
reassociation: a causal linear convolution of each segment (reference
fun_process_single_frame.m:99-127 semantics, zero history at segment start
= MATLAB filter()), spliced to n_total_gate outputs.

STUDY ARTIFACT (measured negative, ROADMAP.md): exact vs the XLA plan and
fully tested (tests/test_pallas.py), but the integrated gen+pc+mtd+mix
chain measured 3.69 ms vs 2.80 for XLA on v5e (no cross-grid-step double
buffering; the [B, pulses, samples] layout it needs is itself ~0.5 ms
worse). Nothing in production calls it — the fused noise-RDM kernel
(ops/pallas_rdm.py) owns the perf path and shares this kernel's
banded-matrix builder (_seg_matrices, which lives there).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.pallas_rdm import _seg_matrices


class SegSpec(NamedTuple):
    c0: int          # segment's first sample in the compact-z layout
    r_len: int       # samples read from compact z
    pad_front: int   # zero history prepended (causal edge)
    pad_tail: int    # zeros appended to reach ntiles*T + W - T
    j_len: int       # true output gates of this segment
    tile: int        # output tile T
    window: int      # input window W = T + L - 1
    mr: np.ndarray   # [W, T] real filter matrix (bf16-ready f32)
    mi: np.ndarray   # [W, T] imag filter matrix


class PallasPCPlan(NamedTuple):
    segments: tuple[SegSpec, ...]
    s_compact: int   # total compact-z samples (== sum of r_len)
    n_gates: int


def make_pallas_pc_plan(precomp, tile: int = 512) -> PallasPCPlan:
    """Per-segment uniform banded plan in a private compact-z layout (the
    concatenation of the three segments' read regions — the same sample
    union as ops.pulse_compression.compact_noise_plan)."""
    g1, g2, _ = precomp.gate_splits
    n_total = precomp.n_total_gate
    fd = precomp.fir_delay
    segs = []
    c0 = 0
    for h, out_lo, out_hi in (
            (np.asarray(precomp.mf_narrow, np.complex128), fd, fd + g1),
            (np.asarray(precomp.mf_medium_win), g1, g1 + g2),
            (np.asarray(precomp.mf_long_win), g1 + g2, n_total)):
        lh = len(h)
        t = min(tile, int(2 ** np.ceil(np.log2(out_hi - out_lo))))
        r0 = max(out_lo - (lh - 1), 0)
        r_len = out_hi - r0
        pad_front = (lh - 1) - (out_lo - r0)
        j_len = out_hi - out_lo
        ntiles = -(-j_len // t)
        w = t + lh - 1
        w_pad = -(-w // 128) * 128          # DMA lane alignment
        xlen_needed = (ntiles - 1) * t + w_pad
        pad_tail = xlen_needed - (pad_front + r_len)
        mr, mi = _seg_matrices(h, t)
        mr = np.pad(mr, ((0, w_pad - w), (0, 0)))
        mi = np.pad(mi, ((0, w_pad - w), (0, 0)))
        w = w_pad
        segs.append(SegSpec(c0=c0, r_len=r_len, pad_front=pad_front,
                            pad_tail=max(pad_tail, 0), j_len=j_len, tile=t,
                            window=w, mr=mr, mi=mi))
        c0 += r_len
    return PallasPCPlan(segments=tuple(segs), s_compact=c0, n_gates=n_total)


def _make_seg_kernel(num_pulses: int, window: int, mul_dtype=jnp.bfloat16):
    def kernel(xr_hbm, xi_hbm, mr_ref, mi_ref, yr_ref, yi_ref):
        b = pl.program_id(0)
        t = pl.program_id(1)
        tile = yr_ref.shape[-1]

        def body(xr_s, xi_s, sems):
            cp_r = pltpu.make_async_copy(
                xr_hbm.at[b, :, pl.ds(t * tile, window)], xr_s, sems.at[0])
            cp_i = pltpu.make_async_copy(
                xi_hbm.at[b, :, pl.ds(t * tile, window)], xi_s, sems.at[1])
            cp_r.start()
            cp_i.start()
            cp_r.wait()
            cp_i.wait()
            xr = xr_s[:]
            xi = xi_s[:]
            mr = mr_ref[:]
            mi = mi_ref[:]
            yr_ref[0] = (
                jnp.dot(xr, mr, preferred_element_type=jnp.float32)
                - jnp.dot(xi, mi, preferred_element_type=jnp.float32))
            yi_ref[0] = (
                jnp.dot(xr, mi, preferred_element_type=jnp.float32)
                + jnp.dot(xi, mr, preferred_element_type=jnp.float32))

        pl.run_scoped(
            body,
            xr_s=pltpu.VMEM((num_pulses, window), mul_dtype),
            xi_s=pltpu.VMEM((num_pulses, window), mul_dtype),
            sems=pltpu.SemaphoreType.DMA((2,)),
        )

    return kernel


def pulse_compress_noise_pallas(z: jnp.ndarray, plan: PallasPCPlan,
                                interpret: bool = False,
                                mul_dtype=jnp.bfloat16) -> jnp.ndarray:
    """White-noise PC: compact z [beams, pulses, s_compact] complex ->
    [beams, pulses, n_gates] complex64. ``mul_dtype`` is the MXU multiply
    dtype (bf16 on TPU; f32 for CPU interpret-mode tests, whose eager dot
    thunk lacks bf16)."""
    num_b, num_p, s_c = z.shape
    assert s_c == plan.s_compact, (s_c, plan.s_compact)
    p_pad = -(-num_p // 16) * 16            # DMA sublane alignment (bf16)
    zr = jnp.real(z).astype(mul_dtype)
    zi = jnp.imag(z).astype(mul_dtype)
    pieces = []
    for seg in plan.segments:
        ntiles = -(-seg.j_len // seg.tile)
        jpad = ntiles * seg.tile
        xr = jnp.pad(zr[:, :, seg.c0:seg.c0 + seg.r_len],
                     ((0, 0), (0, p_pad - num_p),
                      (seg.pad_front, seg.pad_tail)))
        xi = jnp.pad(zi[:, :, seg.c0:seg.c0 + seg.r_len],
                     ((0, 0), (0, p_pad - num_p),
                      (seg.pad_front, seg.pad_tail)))
        kernel = _make_seg_kernel(p_pad, seg.window, mul_dtype)
        yr, yi = pl.pallas_call(
            kernel,
            grid=(num_b, ntiles),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),   # sliced DMA source
                pl.BlockSpec(memory_space=pltpu.HBM),   # sliced DMA source
                pl.BlockSpec((seg.window, seg.tile), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((seg.window, seg.tile), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, p_pad, seg.tile), lambda b, t: (b, 0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, p_pad, seg.tile), lambda b, t: (b, 0, t),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((num_b, p_pad, jpad), jnp.float32),
                jax.ShapeDtypeStruct((num_b, p_pad, jpad), jnp.float32),
            ],
            interpret=interpret,
        )(xr, xi, jnp.asarray(seg.mr, mul_dtype),
          jnp.asarray(seg.mi, mul_dtype))
        pieces.append(jax.lax.complex(yr[:, :num_p, :seg.j_len],
                                      yi[:, :num_p, :seg.j_len]))
    return jnp.concatenate(pieces, axis=2).astype(jnp.complex64)
