"""Pallas TPU kernels for the hot detection ops (SURVEY.md section 7.3
step 7).

``goca_cfar_2d_pallas`` fuses, per beam pair, the adjacent-beam magnitude
sum (fun_process_single_frame.m:184-187) with the full 2D GOCA-CFAR
(ref :192-213) into one pass:

  - grid = (beam pairs, gate tiles); each program manually DMAs a
    halo-extended [V, TILE+2*HALO] window of its two beam planes from HBM
    into VMEM scratch (overlapping windows are not expressible with standard
    BlockSpec blocking, so the input stays in HBM/ANY and the kernel slices
    it with pl.ds)
  - the 4*ref shifted-window adds along range and Doppler, the GO/SO/CA
    combines, the threshold compare and the border mask all run on the VPU
    with no HBM round trips between them
  - the gate axis is zero-padded by HALO on both sides on the host, so the
    zero-fill boundary semantics of the jnp formulation (ops/cfar.py) are
    preserved exactly and every DMA window is in bounds

Results are bit-identical to the jnp reference path (same fp add order).
On CPU the kernel runs in interpreter mode for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config.params import CfarParams

HALO = 128          # >= ref+guard of any shipped config; lane-aligned
GATE_TILE = 512


def _shift2d(x: jnp.ndarray, k: int, axis: int) -> jnp.ndarray:
    """x[i-k] along axis with zero fill, for a 2D block value."""
    v, g = x.shape
    zeros_shape = (abs(k), g) if axis == 0 else (v, abs(k))
    z = jnp.zeros(zeros_shape, x.dtype)
    if axis == 0:
        if k > 0:
            return jnp.concatenate([z, x[:v - k, :]], axis=0)
        return jnp.concatenate([x[-k:, :], z], axis=0)
    if k > 0:
        return jnp.concatenate([z, x[:, :g - k]], axis=1)
    return jnp.concatenate([x[:, -k:], z], axis=1)


def _combine(lead, trail, method: str):
    if method == "GOCA":
        return jnp.maximum(lead, trail)
    if method == "SOCA":
        return jnp.minimum(lead, trail)
    return 0.5 * (lead + trail)


def _cfar_kernel(mag_hbm, mask_ref, thr_ref, scr_a, scr_b, sem_a, sem_b, *,
                 params: CfarParams, num_gates: int, num_v_real: int):
    p = pl.program_id(0)
    j = pl.program_id(1)
    start = j * GATE_TILE  # window [start, start + TILE + 2*HALO) in padded G

    copy_a = pltpu.make_async_copy(
        mag_hbm.at[p, :, pl.ds(start, GATE_TILE + 2 * HALO)], scr_a, sem_a)
    copy_b = pltpu.make_async_copy(
        mag_hbm.at[p + 1, :, pl.ds(start, GATE_TILE + 2 * HALO)], scr_b,
        sem_b)
    copy_a.start()
    copy_b.start()
    copy_a.wait()
    copy_b.wait()

    x = scr_a[...] + scr_b[...]  # [V, TILE+2H] pair-sum window

    lead_r = jnp.zeros_like(x)
    trail_r = jnp.zeros_like(x)
    for k in range(params.guard_cells_r + 1,
                   params.guard_cells_r + params.ref_cells_r + 1):
        lead_r = lead_r + _shift2d(x, k, axis=1)
        trail_r = trail_r + _shift2d(x, -k, axis=1)
    noise_r = _combine(lead_r / params.ref_cells_r,
                       trail_r / params.ref_cells_r, params.method)

    lead_v = jnp.zeros_like(x)
    trail_v = jnp.zeros_like(x)
    for k in range(params.guard_cells_v + 1,
                   params.guard_cells_v + params.ref_cells_v + 1):
        lead_v = lead_v + _shift2d(x, k, axis=0)
        trail_v = trail_v + _shift2d(x, -k, axis=0)
    noise_v = _combine(lead_v / params.ref_cells_v,
                       trail_v / params.ref_cells_v, params.method)

    threshold = params.threshold_factor * jnp.maximum(noise_r, noise_v)

    border_r = params.ref_cells_r + params.guard_cells_r
    border_v = params.ref_cells_v + params.guard_cells_v
    # global gate index of each column in the un-padded map; Doppler rows
    # beyond num_v_real are sublane padding and always invalid
    col = (jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
           + start - HALO)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    valid = ((col >= border_r) & (col < num_gates - border_r)
             & (row >= border_v) & (row < num_v_real - border_v))

    # write the tile-aligned center of the halo-extended window
    mask_ref[0] = ((x > threshold) & valid)[:, HALO:HALO + GATE_TILE]
    thr_ref[0] = threshold[:, HALO:HALO + GATE_TILE]


@functools.partial(jax.jit, static_argnames=("params", "interpret"))
def goca_cfar_2d_pallas(mag: jnp.ndarray, params: CfarParams,
                        interpret: bool = False):
    """Fused pair-sum + 2D GOCA-CFAR.

    mag: real magnitudes [B, V, G] (beam-major: each grid step streams two
    beam planes). Returns (mask bool [V, G, B-1], threshold [V, G, B-1])
    matching ops.cfar.goca_cfar_2d(pair_sum_maps(.)).
    """
    num_beams, num_v, num_g = mag.shape
    n_pairs = num_beams - 1
    n_tiles = pl.cdiv(num_g, GATE_TILE)
    g_padded = n_tiles * GATE_TILE + 2 * HALO
    v_padded = -(-num_v // 8) * 8  # sublane-align the Doppler axis
    magp = jnp.pad(mag, ((0, 0), (0, v_padded - num_v),
                         (HALO, g_padded - num_g - HALO)))
    kernel = functools.partial(_cfar_kernel, params=params,
                               num_gates=num_g, num_v_real=num_v)
    mask, thr = pl.pallas_call(
        kernel,
        grid=(n_pairs, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, v_padded, GATE_TILE), lambda p, j: (p, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, v_padded, GATE_TILE), lambda p, j: (p, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pairs, v_padded, n_tiles * GATE_TILE),
                                 jnp.bool_),
            jax.ShapeDtypeStruct((n_pairs, v_padded, n_tiles * GATE_TILE),
                                 mag.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((v_padded, GATE_TILE + 2 * HALO), mag.dtype),
            pltpu.VMEM((v_padded, GATE_TILE + 2 * HALO), mag.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(magp)
    mask = mask[:, :num_v, :num_g]
    thr = thr[:, :num_v, :num_g]
    return (jnp.transpose(mask, (1, 2, 0)), jnp.transpose(thr, (1, 2, 0)))
