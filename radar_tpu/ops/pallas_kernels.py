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


def _check_window_fits_halo(params: CfarParams) -> None:
    """The kernels' gate halo and Doppler shift reach are sized by HALO;
    a wider CFAR window would read zero fill and silently understate the
    noise estimate at tile boundaries (vs the bit-identical promise
    against ops/cfar.py) — refuse it loudly. CfarParams is public, so
    this is a real input class, not a degenerate one."""
    border_r = params.ref_cells_r + params.guard_cells_r
    border_v = params.ref_cells_v + params.guard_cells_v
    if border_r > HALO or border_v > HALO:
        raise ValueError(
            f"CFAR window ref+guard (r={border_r}, v={border_v}) exceeds "
            f"the Pallas kernels' HALO={HALO}; use the ops/cfar.py XLA "
            "path for windows this wide")


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
    if method == "CA":
        return 0.5 * (lead + trail)
    # validate like ops/cfar.py — a typo must not silently become CA
    raise ValueError(f"unknown CFAR method: {method}")


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


def _cfar_maps_kernel(maps_hbm, mask_ref, rc_ref, scr, sem, *,
                      params: CfarParams, num_gates: int, num_v_real: int,
                      tile: int):
    """Per-(pair, gate-tile) CFAR on pre-summed qvg maps.

    maps_hbm: [Q, V, G_padded] with ``HALO`` zero columns on the left and
    zero fill on the right — the zero boundary semantics of the jnp
    formulation (ops/cfar.py::_shifted) hold exactly, so the mask is
    bit-identical (same fp add order as lead_trail_means). Emits the bool
    mask tile and its per-gate detection row counts (the first-K
    extraction's row_counts reduction, fused here instead of re-reading
    the mask from HBM)."""
    q = pl.program_id(0)
    j = pl.program_id(1)
    start = j * tile  # window [start, start + tile + 2*HALO) in padded G

    copy = pltpu.make_async_copy(
        maps_hbm.at[q, :, pl.ds(start, tile + 2 * HALO)], scr, sem)
    copy.start()
    copy.wait()

    x = scr[...]  # [V, tile+2H] pair-sum window

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
    # un-padded global gate index of each window column; Doppler rows past
    # num_v_real are sublane padding and always invalid
    col = (jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
           + start - HALO)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    valid = ((col >= border_r) & (col < num_gates - border_r)
             & (row >= border_v) & (row < num_v_real - border_v))

    hit = (x > threshold) & valid
    center = hit[:, HALO:HALO + tile]
    mask_ref[0] = center
    # rc block is (1, 8, tile): Mosaic requires a sublane-multiple block,
    # so the [tile] count vector is broadcast across 8 sublanes (1.4 MB
    # total at full size); the caller keeps row 0
    rc_ref[0] = jnp.broadcast_to(
        jnp.sum(center.astype(jnp.int32), axis=0, keepdims=True), (8, tile))


@functools.partial(jax.jit, static_argnames=("params", "num_gates",
                                             "num_v", "interpret"))
def goca_cfar_qvg_pallas(maps_padded: jnp.ndarray, params: CfarParams,
                         num_gates: int, num_v: int,
                         interpret: bool = False):
    """2D GOCA-CFAR over qvg pair-sum maps, mask + row counts out.

    maps_padded: [pairs, V_pad, G_pad] real sum maps whose gate axis
    carries ``HALO`` zero columns on the left and zero fill up to
    ``HALO + n_tiles*GATE_TILE + HALO`` on the right, and whose Doppler
    axis is zero-filled to a sublane multiple (build with
    :func:`pad_maps_qvg`). ``num_v`` is the real Doppler bin count.
    Returns

      - mask  bool  [pairs, V, n_tiles*GATE_TILE] — bit-identical to
        ``goca_cfar_2d(maps, params, layout="qvg")[0]`` on the un-padded
        gate range (padded columns are always False),
      - rc    int32 [pairs, n_tiles*GATE_TILE] — per-(pair, gate) True
        counts, i.e. exactly the ``row_counts`` reduction of
        ops.cfar.first_k_true_beams_major(layout="qvg").

    Unlike :func:`goca_cfar_2d_pallas` there is no input transpose, no
    output relayout, and no dead threshold write — the kernel reads each
    map cell ~(1 + 2*HALO/GATE_TILE)x and writes only the 1-byte mask, so
    it is traffic-bound near the maps-read floor. Measured e2e it is
    still a 14% LOSS vs the XLA shift-add default (2.76 vs 2.38 ms/frame,
    results/pallas_cfar_ab.json): forcing the detection tail into the
    qvg layout costs more in downstream relayouts than the kernel saves —
    ships as the ``use_pallas_cfar`` variant, default off.
    Reference semantics: fun_process_single_frame.m:192-213.
    """
    n_pairs, v_padded, g_pad = maps_padded.shape
    n_tiles = (g_pad - 2 * HALO) // GATE_TILE
    assert g_pad == n_tiles * GATE_TILE + 2 * HALO and v_padded % 8 == 0, \
        "pad maps with pad_maps_qvg()"
    _check_window_fits_halo(params)
    kernel = functools.partial(_cfar_maps_kernel, params=params,
                               num_gates=num_gates, num_v_real=num_v,
                               tile=GATE_TILE)
    mask, rc = pl.pallas_call(
        kernel,
        grid=(n_pairs, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, v_padded, GATE_TILE), lambda q, j: (q, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, GATE_TILE), lambda q, j: (q, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pairs, v_padded, n_tiles * GATE_TILE),
                                 jnp.bool_),
            jax.ShapeDtypeStruct((n_pairs, 8, n_tiles * GATE_TILE),
                                 jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((v_padded, GATE_TILE + 2 * HALO), maps_padded.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(maps_padded)
    return mask[:, :num_v, :], rc[:, 0, :]


def pad_maps_qvg(maps_qvg: jnp.ndarray) -> jnp.ndarray:
    """Zero-pad qvg maps for :func:`goca_cfar_qvg_pallas`: HALO columns on
    the left of the gate axis, fill to HALO + ceil(G/GATE_TILE)*GATE_TILE
    + HALO total, Doppler axis to a sublane multiple. Applied right after
    the elementwise pair-sum producer so XLA fuses the pad into it (one
    write, no copy)."""
    num_v, num_g = maps_qvg.shape[1:]
    n_tiles = -(-num_g // GATE_TILE)
    g_pad = n_tiles * GATE_TILE + 2 * HALO
    v_padded = -(-num_v // 8) * 8
    return jnp.pad(maps_qvg, ((0, 0), (0, v_padded - num_v),
                              (HALO, g_pad - num_g - HALO)))


@functools.partial(jax.jit, static_argnames=("params", "interpret"))
def goca_cfar_2d_pallas(mag: jnp.ndarray, params: CfarParams,
                        interpret: bool = False):
    """Fused pair-sum + 2D GOCA-CFAR.

    mag: real magnitudes [B, V, G] (beam-major: each grid step streams two
    beam planes). Returns (mask bool [V, G, B-1], threshold [V, G, B-1])
    matching ops.cfar.goca_cfar_2d(pair_sum_maps(.)).
    """
    _check_window_fits_halo(params)
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
