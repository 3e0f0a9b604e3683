"""Distributed-Pallas ring primitives: the remote-DMA halo exchange for
range-sharded overlap-save pulse compression (SURVEY.md section 5.8; the
SNIPPETS right-permute pattern from the public JAX distributed-Pallas
tutorial).

The GSPMD/`jax.lax.ppermute` halo (parallel/collectives.py:
pulse_compress_range_sharded) is functionally complete; this module is the
hand-scheduled ICI counterpart the blueprint names as the first-class
communication backend: each shard pushes its trailing ``halo`` fast-time
samples directly into its right neighbor's receive buffer with
``pltpu.make_async_remote_copy`` — one RDMA per device per frame, no
XLA-inserted collective, and the send can overlap local compute in fused
kernels that build on it.

Reference counterpart: none (the reference is one MATLAB process; its only
parallel boundary is the parfor at main_plot_snr_vs_angle_error.m:167).
The halo semantics mirror the overlap-save requirement of the segmented
pulse compression (fun_process_single_frame.m:114-120): each range shard
needs the previous shard's last ``len(h)-1`` samples to seed the causal
convolution.

Validated in TPU-interpret mode on the 8-virtual-CPU mesh against the
ppermute version (tests/test_pallas_ring.py) — single-chip hardware cannot
exercise a multi-device ring, which is exactly why the interpret path is
the contract here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P


def _halo_kernel(axis_names: tuple, n_devices: int, halo: int, axis: str,
                 x_ref, out_ref, send_sem, recv_sem):
    """Send my trailing ``halo`` columns to my right ring neighbor's
    ``out_ref``; wait for my own receive. Shard 0's received wraparound
    halo is garbage by construction (the causal edge) — the wrapper zeroes
    it. Uniform ring traffic keeps the semaphore accounting identical on
    every device (each sends one message and receives one). MESH device
    ids are full coordinate tuples: every non-ring axis keeps my own
    coordinate."""
    my_id = lax.axis_index(axis)
    right = lax.rem(my_id + jnp.int32(1), jnp.int32(n_devices))
    coords = tuple(right if a == axis else lax.axis_index(a)
                   for a in axis_names)
    s = x_ref.shape[-1]
    rdma = pltpu.make_async_remote_copy(
        src_ref=x_ref.at[:, pl.ds(s - halo, halo)],
        dst_ref=out_ref,
        send_sem=send_sem,
        recv_sem=recv_sem,
        device_id=coords,
        device_id_type=pltpu.DeviceIdType.MESH,
    )
    rdma.start()
    rdma.wait()


def halo_right_permute(mesh: Mesh, rows: int, s_local: int, halo: int,
                       axis: str = "cpi", dtype=jnp.float32,
                       interpret: bool = False):
    """Build the per-shard halo-exchange op for use INSIDE shard_map.

    Returns ``f(x_local [rows, s_local]) -> halo_left [rows, halo]``: the
    trailing ``halo`` columns of the LEFT neighbor (zeros on shard 0 —
    the causal edge), delivered by one remote DMA per device. Real dtypes
    only (complex rides as stacked re/im planes; TPU complex64 is planar
    so the split is free)."""
    n = mesh.shape[axis]
    kernel = functools.partial(_halo_kernel, tuple(mesh.axis_names), n,
                               halo, axis)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, halo), dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(collective_id=0,
                                             has_side_effects=True),
        interpret=(pltpu.InterpretParams() if interpret else False),
    )

    def exchange(x_local):
        h = call(x_local)
        # shard 0 received shard n-1's wraparound halo: causal edge = zeros
        first = lax.axis_index(axis) == 0
        return jnp.where(first, jnp.zeros_like(h), h)

    return exchange


def halo_exchange_complex(mesh: Mesh, x_local: jnp.ndarray, halo: int,
                          axis: str = "cpi", interpret: bool = False
                          ) -> jnp.ndarray:
    """Trace-time convenience for use INSIDE an existing shard_map body:
    the left neighbor's trailing ``halo`` fast-time samples of a complex
    local block [rows, s_local] (zeros on shard 0), with the re/im planes
    riding one stacked [2*rows, halo] f32 remote DMA (TPU complex64 is
    planar, so the split/reassembly is free)."""
    rows, s_local = x_local.shape
    exchange = halo_right_permute(mesh, 2 * rows, s_local, halo,
                                  axis=axis, dtype=jnp.float32,
                                  interpret=interpret)
    planes = jnp.concatenate([jnp.real(x_local), jnp.imag(x_local)],
                             axis=0).astype(jnp.float32)
    hp = exchange(planes)
    return lax.complex(hp[:rows], hp[rows:]).astype(x_local.dtype)
