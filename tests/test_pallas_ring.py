"""Distributed-Pallas remote-DMA ring halo exchange
(parallel/pallas_ring.py; SURVEY.md section 5.8 / SNIPPETS right-permute
pattern), validated in TPU-interpret mode on the virtual-CPU mesh against
the ppermute implementation — single-chip hardware cannot run a
multi-device ring, so the interpret path IS the contract for this
component."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from radar_tpu.parallel.collectives import pulse_compress_range_sharded
from radar_tpu.parallel.mesh import make_mesh
from radar_tpu.parallel.pallas_ring import halo_right_permute


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_halo_right_permute_matches_manual(n_shards):
    """The raw f32 ring: shard i's output equals shard i-1's trailing
    columns; shard 0 gets zeros (causal edge)."""
    mesh = make_mesh(cpi=n_shards)
    rows, s_total, halo = 8, 64 * n_shards, 5
    x = np.arange(rows * s_total, dtype=np.float32).reshape(rows, s_total)
    s_local = s_total // n_shards

    def local(xl):
        ex = halo_right_permute(mesh, rows, s_local, halo, axis="cpi",
                                interpret=True)
        return ex(xl)

    f = jax.jit(shard_map(local, mesh=mesh, in_specs=(P(None, "cpi"),),
                          out_specs=P(None, "cpi"), check_vma=False))
    with mesh:
        out = np.asarray(f(jnp.asarray(x)))  # [rows, halo * n_shards]
    for i in range(n_shards):
        got = out[:, i * halo:(i + 1) * halo]
        if i == 0:
            np.testing.assert_array_equal(got, 0.0)
        else:
            want = x[:, i * s_local - halo: i * s_local]
            np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n_shards,lh", [(4, 33), (8, 17)])
def test_rdma_overlap_save_matches_ppermute(n_shards, lh):
    """pulse_compress_range_sharded(halo_impl='rdma') is bit-identical to
    the ppermute implementation (same overlap-save math, different
    transport) — including on a mesh with extra (dp) axes, exercising the
    full MESH coordinate addressing."""
    mesh = make_mesh(dp=8 // n_shards, cpi=n_shards)
    rng = np.random.default_rng(0)
    rows, s = 16, 128 * n_shards
    x = (rng.standard_normal((rows, s))
         + 1j * rng.standard_normal((rows, s))).astype(np.complex64)
    h = rng.standard_normal(lh).astype(np.float32)
    f_pp = pulse_compress_range_sharded(mesh, h, nfft=256, axis="cpi")
    f_rd = pulse_compress_range_sharded(mesh, h, nfft=256, axis="cpi",
                                        halo_impl="rdma", interpret=True)
    with mesh:
        a = np.asarray(f_pp(jnp.asarray(x)))
        b = np.asarray(f_rd(jnp.asarray(x)))
    assert np.max(np.abs(a)) > 0
    np.testing.assert_array_equal(a, b)
