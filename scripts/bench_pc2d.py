"""2D-flat noise-chain experiment: generate z as [B,P,S], flatten to
[B*P, S], run the banded-Toeplitz PC as pure 2D matmuls 'rw,wj->rj' (no
13-wide minor axis anywhere), then MTD/mix in beams-major with the final
transpose fused into the mix. Compare against the shipped [P,S,B] chain."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def loop_time(step_fn, n1=5, n2=35):
    def loop(n, k0):
        def body(i, acc):
            return acc + step_fn(jax.random.fold_in(k0, i))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    f = jax.jit(loop)
    for n in (n1, n1):
        float(f(n, jax.random.key(0, impl="rbg")))

    def t(n, s):
        t0 = time.perf_counter()
        float(f(n, jax.random.key(s, impl="rbg")))
        return time.perf_counter() - t0

    return (min(t(n2, 1), t(n2, 2)) - min(t(n1, 3), t(n1, 4))) / (n2 - n1)


def main():
    from radar_tpu.config.params import full_config
    from radar_tpu.ops.mtd import make_mtd_matrix
    from radar_tpu.ops.precision import einsum_complex_bf16
    from radar_tpu.ops.pulse_compression import (compact_noise_plan,
                                                 make_matmul_plan)
    from radar_tpu.waveform.precompute import precompute

    cfg = full_config()
    pre = precompute(cfg)
    nplan, nlen = compact_noise_plan(make_matmul_plan(pre))
    mtd_m = make_mtd_matrix(pre.mtd_win, cfg.sig.prt_num, None)
    P, B = cfg.sig.prt_num, cfg.sig.beam_num
    rng = np.random.default_rng(0)
    l_np = ((rng.normal(size=(B, B)) + 1j * rng.normal(size=(B, B)))
            * 0.1).astype(np.complex64)

    def white(key, shape):
        g = jax.random.normal(key, shape + (2,), jnp.float32)
        return (g[..., 0] + 1j * g[..., 1]) * np.float32(0.70710678)

    def current(key):  # shipped: [P, S, B]
        z = white(key, (P, nlen, B))
        pieces = []
        for w0, wlen, m in nplan.chunks:
            seg = jax.lax.slice_in_dim(z, w0, w0 + wlen, axis=1)
            pieces.append(einsum_complex_bf16("pwb,wj->pjb", seg,
                                              jnp.asarray(m)))
        pcz = jnp.concatenate(pieces, axis=1)
        rdmz = einsum_complex_bf16("vp,pjb->vjb", jnp.asarray(mtd_m), pcz)
        rdm = jnp.einsum("vjb,cb->vjc", rdmz, jnp.asarray(l_np),
                         preferred_element_type=jnp.complex64)
        return jnp.sum(jnp.abs(rdm))

    def flat2d(key):  # [B*P, S] all the way
        z = white(key, (B * P, nlen))
        pieces = []
        for w0, wlen, m in nplan.chunks:
            seg = jax.lax.slice_in_dim(z, w0, w0 + wlen, axis=1)
            pieces.append(einsum_complex_bf16("rw,wj->rj", seg,
                                              jnp.asarray(m)))
        pcz = jnp.concatenate(pieces, axis=1).reshape(B, P, -1)
        rdmz = einsum_complex_bf16("vp,bpj->bvj", jnp.asarray(mtd_m), pcz)
        rdm = jnp.einsum("cb,bvj->vjc", jnp.asarray(l_np), rdmz,
                         preferred_element_type=jnp.complex64)
        return jnp.sum(jnp.abs(rdm))

    out = {}
    for name, fn in (("chain_PSB", current), ("chain_flat2d", flat2d)):
        out[name] = round(1e3 * loop_time(fn), 3)
        print(json.dumps({name: out[name]}))
    print(json.dumps(out))


def pallas_variant():
    """Appends a pallas-PC chain timing (invoked via --pallas)."""
    from radar_tpu.config.params import full_config
    from radar_tpu.ops.mtd import make_mtd_matrix
    from radar_tpu.studies.pallas_pc import (make_pallas_pc_plan,
                                         pulse_compress_noise_pallas)
    from radar_tpu.ops.precision import einsum_complex_bf16
    from radar_tpu.waveform.precompute import precompute

    cfg = full_config()
    pre = precompute(cfg)
    pplan = make_pallas_pc_plan(pre)
    mtd_m = make_mtd_matrix(pre.mtd_win, cfg.sig.prt_num, None)
    P, B = cfg.sig.prt_num, cfg.sig.beam_num
    rng = np.random.default_rng(0)
    l_np = ((rng.normal(size=(B, B)) + 1j * rng.normal(size=(B, B)))
            * 0.1).astype(np.complex64)

    def white(key, shape):
        g = jax.random.normal(key, shape + (2,), jnp.float32)
        return (g[..., 0] + 1j * g[..., 1]) * np.float32(0.70710678)

    def chain(key):
        z = white(key, (B, P, pplan.s_compact))
        pcz = pulse_compress_noise_pallas(z, pplan)     # [B,P,J]
        rdmz = einsum_complex_bf16("vp,bpj->bvj", jnp.asarray(mtd_m), pcz)
        rdm = jnp.einsum("cb,bvj->vjc", jnp.asarray(l_np), rdmz,
                         preferred_element_type=jnp.complex64)
        return jnp.sum(jnp.abs(rdm))

    dt = loop_time(chain)
    print(json.dumps({"chain_pallas_pc": round(1e3 * dt, 3)}))


if __name__ == "__main__":
    if "--pallas" in sys.argv:
        pallas_variant()
    else:
        main()
