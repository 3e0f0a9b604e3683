"""Layout experiment: the lowrank noise chain (white z -> PC -> MTD -> mix)
with beams-minor [P,S,B] (current) vs beams-major [B,P,S] operand order,
at full frame size on the live accelerator. fori_loop slope method."""

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
    from radar_tpu.ops.pulse_compression import make_matmul_plan
    from radar_tpu.waveform.precompute import precompute

    cfg = full_config()
    pre = precompute(cfg)
    mplan = make_matmul_plan(pre)
    mtd_m = make_mtd_matrix(pre.mtd_win, cfg.sig.prt_num, None)
    P, S, B = cfg.sig.prt_num, cfg.sig.point_prt, cfg.sig.beam_num
    rng = np.random.default_rng(0)
    l_np = ((rng.normal(size=(B, B)) + 1j * rng.normal(size=(B, B)))
            * 0.1).astype(np.complex64)

    def white(key, shape):
        g = jax.random.normal(key, shape + (2,), jnp.float32)
        return (g[..., 0] + 1j * g[..., 1]) * np.float32(0.70710678)

    def pc(x, sub_in, sub_out):
        pieces = []
        for w0, wlen, m in mplan.chunks:
            ax = sub_in.index("w")
            seg = jax.lax.slice_in_dim(x, w0, w0 + wlen, axis=ax)
            pieces.append(einsum_complex_bf16(
                f"{sub_in},wj->{sub_out}", seg, jnp.asarray(m)))
        return jnp.concatenate(pieces, axis=sub_out.index("j"))

    def minor(key):  # current: [P,S,B]
        z = white(key, (P, S, B))
        pcz = pc(z, "pwb", "pjb")
        rdmz = einsum_complex_bf16("vp,pjb->vjb", jnp.asarray(mtd_m), pcz)
        rdm = jnp.einsum("vjb,cb->vjc", rdmz, jnp.asarray(l_np),
                         preferred_element_type=jnp.complex64)
        return jnp.sum(jnp.abs(rdm))

    def major(key):  # beams-major: [B,P,S]
        z = white(key, (B, P, S))
        pcz = pc(z, "bpw", "bpj")
        rdmz = einsum_complex_bf16("vp,bpj->bvj", jnp.asarray(mtd_m), pcz)
        rdm = jnp.einsum("cb,bvj->cvj", jnp.asarray(l_np), rdmz,
                         preferred_element_type=jnp.complex64)
        return jnp.sum(jnp.abs(rdm))

    def major_t(key):  # beams-major + final transpose to [V,G,B]
        z = white(key, (B, P, S))
        pcz = pc(z, "bpw", "bpj")
        rdmz = einsum_complex_bf16("vp,bpj->bvj", jnp.asarray(mtd_m), pcz)
        rdm = jnp.einsum("cb,bvj->vjc", jnp.asarray(l_np), rdmz,
                         preferred_element_type=jnp.complex64)
        return jnp.sum(jnp.abs(rdm))

    out = {}
    for name, fn in (("beams_minor_PSB", minor), ("beams_major_BPS", major),
                     ("beams_major_transposed_out", major_t)):
        out[name] = round(1e3 * loop_time(fn), 3)
        print(json.dumps({name: out[name]}))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
