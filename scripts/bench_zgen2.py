"""Microbench candidate generators for the fused-kernel noise planes at the
exact shipped per-segment shapes (slope method, on-device fori_loop,
nonlinear consume — .claude/skills/verify/SKILL.md).

Candidates (all produce the [2, B, p_pad, n] bf16 plane pairs per segment):
  cur         shipped: f32 normal leading-2 draw, scale, mask, bf16 cast
  bf16        draw jax.random.normal directly in bfloat16
  psb_t       draw (p_pad, n, 2B) f32 (the layout that microbenched 3x
              faster standalone), transpose, scale, mask, cast
  uniform     bits->uniform in [-sqrt(1.5), sqrt(1.5)] (unit rail variance,
              no erfinv); CLT: every draw is summed over >=10k weighted
              terms (PC window x 332 MTD pulses) before the first
              nonlinearity, so the RDM noise is Gaussian to ~1e-3
  unif_psb_t  uniform in the fast layout + transpose

Each candidate is also timed end-to-end through the fused kernel
(planes -> noise_rdm_pallas_planes) so layout effects on the kernel DMA
show up. Writes results/zgen2.json when run on the accelerator."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def loop_time(step_fn, n1=5, n2=45):
    key = jax.random.PRNGKey(0)

    def loop(n, k0):
        def body(i, acc):
            return acc + step_fn(jax.random.fold_in(k0, i))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    f = jax.jit(loop)
    for n in (n1, n1):
        float(f(n, key))

    def t(n, s):
        t0 = time.perf_counter()
        float(f(n, jax.random.PRNGKey(s)))
        return time.perf_counter() - t0

    return (min(t(n2, 1), t(n2, 2)) - min(t(n1, 3), t(n1, 4))) / (n2 - n1)


def main() -> None:
    from radar_tpu.config.params import full_config
    from radar_tpu.ops.dbf import dbf_weights_effective_np
    from radar_tpu.ops.mtd import make_mtd_matrix
    from radar_tpu.ops.pallas_rdm import (make_rdm_plan,
                                          noise_rdm_pallas_planes,
                                          segment_buffer_len)
    from radar_tpu.sim.echo import _as_impl_key, beam_noise_factor
    from radar_tpu.waveform.precompute import precompute

    cfg = full_config()
    pre = precompute(cfg)
    mtd_mat = make_mtd_matrix(pre.mtd_win, cfg.sig.prt_num, cfg.mtd_fft_len)
    plan = make_rdm_plan(pre, mtd_mat, cfg.sig.prt_num, tile=128)
    w_eff = dbf_weights_effective_np(np.asarray(pre.dbf_w), cfg.dbf_variant)
    l_np = beam_noise_factor(w_eff)
    B = l_np.shape[0]
    pp = plan.p_pad
    ns = [segment_buffer_len(s) for s in plan.segments]
    root2inv = np.sqrt(0.5).astype(np.float32)
    a_unif = np.sqrt(1.5).astype(np.float32)   # var(U[-a,a]) = a^2/3 = 1/2

    def mask(g, seg, n):
        if seg.pad_front:
            return g * (jnp.arange(n) >= seg.pad_front)
        return g

    def gen_cur(key):
        keys = jax.random.split(key, len(ns))
        out = []
        for seg, n, k in zip(plan.segments, ns, keys):
            g = jax.random.normal(_as_impl_key(k, "rbg"), (2, B, pp, n),
                                  jnp.float32) * root2inv
            g = mask(g, seg, n)
            out.append((g[0].astype(jnp.bfloat16), g[1].astype(jnp.bfloat16)))
        return out

    def gen_bf16(key):
        keys = jax.random.split(key, len(ns))
        out = []
        for seg, n, k in zip(plan.segments, ns, keys):
            g = jax.random.normal(_as_impl_key(k, "rbg"), (2, B, pp, n),
                                  jnp.bfloat16) * jnp.bfloat16(root2inv)
            g = mask(g, seg, n)
            out.append((g[0], g[1]))
        return out

    def gen_psb_t(key):
        keys = jax.random.split(key, len(ns))
        out = []
        for seg, n, k in zip(plan.segments, ns, keys):
            g = jax.random.normal(_as_impl_key(k, "rbg"), (pp, n, 2 * B),
                                  jnp.float32) * root2inv
            g = jnp.transpose(g, (2, 0, 1))
            g = mask(g, seg, n).astype(jnp.bfloat16)
            out.append((g[:B], g[B:]))
        return out

    def gen_uniform(key):
        keys = jax.random.split(key, len(ns))
        out = []
        for seg, n, k in zip(plan.segments, ns, keys):
            g = jax.random.uniform(_as_impl_key(k, "rbg"), (2, B, pp, n),
                                   jnp.float32, -a_unif, a_unif)
            g = mask(g, seg, n)
            out.append((g[0].astype(jnp.bfloat16), g[1].astype(jnp.bfloat16)))
        return out

    def gen_unif_psb_t(key):
        keys = jax.random.split(key, len(ns))
        out = []
        for seg, n, k in zip(plan.segments, ns, keys):
            g = jax.random.uniform(_as_impl_key(k, "rbg"), (pp, n, 2 * B),
                                   jnp.float32, -a_unif, a_unif)
            g = jnp.transpose(g, (2, 0, 1))
            g = mask(g, seg, n).astype(jnp.bfloat16)
            out.append((g[:B], g[B:]))
        return out

    gens = {"cur": gen_cur, "bf16": gen_bf16, "psb_t": gen_psb_t,
            "uniform": gen_uniform, "unif_psb_t": gen_unif_psb_t}

    def consume_planes(gen):
        def step(key):
            acc = jnp.float32(0)
            for xr, xi in gen(key):
                acc += (jnp.sum(jnp.abs(xr.astype(jnp.float32)))
                        + jnp.sum(jnp.abs(xi.astype(jnp.float32))))
            return acc
        return step

    def consume_kernel(gen):
        def step(key):
            pairs = gen(key)
            rdm = noise_rdm_pallas_planes([p[0] for p in pairs],
                                          [p[1] for p in pairs],
                                          plan, l_np)
            return jnp.sum(jnp.abs(rdm))
        return step

    out = {"device": jax.devices()[0].device_kind,
           "B": B, "p_pad": pp, "bufs": ns}
    for name, gen in gens.items():
        out[name + "_gen_ms"] = round(1e3 * loop_time(consume_planes(gen)), 3)
        print(json.dumps(out))
    for name, gen in gens.items():
        out[name + "_e2e_ms"] = round(1e3 * loop_time(consume_kernel(gen)), 3)
        print(json.dumps(out))
    path = os.path.join(os.path.dirname(__file__), "..", "results",
                        "zgen2.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
