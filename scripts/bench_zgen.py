"""Microbench white-noise generation layouts on the TPU (slope method,
on-device fori_loop, nonlinear consume — .claude/skills/verify/SKILL.md)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from radar_tpu.sim.echo import white_complex_noise

B, P, S = 13, 332, 4311


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


def rbg_key(key):
    data = jax.random.key_data(key)
    return jax.random.wrap_key_data(jnp.tile(data.ravel()[:2], 2), impl="rbg")


def v_bps(key):  # current kernel-path draw
    z = white_complex_noise(key, (B, P, S), impl="rbg")
    return jnp.sum(jnp.abs(z))


def v_psb(key):  # XLA-chain draw (profile_tail shape)
    z = white_complex_noise(key, (P, S, B), impl="rbg")
    return jnp.sum(jnp.abs(z))


def v_planar(key):  # leading-axis-2 planes, complex at the end
    g = jax.random.normal(rbg_key(key), (2, B, P, S), jnp.float32)
    z = jax.lax.complex(g[0], g[1]) * np.float32(np.sqrt(0.5))
    return jnp.sum(jnp.abs(z))


def v_planes_bf16(key):  # what the pallas kernel actually wants
    g = jax.random.normal(rbg_key(key), (2, B, P, S), jnp.float32)
    s = np.float32(np.sqrt(0.5))
    zr = (g[0] * s).astype(jnp.bfloat16)
    zi = (g[1] * s).astype(jnp.bfloat16)
    return (jnp.sum(jnp.abs(zr.astype(jnp.float32)))
            + jnp.sum(jnp.abs(zi.astype(jnp.float32))))


def v_flat(key):  # flat draw, reshape (free), complex at the end
    g = jax.random.normal(rbg_key(key), (2 * B * P * S,), jnp.float32)
    g = g.reshape(2, B, P, S)
    z = jax.lax.complex(g[0], g[1]) * np.float32(np.sqrt(0.5))
    return jnp.sum(jnp.abs(z))


def main():
    out = {"device": jax.devices()[0].device_kind, "shape": [B, P, S]}
    for name, fn in (("bps_trailing2", v_bps), ("psb_trailing2", v_psb),
                     ("planar_leading2", v_planar),
                     ("planes_bf16", v_planes_bf16), ("flat", v_flat)):
        out[name + "_ms"] = round(1e3 * loop_time(fn), 3)
        print(json.dumps(out))
    path = os.path.join(os.path.dirname(__file__), "..", "results",
                        "zgen_layouts.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
