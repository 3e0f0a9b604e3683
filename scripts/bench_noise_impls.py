"""Microbench of beam-space AWGN implementations at full frame size
(332 x 5819 x 13 complex): PRNG families x dtypes x with/without the
Cholesky beam mixing. fori_loop slope method; per-iteration keys."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

P, S, B = 332, 5819, 13


def loop_time(step_fn, keymk=jax.random.PRNGKey, n1=5, n2=35):
    def loop(n, k0):
        def body(i, acc):
            return acc + step_fn(jax.random.fold_in(k0, i))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    f = jax.jit(loop)
    for n in (n1, n1):
        float(f(n, keymk(0)))

    def t(n, s):
        t0 = time.perf_counter()
        float(f(n, keymk(s)))
        return time.perf_counter() - t0

    return (min(t(n2, 1), t(n2, 2)) - min(t(n1, 3), t(n1, 4))) / (n2 - n1)


def main():
    from radar_tpu.ops.precision import einsum_complex_bf16

    rng = np.random.default_rng(0)
    l_np = (rng.normal(size=(B, B)) + 1j * rng.normal(size=(B, B))
            ).astype(np.complex64) * 0.1

    def gen(key, impl, dtype):
        g = jax.random.normal(key, (P, S, B, 2), dtype=dtype)
        return g

    def mk(impl, dtype, mix):
        def step(key):
            g = gen(key, impl, dtype)
            z = (g[..., 0].astype(jnp.float32)
                 + 1j * g[..., 1].astype(jnp.float32)) * np.float32(0.70710678)
            if mix == "f32":
                y = jnp.einsum("psj,bj->psb", z, jnp.asarray(l_np),
                               preferred_element_type=jnp.complex64)
            elif mix == "bf16":
                y = einsum_complex_bf16("psj,bj->psb", z, jnp.asarray(l_np))
            else:
                y = z
            return jnp.sum(jnp.abs(y))
        return step

    out = {}
    cases = [
        ("threefry", jnp.float32, "none"),
        ("rbg", jnp.float32, "none"),
        ("unsafe_rbg", jnp.float32, "none"),
    ]
    for impl, dtype, mix in cases:
        name = f"{impl}_{jnp.dtype(dtype).name}_mix-{mix}"
        keymk = (jax.random.PRNGKey if impl == "threefry"
                 else (lambda s: jax.random.key(s, impl=impl)))
        try:
            dt = loop_time(mk(impl, dtype, mix), keymk)
            out[name] = round(1e3 * dt, 3)
        except Exception as e:  # noqa: BLE001
            out[name] = f"error: {type(e).__name__}: {e}"[:120]
        print(json.dumps({name: out[name]}))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
