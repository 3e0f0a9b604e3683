"""PC banded-Toeplitz chunk-size sweep at full frame size: chunk controls
the read-amplification (halo re-read = support/chunk) vs dense-MAC-waste
((chunk+support)/support) trade-off. Times white-noise gen + PC only."""

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
    from radar_tpu.ops.precision import einsum_complex_bf16
    from radar_tpu.ops.pulse_compression import make_matmul_plan
    from radar_tpu.waveform.precompute import precompute

    cfg = full_config()
    pre = precompute(cfg)
    P, S, B = cfg.sig.prt_num, cfg.sig.point_prt, cfg.sig.beam_num

    def white(key, shape):
        g = jax.random.normal(key, shape + (2,), jnp.float32)
        return (g[..., 0] + 1j * g[..., 1]) * np.float32(0.70710678)

    def mk(mplan):
        def step(key):
            z = white(key, (P, S, B))
            pieces = []
            for w0, wlen, m in mplan.chunks:
                seg = jax.lax.slice_in_dim(z, w0, w0 + wlen, axis=1)
                pieces.append(einsum_complex_bf16("pwb,wj->pjb", seg,
                                                  jnp.asarray(m)))
            return jnp.sum(jnp.abs(jnp.concatenate(pieces, axis=1)))
        return step

    out = {}
    for chunk in (256, 512, 1024, 2048):
        mplan = make_matmul_plan(pre, chunk=chunk)
        out[f"chunk_{chunk}"] = round(1e3 * loop_time(mk(mplan)), 3)
        print(json.dumps({f"chunk_{chunk}": out[f"chunk_{chunk}"]}))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
