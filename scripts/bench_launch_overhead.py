"""Per-``pallas_call`` launch-overhead microbench (ROADMAP "single-call
segment merge": 3 kernel launches per frame where 1 might do — the merge is
worth building only if the measured per-call fixed cost times 2 approaches
the ~0.46 ms gap between the fused kernel (1.60 ms) and its composite floor
(~1.14 ms, results/rdm_ablation.json)).

Method (tunnel-safe, .claude/skills/verify): chain K invocations of a
minimal kernel inside ONE on-device ``lax.fori_loop`` (carry feeds the next
call — no DCE, no dispatch latency in the measurement), slope-time two trip
counts. The identical chain with the kernel replaced by the same arithmetic
in XLA isolates the pallas-call fixed cost from the loop/carry overhead.

Writes results/launch_overhead.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = jax.default_backend() == "cpu"

    def k_add(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0

    def pallas_step(x, shape):
        return pl.pallas_call(
            k_add,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            interpret=interpret)(x)

    def measure(step, shape, label, n_small=64, n_large=320):
        def chain(n, x):
            return jax.lax.fori_loop(0, n, lambda i, c: step(c, shape), x)

        f = jax.jit(chain)
        x0 = jnp.zeros(shape, jnp.float32)
        print(f"{label} {shape}: compiling...", flush=True)
        for _ in range(2):
            float(jnp.sum(f(n_small, x0)))   # compile + settle
            float(jnp.sum(f(n_large, x0)))

        def timed(n):
            t0 = time.perf_counter()
            float(jnp.sum(f(n, x0)))
            return time.perf_counter() - t0

        ts = min(timed(n_small), timed(n_small))
        tl = min(timed(n_large), timed(n_large))
        dt = (tl - ts) / (n_large - n_small)
        print(f"{label} {shape}: {dt * 1e6:.2f} us/call")
        return dt

    out = {"device": jax.devices()[0].device_kind,
           "method": "fori_loop-chained carry, slope between trip counts",
           "per_call_s": {}}
    for shape in ((8, 128), (256, 1024)):
        t_pl = measure(pallas_step, shape, "pallas")
        t_xla = measure(lambda x, s: x + 1.0, shape, "xla  ")
        out["per_call_s"][str(shape)] = {
            "pallas": t_pl, "xla_same_math": t_xla,
            "pallas_fixed_overhead": t_pl - t_xla}

    # decision input for the ROADMAP segment merge (3 calls -> 1 saves 2)
    oh = out["per_call_s"]["(8, 128)"]["pallas_fixed_overhead"]
    out["segment_merge_2calls_saved_ms"] = 2e3 * oh
    path = os.path.join(os.path.dirname(__file__), "..", "results",
                        "launch_overhead.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"pallas_fixed_overhead_us": round(oh * 1e6, 2),
                      "merge_would_save_ms":
                      round(out["segment_merge_2calls_saved_ms"], 4)}))


if __name__ == "__main__":
    main()
