"""Sweep the fused noise-RDM kernel's gate tile size (gen + kernel e2e,
slope method — .claude/skills/verify/SKILL.md). Larger tiles cut the
overlapping-window DMA amplification (window = tile + filter_len - 1) and
raise MXU N-utilization, at the cost of VMEM. Writes
results/rdm_tile_sweep.json."""

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
    from radar_tpu.config.params import perf_config
    from radar_tpu.ops.mtd import make_mtd_matrix
    from radar_tpu.pipeline.lowrank import make_lowrank_stages
    from radar_tpu.ops.pulse_compression import make_matmul_plan
    from radar_tpu.waveform.precompute import precompute

    cfg = perf_config()
    pre = precompute(cfg)
    mplan = make_matmul_plan(pre)
    mtd_mat = make_mtd_matrix(pre.mtd_win, cfg.sig.prt_num, cfg.mtd_fft_len)

    out = {"device": jax.devices()[0].device_kind}
    import radar_tpu.pipeline.lowrank as lowrank_mod
    import radar_tpu.ops.pallas_rdm as rdm_mod

    orig = rdm_mod.make_rdm_plan
    for tile in (128, 256, 384, 512):
        def patched(pre_, mtd_, np_, tile=128, _t=tile):
            return orig(pre_, mtd_, np_, tile=_t)
        # route the stage factory through the patched plan builder
        lowrank_mod_make = rdm_mod.make_rdm_plan
        rdm_mod.make_rdm_plan = patched
        try:
            lr = make_lowrank_stages(cfg, pre, None, mplan, mtd_mat,
                                     pre.mtd_win, jnp.complex64)
        finally:
            rdm_mod.make_rdm_plan = lowrank_mod_make

        def step(key, _lr=lr):
            return jnp.sum(jnp.abs(_lr.noise_rdm(key)))

        try:
            out[f"tile{tile}_ms"] = round(1e3 * loop_time(step), 3)
        except Exception as e:  # VMEM overflow etc.
            out[f"tile{tile}_ms"] = f"FAIL {type(e).__name__}"
        print(json.dumps(out))
    path = os.path.join(os.path.dirname(__file__), "..", "results",
                        "rdm_tile_sweep.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
