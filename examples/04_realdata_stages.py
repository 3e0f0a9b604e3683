"""Tutorial: the real-data staged pipeline with per-stage checkpoints.

The framework-native counterpart of ``main_test_with_simulated_data.m``:
gated 3404-sample IQ -> stage 1 DBF (transposed coefficients) -> stage 2
PC+MTD with clutter suppression -> stage 3 segmented 1D CFAR -> stage 4
monopulse measurement with the per-frequency Angle-K table, persisting each
stage through the checkpoint store (the reference's save_options design).

Run: python examples/04_realdata_stages.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from radar_tpu.config import assets
from radar_tpu.config.params import RadarConfig, SigConfig
from radar_tpu.io.checkpoint import CheckpointStore, SaveOptions
from radar_tpu.ops.dbf import dbf
from radar_tpu.pipeline.stages import (_segment_pulses, realdata_beam_angles,
                                       stage2_mtd, stage3_detection,
                                       stage4_measurement)

cfg = RadarConfig(sig=SigConfig(prt_num=64, channel_num=16, beam_num=13))
sig = cfg.sig
rng = np.random.default_rng(0)
n_p, n_g, n_c = sig.prt_num, 3404, 16
iq = (rng.normal(size=(n_p, n_g, n_c))
      + 1j * rng.normal(size=(n_p, n_g, n_c))) * np.sqrt(0.5)

# inject one target into the long segment with the real-data conventions
p1, p2, p3 = _segment_pulses(cfg)
gate, vel = 1500, 12.0
dphi = 2 * np.pi * 0.0138 * np.sin(np.deg2rad(12.0)) / sig.wavelength
steer = np.exp(-1j * np.arange(n_c) * dphi)   # conj convention (x @ W.T)
dop = np.exp(1j * 2 * np.pi * (2 * vel / sig.wavelength)
             * np.arange(n_p) * sig.prt)
seg = np.zeros(n_g, complex)
seg[gate:gate + len(p3)] = p3
iq += 8.0 * dop[:, None, None] * seg[None, :, None] * steer[None, None, :]

store = CheckpointStore("out_realdata", SaveOptions(
    iq_after_dbf=True, mtd=True, cfar_flags=True, measurements=True))

beams = dbf(jnp.asarray(iq, jnp.complex64),
            jnp.asarray(np.asarray(assets.dbf_coeffs()), jnp.complex64),
            "realdata")
store.save("iq_after_dbf", 0, beams=np.asarray(beams))
rdm, pc = stage2_mtd(beams, cfg)
store.save("mtd", 0, rdm=np.asarray(rdm))
dets, flags = stage3_detection(rdm, cfg)
store.save("cfar_flags", 0, flags=np.asarray(flags))
meas = stage4_measurement(dets, rdm, cfg, freq_no=6)
valid = np.asarray(meas.valid)
store.save("measurements", 0, range_m=np.asarray(meas.range_m)[valid],
           velocity_ms=np.asarray(meas.velocity_ms)[valid],
           elevation_deg=np.asarray(meas.elevation_deg)[valid])

i = int(np.argmax(np.asarray(meas.power)[valid]))
print(f"truth: gate {gate} (R={gate * 5.996:.0f} m), V={vel} m/s, "
      f"physical el 12 deg -> pair 4")
print(f"best detection: R={np.asarray(meas.range_m)[valid][i]:.1f} m, "
      f"V={np.asarray(meas.velocity_ms)[valid][i]:.2f} m/s, "
      f"El(nominal frame)={np.asarray(meas.elevation_deg)[valid][i]:.2f} deg")
print("checkpoints:", sorted(os.listdir("out_realdata")))
