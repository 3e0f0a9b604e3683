"""Tutorial: LFM pulse compression basics and gate splicing.

The framework-native counterpart of the reference's pedagogy scripts
``test.m`` (3-pulse waveform, conv matched filtering, gate-splice demo with
boundary annotations, test.m:101-150) and ``simulation_learn.m`` (LFM
basics, FFT-domain pulse compression, simulation_learn.m:112-131).

Run: python examples/01_pulse_compression_basics.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from radar_tpu.config.params import full_config
from radar_tpu.ops.pulse_compression import pulse_compress
from radar_tpu.waveform.precompute import build_tx_pulse, precompute

cfg = full_config()
pre = precompute(cfg)
tx, (n1, n2, n3, p2, p3) = build_tx_pulse(cfg)
print(f"PRT: {cfg.sig.point_prt} samples @ {cfg.sig.fs/1e6:.0f} MHz")
print(f"pulses: narrow {n1} / medium LFM {n2} / long LFM {n3} samples "
      f"at offsets 0 / 289 / 1284")
print(f"spliced gates: {pre.gate_splits} -> {pre.n_total_gate} total")

# single noiseless echo at gate 500 (medium segment)
delay = 500
echo = np.zeros(cfg.sig.point_prt, complex)
echo[delay:] = tx[:cfg.sig.point_prt - delay]
beams = jnp.asarray(echo[None, :, None])  # [1 pulse, S, 1 beam]
pc = np.abs(np.asarray(pulse_compress(beams, pre)))[0, :, 0]
peak = int(np.argmax(pc))
print(f"\ninjected delay gate: {delay}; PC peak gate: {peak}")
print(f"compression gain (peak/|input|): {pc[peak]:.1f}x "
      f"(theory ~ {n2} for the {n2}-sample medium chirp, reduced by the "
      f"kaiser(4.5) taper)")
print("segment boundaries at gates 228 and 951 "
      "(each segment matched-filtered independently, then spliced)")
