"""Tutorial: stage-by-stage single-frame debug harness.

The framework-native counterpart of the reference's debug checklist
(debug_simulated_data_processing.m:7-14): Fig 1 DBF energy band -> Fig 2 RDM
bright spot -> Fig 3 CFAR detections, with truth markers.

Run: python examples/02_single_frame_debug.py  (writes out_debug/*.png)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from radar_tpu.config.params import small_test_config
from radar_tpu.pipeline.frame import make_frame_processor
from radar_tpu.sim.scenario import TargetBatch
from radar_tpu.viz.plots import plot_pc_profile, plot_rdm
from radar_tpu.waveform.precompute import precompute

cfg = small_test_config(channels=8, pulses=32)
pre = precompute(cfg)
process = make_frame_processor(cfg, pre, dtype=jnp.complex64,
                               return_intermediates=True)
truth_r, truth_v = 3000.0, 10.0
tb = TargetBatch.make([truth_r], [truth_v], [10.0], [20.0])
inter = process(jax.random.PRNGKey(0), tb)

os.makedirs("out_debug", exist_ok=True)
# stage taps
print("raw IQ cube:", inter.raw_iq.shape)
print("beams:", inter.beams.shape, "| PC:", inter.pc.shape,
      "| RDM:", inter.rdm.shape)
print("raw detections:", int(inter.result.num_raw_detections),
      "| final targets:", int(inter.result.num_final))
best_beam = int(np.argmax(np.abs(np.asarray(inter.rdm)).max(axis=(0, 1))))
print("figures:",
      plot_pc_profile(np.asarray(inter.pc)[0, :, best_beam], pre.range_axis,
                      "out_debug/pc_profile.png", truth_ranges=[truth_r]),
      plot_rdm(np.asarray(inter.rdm)[:, :, best_beam], pre.range_axis,
               pre.velocity_axis, "out_debug/rdm.png",
               truth_ranges=[truth_r]))
valid = np.asarray(inter.result.targets.valid)
print("final:", np.asarray(inter.result.targets.range_m)[valid],
      np.asarray(inter.result.targets.velocity_ms)[valid])
