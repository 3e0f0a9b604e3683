"""Tutorial: MUSIC super-resolution DoA vs conventional beamforming.

The framework-native counterpart of ``run_music_algorithm.m``: 16-channel
radar-geometry array, two sources 3.5 degrees apart — under the conventional
beamwidth — resolved by MUSIC.

Run: python examples/03_music_doa.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from radar_tpu.config.params import full_config
from radar_tpu.doa.music import (conventional_beam_spectrum, music_1d,
                                 simulate_snapshots)

cfg = full_config()
d, wl = cfg.array.element_spacing, cfg.sig.wavelength
truth = [-1.5, 2.0]
x = simulate_snapshots(jax.random.PRNGKey(0), truth, 16, d, wl,
                       num_snapshots=256, snr_db=20.0,
                       dtype=jnp.complex64)
scan = np.arange(-20.0, 20.0, 0.1)
res = music_1d(x, 2, d, wl, scan)
print("truth:", truth, "-> MUSIC peaks:", np.round(res.peaks_deg, 2))
conv = np.asarray(conventional_beam_spectrum(x, scan, d, wl))
print("conventional DBF peak:", scan[int(np.argmax(conv))],
      "deg (single merged lobe — cannot separate the pair)")

# search-free super-resolution (beyond the reference's grid-scan MUSIC):
# root-MUSIC roots the null-spectrum polynomial, ESPRIT exploits the
# shift invariance of the two overlapping subarrays — no scan grid, so
# no 0.1-deg quantization floor (radar_tpu/doa/superres.py)
from radar_tpu.doa.superres import esprit_1d, root_music_1d

print("root-MUSIC:", np.round(root_music_1d(x, 2, d, wl), 3))
print("TLS-ESPRIT:", np.round(esprit_1d(x, 2, d, wl), 3))
