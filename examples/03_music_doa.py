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

# ---- 2D: the URA (MUSIC_2D.m scaled to the 128-element aperture) ------
# grid MUSIC with device-side regional-max peaks + two-stage zoom
# refinement, vs search-free 2D TLS-ESPRIT with automatic (az, el)
# pairing (both beyond the reference's 8x8 grid-only formulation)
from radar_tpu.doa.music import music_2d, steering_ura
from radar_tpu.doa.superres import esprit_2d

nx, ny = 16, 8
truth2 = np.array([[12.3, 25.7], [-40.6, 55.4]])      # off-grid (az, el)
a2 = steering_ura(truth2[:, 0], truth2[:, 1], nx, ny, 0.5)
cols = [a2[:, i * len(truth2) + i] for i in range(len(truth2))]
rng = np.random.default_rng(0)
s2 = (rng.normal(size=(2, 512)) + 1j * rng.normal(size=(2, 512)))
n2 = (rng.normal(size=(nx * ny, 512))
      + 1j * rng.normal(size=(nx * ny, 512))) * np.sqrt(0.5) * 0.1
x2 = jnp.asarray(np.stack(cols, 1) @ s2 / np.sqrt(2) + n2, jnp.complex64)

az = np.arange(-60.0, 60.0 + 1e-9, 1.0)
el = np.arange(10.0, 80.0 + 1e-9, 1.0)
coarse = music_2d(x2, 2, nx, ny, 0.5, az_deg=az, el_deg=el)
fine = music_2d(x2, 2, nx, ny, 0.5, az_deg=az, el_deg=el, refine=True)
print("\n2D truth (az, el):", truth2.tolist())
print("grid MUSIC (1-deg grid):", coarse.peaks_deg.tolist())
print("   + zoom refinement:   ", np.round(fine.peaks_deg, 2).tolist())
print("2D TLS-ESPRIT (search-free, auto-paired):",
      np.round(esprit_2d(x2, 2, nx, ny, 0.5), 2).tolist())
