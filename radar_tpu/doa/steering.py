"""Uniform-linear-array steering vectors and synthetic DBF weight banks.

The steering convention follows the reference's echo model
(fun_process_single_frame.m:163-169): channel ``n`` of an N-element ULA with
spacing ``d`` sees phase ``+n * 2*pi*d*sin(theta)/lambda`` for an arrival
angle ``theta``.

For the 16-channel default the framework uses the measured DBF matrix asset;
for scaled arrays (8/64/128 channels, BASELINE.json configs 1 and 3) this
module synthesizes a Hamming-tapered multi-beam weight bank whose monopulse
slopes are then self-calibrated (doa/calibrate.py), mirroring how the
reference's measured LUT was produced (calibrate_all_monopulse_slopes.m).
"""

from __future__ import annotations

import numpy as np


def steering_vector(angles_deg: np.ndarray, num_elements: int,
                    element_spacing: float, wavelength: float,
                    index_base: int = 0) -> np.ndarray:
    """Steering matrix S, complex [num_elements, len(angles)].

    ``index_base=1`` reproduces the reference plot script's quirk of
    1-based element indices (plot_beam_patterns.m:52) — a per-angle global
    phase on every column, so |w . S| patterns and peak angles are
    invariant; exposed for bit-faithful reproduction of that script."""
    angles = np.deg2rad(np.atleast_1d(np.asarray(angles_deg, np.float64)))
    n = (np.arange(num_elements) + index_base)[:, None]
    phase = 2.0 * np.pi * element_spacing * np.sin(angles)[None, :] / wavelength
    return np.exp(1j * n * phase)


def synthesize_dbf_bank(beam_angles_deg: np.ndarray, num_elements: int,
                        element_spacing: float,
                        wavelength: float) -> np.ndarray:
    """Hamming-tapered beam-steering weight bank W, complex [beams, elems].

    With the framework's DBF convention ``y = x @ W^H`` the response of beam b
    to a unit steering vector at angle theta peaks at beam_angles_deg[b].
    """
    taper = np.hamming(num_elements)
    s = steering_vector(beam_angles_deg, num_elements, element_spacing,
                        wavelength)  # [C, B]
    return (taper[:, None] * s).T.copy()


def default_synthetic_beam_angles(num_elements: int,
                                  num_beams: int) -> np.ndarray:
    """Beam grid for synthetic arrays: keeps the measured 16-element layout's
    crossover geometry (6.4 deg spacing near broadside, v8_3:178) scaled by
    the beamwidth ratio 16/num_elements, starting at -16 deg."""
    spacing = 6.4 * 16.0 / num_elements
    return -16.0 + spacing * np.arange(num_beams, dtype=np.float64)
