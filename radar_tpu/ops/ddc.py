"""Digital down-conversion: mixing, decimation low-pass, downsampling
(SURVEY.md section 2.2 "Single-pulse/single-channel tutorial"; reference
simulation_learn.m:94-110).

The reference's pedagogy chain is: mix the RF echo to baseband, causal-filter
with the measured 12-tap low-pass (``FIR.mat`` variable ``Num``) to remove
the mixing image, and downsample by 4. Implemented batched and jittable.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import assets


def mix_to_baseband(x: jnp.ndarray, carrier_freq: float, fs: float,
                    phase: float = 0.0) -> jnp.ndarray:
    """Multiply by exp(-j*2*pi*f0*t) along the last axis."""
    n = x.shape[-1]
    t = np.arange(n) / fs
    lo = np.exp(-1j * (2 * np.pi * carrier_freq * t + phase))
    # LO precision follows the INPUT's precision class: a float64/
    # complex128 chain keeps f64 LO phases; only f32-class inputs get the
    # complex64 LO (keying on "not complex128" silently capped an f64
    # real passband input at ~1e-7 phase quantization — self-review r5)
    f64_in = jnp.finfo(x.dtype).bits == 64
    return x * jnp.asarray(lo, jnp.complex128 if f64_in else jnp.complex64)


def decimation_filter(x: jnp.ndarray, taps=None) -> jnp.ndarray:
    """Causal FIR along the last axis (MATLAB ``filter(Num, 1, x)``) with
    the measured decimation taps by default."""
    h = np.asarray(assets.ddc_fir_taps() if taps is None else taps)
    # cast taps to the input's real dtype once: float64 numpy scalars
    # would otherwise promote a complex64 input to complex128 under x64
    h = jnp.asarray(h, jnp.finfo(x.dtype).dtype)
    lh = len(h)
    n = x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 1) + [(lh - 1, 0)]
    xp = jnp.pad(x, pad)
    # causal conv as a small stack of shifted adds (lh = 12)
    y = jnp.zeros_like(x)
    for k in range(lh):
        y = y + h[k] * xp[..., lh - 1 - k:n + lh - 1 - k]
    return y


def downsample(x: jnp.ndarray, factor: int = 4) -> jnp.ndarray:
    """Keep every ``factor``-th sample (MATLAB ``downsample``)."""
    return x[..., ::factor]


def ddc(x: jnp.ndarray, carrier_freq: float, fs: float,
        factor: int = 4) -> jnp.ndarray:
    """Full chain: mix -> decimation low-pass -> downsample."""
    return downsample(decimation_filter(mix_to_baseband(x, carrier_freq,
                                                        fs)), factor)
