"""ctypes bindings for the native C++ runtime components.

``associate_tracks_5d_native`` is the fast path of
pipeline/driver.associate_tracks; Python transparently falls back to the
numpy BFS (cluster/connected.py) when the shared library has not been built
(``make -C radar_tpu/native``) — results are identical either way.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libradar_tracker.so")
_lib = None


def _try_build() -> bool:
    try:
        subprocess.run(["make", "-C", os.path.dirname(__file__), "-s"],
                       check=True, capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load_library(build_if_missing: bool = True):
    """Load (building on first use if needed) the native library, or None."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build_if_missing:
        _try_build()
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.associate_tracks_5d.restype = ctypes.c_int64
    lib.associate_tracks_5d.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64)]
    lib.connected_components_gated.restype = ctypes.c_int64
    lib.connected_components_gated.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64)]
    _lib = lib
    return lib


def available() -> bool:
    return load_library() is not None


def associate_tracks_5d_native(range_m, velocity_ms, azimuth_deg,
                               elevation_deg, frame, gates
                               ) -> np.ndarray | None:
    """Component ids [n] (first-seen order) or None if the library is
    unavailable. ``gates`` = (r, v, az, el, frame)."""
    lib = load_library()
    if lib is None:
        return None
    n = len(range_m)
    fields = np.ascontiguousarray(np.stack([
        np.asarray(range_m, np.float64), np.asarray(velocity_ms, np.float64),
        np.asarray(azimuth_deg, np.float64),
        np.asarray(elevation_deg, np.float64),
        np.asarray(frame, np.float64)]))
    g = np.ascontiguousarray(np.asarray(gates, np.float64))
    out = np.empty(n, np.int64)
    lib.associate_tracks_5d(
        fields.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out


def connected_components_gated_native(fields_list, gates) -> np.ndarray | None:
    """Dense gated BFS over k fields; None if the library is unavailable."""
    lib = load_library()
    if lib is None:
        return None
    fields = np.ascontiguousarray(
        np.stack([np.asarray(f, np.float64) for f in fields_list]))
    k, n = fields.shape
    g = np.ascontiguousarray(np.asarray(gates, np.float64))
    out = np.empty(n, np.int64)
    lib.connected_components_gated(
        fields.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, k,
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out
