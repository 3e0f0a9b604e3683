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
    if build_if_missing:
        _try_build()  # make is a no-op when the .so is already fresh
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
    if hasattr(lib, "binio_probe"):  # absent in pre-binio builds
        lib.binio_probe.restype = ctypes.c_int64
        lib.binio_probe.argtypes = [ctypes.c_char_p] + \
            [ctypes.POINTER(ctypes.c_int64)] * 4
        lib.binio_read.restype = ctypes.c_int64
        lib.binio_read.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
        lib.binio_write.restype = ctypes.c_int64
        lib.binio_write.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_double, ctypes.c_double, ctypes.c_double]
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


def binio_available() -> bool:
    lib = load_library()
    return lib is not None and hasattr(lib, "binio_probe")


def binio_probe_native(path: str):
    """(n_prt, n_samples, n_channels, freq_no) or None if unavailable.
    Raises IOError on a malformed file."""
    lib = load_library()
    if lib is None or not hasattr(lib, "binio_probe"):
        return None
    dims = [ctypes.c_int64(0) for _ in range(4)]
    rc = lib.binio_probe(path.encode(), *[ctypes.byref(d) for d in dims])
    if rc != 0:
        raise IOError(f"binio_probe({path}) failed with code {rc}")
    return tuple(d.value for d in dims)


def binio_read_native(path: str, n_prt: int, n_samples: int, n_channels: int):
    """(iq complex64 [n_prt,n_samples,n_channels], realtime float64
    [n_prt,16], servo float64 [n_prt]) or None if unavailable."""
    lib = load_library()
    if lib is None or not hasattr(lib, "binio_read"):
        return None
    iq = np.empty((n_prt, n_samples, n_channels, 2), np.float32)
    realtime = np.empty((n_prt, 16), np.float64)
    servo = np.empty(n_prt, np.float64)
    rc = lib.binio_read(
        path.encode(), iq.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        realtime.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        servo.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n_prt, n_samples, n_channels)
    if rc != 0:
        raise IOError(f"binio_read({path}) failed with code {rc}")
    return ((iq[..., 0] + 1j * iq[..., 1]).astype(np.complex64),
            realtime, servo)


def binio_write_native(path: str, iq: np.ndarray, realtime: np.ndarray,
                       servo: np.ndarray, freq_no: int, fs_hz: float,
                       prt_s: float, iq_scale: float) -> bool:
    """Write PRT records; False if the library is unavailable."""
    lib = load_library()
    if lib is None or not hasattr(lib, "binio_write"):
        return False
    n_prt, n_samples, n_channels = iq.shape
    buf = np.empty((n_prt, n_samples, n_channels, 2), np.float32)
    buf[..., 0] = iq.real
    buf[..., 1] = iq.imag
    buf = np.ascontiguousarray(buf)
    realtime = np.ascontiguousarray(realtime, np.float64)
    servo = np.ascontiguousarray(servo, np.float64)
    rc = lib.binio_write(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        realtime.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        servo.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n_prt, n_samples, n_channels, freq_no, fs_hz, prt_s, iq_scale)
    if rc != 0:
        raise IOError(f"binio_write({path}) failed with code {rc}")
    return True
