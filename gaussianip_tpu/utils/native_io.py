"""ctypes bindings for the native async artifact writer (native/
artifact_writer.cpp): background-thread PLY/PNG/PPM encoding + IO, keeping
checkpoint/validation writes off the training loop. Builds on demand with
`make -C native`; every call gracefully reports unavailability so callers can
fall back to the Python writers."""

from __future__ import annotations

import atexit
import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _repo_root():
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def load(build_if_missing: bool = True):
    """Returns the loaded library or None."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_repo_root(), "native", "libgaussianip_io.so")
    if not os.path.exists(so) and build_if_missing:
        try:
            subprocess.run(["make", "-C", os.path.dirname(so)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(so):
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.aw_init.restype = ctypes.c_int
    lib.aw_write_ply.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                 ctypes.c_int64, ctypes.c_int64]
    lib.aw_write_png.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                 ctypes.c_int64, ctypes.c_int64]
    lib.aw_write_ppm.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                 ctypes.c_int64, ctypes.c_int64]
    lib.aw_pending.restype = ctypes.c_int64
    lib.aw_init()
    atexit.register(lib.aw_shutdown)
    _LIB = lib
    return _LIB


def available() -> bool:
    return load() is not None


def write_ply_async(path: str, rows: np.ndarray) -> bool:
    """rows: [N, 17 + 3*n_rest] float32 in the 3DGS attribute order
    (xyz, normals, f_dc, f_rest, opacity, scale, rot)."""
    lib = load()
    if lib is None:
        return False
    rows = np.ascontiguousarray(rows, np.float32)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    return lib.aw_write_ply(path.encode(), rows.ctypes.data, rows.shape[0],
                            rows.shape[1]) == 0


def write_png_async(path: str, rgb: np.ndarray) -> bool:
    lib = load()
    if lib is None:
        return False
    rgb = np.ascontiguousarray(rgb)
    if rgb.dtype != np.uint8:
        rgb = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    return lib.aw_write_png(path.encode(), rgb.ctypes.data, rgb.shape[0],
                            rgb.shape[1]) == 0


def flush():
    lib = load(build_if_missing=False)
    if lib is not None:
        lib.aw_flush()


def pending() -> int:
    lib = load(build_if_missing=False)
    return 0 if lib is None else int(lib.aw_pending())
