"""ctypes bindings for the native host runtime (native/ba_host.cpp).

Build with ``make -C native`` (g++ only).  Every entry point has a pure-numpy
fallback, so the package works unbuilt; ``HAVE_NATIVE`` reports which path is
active and the map store consults it (SURVEY: the reference's native layer is
borrowed library code; this is the part of ours that is genuinely host-side —
bookkeeping that grows with sequence length, not TPU math).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libba_host.so")


def _build_on_demand():
    """The shared object is a build artifact and never committed; compile it
    from the committed source the first time it's needed (set
    BA_TPU_NO_NATIVE=1 to skip and use the numpy fallbacks)."""
    if os.environ.get("BA_TPU_NO_NATIVE"):
        return
    src = os.path.join(_NATIVE_DIR, "ba_host.cpp")
    if not os.path.exists(src):
        return
    import subprocess

    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                       capture_output=True, timeout=120)
    except Exception:
        pass


_lib = None
try:
    if not os.path.exists(_LIB_PATH):
        _build_on_demand()
    if os.path.exists(_LIB_PATH):
        _lib = ctypes.CDLL(_LIB_PATH)
except OSError:
    _lib = None

HAVE_NATIVE = _lib is not None

if HAVE_NATIVE:
    _i64p = ctypes.POINTER(ctypes.c_int64)
    _f64p = ctypes.POINTER(ctypes.c_double)
    _lib.obs_create.restype = ctypes.c_void_p
    _lib.obs_destroy.argtypes = [ctypes.c_void_p]
    _lib.obs_size.restype = ctypes.c_int64
    _lib.obs_size.argtypes = [ctypes.c_void_p]
    _lib.obs_append.restype = ctypes.c_int64
    _lib.obs_append.argtypes = [ctypes.c_void_p, ctypes.c_int64, _i64p, _i64p, _i64p, _f64p]
    _lib.obs_kill_rows.argtypes = [ctypes.c_void_p, ctypes.c_int64, _i64p]
    _lib.obs_kill_mps.argtypes = [ctypes.c_void_p, ctypes.c_int64, _i64p]
    _lib.obs_gather_window.restype = ctypes.c_int64
    _lib.obs_gather_window.argtypes = [ctypes.c_void_p, ctypes.c_int64, _i64p, _i64p, ctypes.c_int64]
    _lib.obs_fetch_rows.argtypes = [ctypes.c_void_p, ctypes.c_int64, _i64p, _i64p, _i64p, _i64p, _f64p]
    _lib.obs_counts_per_point.argtypes = [ctypes.c_void_p, ctypes.c_int64, _i64p]
    _lib.obs_live_count.restype = ctypes.c_int64
    _lib.obs_live_count.argtypes = [ctypes.c_void_p]
    _lib.voxel_downsample.restype = ctypes.c_int64
    _lib.voxel_downsample.argtypes = [
        _f64p, _f64p, ctypes.c_int64, ctypes.c_double, _f64p, _f64p]


def _ptr(a, typ):
    return a.ctypes.data_as(typ)


class NativeObsTable:
    """C++-backed observation table with a per-keyframe row index."""

    def __init__(self):
        if not HAVE_NATIVE:
            raise RuntimeError("native library not built (make -C native)")
        self._h = _lib.obs_create()

    def __del__(self):
        if getattr(self, "_h", None):
            _lib.obs_destroy(self._h)
            self._h = None

    def __len__(self):
        return int(_lib.obs_size(self._h))

    def append(self, kf, mp, kp, uv) -> int:
        kf = np.ascontiguousarray(kf, np.int64)
        mp = np.ascontiguousarray(mp, np.int64)
        kp = np.ascontiguousarray(kp, np.int64)
        uv = np.ascontiguousarray(uv, np.float64)
        return int(_lib.obs_append(self._h, len(kf), _ptr(kf, ctypes.POINTER(ctypes.c_int64)),
                                   _ptr(mp, ctypes.POINTER(ctypes.c_int64)),
                                   _ptr(kp, ctypes.POINTER(ctypes.c_int64)),
                                   _ptr(uv, ctypes.POINTER(ctypes.c_double))))

    def kill_rows(self, rows):
        rows = np.ascontiguousarray(rows, np.int64)
        _lib.obs_kill_rows(self._h, len(rows), _ptr(rows, ctypes.POINTER(ctypes.c_int64)))

    def kill_mps(self, mps):
        mps = np.ascontiguousarray(mps, np.int64)
        _lib.obs_kill_mps(self._h, len(mps), _ptr(mps, ctypes.POINTER(ctypes.c_int64)))

    def gather_window(self, window_kf_ids):
        w = np.ascontiguousarray(window_kf_ids, np.int64)
        cap = len(self)
        out = np.empty(max(cap, 1), np.int64)
        n = int(_lib.obs_gather_window(self._h, len(w),
                                       _ptr(w, ctypes.POINTER(ctypes.c_int64)),
                                       _ptr(out, ctypes.POINTER(ctypes.c_int64)), cap))
        return out[:n]

    def fetch(self, rows):
        rows = np.ascontiguousarray(rows, np.int64)
        n = len(rows)
        kf = np.empty(n, np.int64)
        mp = np.empty(n, np.int64)
        kp = np.empty(n, np.int64)
        uv = np.empty((n, 2), np.float64)
        _lib.obs_fetch_rows(self._h, n, _ptr(rows, ctypes.POINTER(ctypes.c_int64)),
                            _ptr(kf, ctypes.POINTER(ctypes.c_int64)),
                            _ptr(mp, ctypes.POINTER(ctypes.c_int64)),
                            _ptr(kp, ctypes.POINTER(ctypes.c_int64)),
                            _ptr(uv, ctypes.POINTER(ctypes.c_double)))
        return kf, mp, kp, uv

    def counts_per_point(self, n_points: int):
        counts = np.zeros(max(n_points, 1), np.int64)
        _lib.obs_counts_per_point(self._h, n_points,
                                  _ptr(counts, ctypes.POINTER(ctypes.c_int64)))
        return counts[:n_points]

    def live_count(self) -> int:
        return int(_lib.obs_live_count(self._h))


def voxel_downsample_native(points, colors, voxel: float):
    """C++ voxel-grid average (falls back to the numpy implementation when
    the library is unbuilt)."""
    if not HAVE_NATIVE:
        from bundle_adjustment_tpu.utils.io import voxel_downsample

        return voxel_downsample(points, colors, voxel)
    pts = np.ascontiguousarray(points, np.float64)
    n = len(pts)
    if n == 0:
        return points, colors
    out_p = np.empty((n, 3), np.float64)
    has_c = colors is not None
    if has_c:
        cols = np.ascontiguousarray(colors, np.float64)
        out_c = np.empty((n, 3), np.float64)
    n_vox = int(_lib.voxel_downsample(
        _ptr(pts, ctypes.POINTER(ctypes.c_double)),
        _ptr(cols, ctypes.POINTER(ctypes.c_double)) if has_c else None,
        n, voxel,
        _ptr(out_p, ctypes.POINTER(ctypes.c_double)),
        _ptr(out_c, ctypes.POINTER(ctypes.c_double)) if has_c else None,
    ))
    return out_p[:n_vox].copy(), (out_c[:n_vox].copy() if has_c else None)
