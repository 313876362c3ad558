"""ctypes bindings for the native (C++) host runtime.

Builds ``native/libmrs_native.so`` on first use if g++ is available; all
callers fall back to the pure-Python path when the library can't be built,
so the package works in toolchain-free environments.
"""

from __future__ import annotations

import ctypes
import logging
import pathlib
import subprocess
import threading

import numpy as np

log = logging.getLogger(__name__)

_NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent / "native"
_SO_PATH = _NATIVE_DIR / "libmrs_native.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True, capture_output=True, timeout=120,
        )
        return _SO_PATH.exists()
    except Exception as exc:  # toolchain missing / build failure → fallback
        log.warning("native build failed (%s); using pure-Python paths", exc)
        return False


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _SO_PATH.exists() and not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_SO_PATH))
        except OSError as exc:
            log.warning("native load failed (%s)", exc)
            return None
        lib.mrs_incremental_cluster.restype = ctypes.c_int64
        lib.mrs_incremental_cluster.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_double, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.mrs_nearest_centroid.restype = None
        lib.mrs_nearest_centroid.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def incremental_cluster(
    X: np.ndarray,
    max_clusters: int,
    radius: float,
    mode: str = "legacy",
    keep_mask: np.ndarray | None = None,
):
    """Native radius-gated incremental scan.

    Returns ``(centroids [C,F] f32, assignments [N] i64 (-1 = dropped),
    counts [C] i64, m2 [C,F] f64)`` or None when the library is unavailable.
    ``mode``: "legacy" (src_legacy semantics incl. soft outliers) or
    "stage_a" (surfface-core semantics incl. force-assign).
    """
    lib = get_lib()
    if lib is None:
        return None
    X = np.ascontiguousarray(X, np.float32)
    n, f = X.shape
    cap = int(min(max_clusters, max(n, 1)))
    centroids = np.zeros((cap, f), np.float64)
    m2 = np.zeros((cap, f), np.float64)
    counts = np.zeros(cap, np.int64)
    assignments = np.zeros(n, np.int64)
    keep_ptr = None
    if keep_mask is not None:
        keep_mask = np.ascontiguousarray(keep_mask, np.uint8)
        keep_ptr = keep_mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    ncent = lib.mrs_incremental_cluster(
        X.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, f, cap, float(radius),
        {"legacy": 0, "stage_a": 1}[mode],
        keep_ptr,
        centroids.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        m2.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        assignments.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    ncent = int(ncent)
    return (
        centroids[:ncent].astype(np.float32),
        assignments,
        counts[:ncent].copy(),
        m2[:ncent],
    )


def nearest_centroid_batch(X: np.ndarray, centroids: np.ndarray):
    """Native batch nearest-centroid: ``(idx [N], d2 [N])`` or None."""
    lib = get_lib()
    if lib is None:
        return None
    X = np.ascontiguousarray(X, np.float32)
    C = np.ascontiguousarray(centroids, np.float64)
    n, f = X.shape
    idx = np.zeros(n, np.int64)
    d2 = np.zeros(n, np.float64)
    lib.mrs_nearest_centroid(
        X.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, f,
        C.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(C),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        d2.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return idx, d2
