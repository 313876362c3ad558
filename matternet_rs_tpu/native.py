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
        stale = _SO_PATH.exists() and any(
            src.stat().st_mtime > _SO_PATH.stat().st_mtime
            for src in _NATIVE_DIR.glob("*.cpp")
        )
        if (not _SO_PATH.exists() or stale) and not _build():
            if not _SO_PATH.exists():
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
        # Shard-reader symbols may be absent when an older .so could not be
        # rebuilt (no toolchain): keep the clustering fast path working and
        # let ShardReader fall back to the Python memmap reader.
        try:
            # The 5-arg opener has its own symbol name: a stale 4-arg .so
            # (no toolchain to rebuild) then FAILS this lookup and we fall
            # back to Python — instead of silently passing start_row into
            # a function that ignores it (which would stream from row 0
            # on a resume and corrupt the λ file).
            lib.mrs_shard_reader_open_at.restype = ctypes.c_void_p
            lib.mrs_shard_reader_open_at.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ]
            lib.mrs_shard_reader_next.restype = ctypes.c_int64
            lib.mrs_shard_reader_next.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_char),
            ]
            lib.mrs_shard_reader_close.restype = None
            lib.mrs_shard_reader_close.argtypes = [ctypes.c_void_p]
            lib._has_shard_reader = True
        except AttributeError:
            log.warning(
                "native library lacks the shard reader (stale build without "
                "a toolchain to rebuild); using the Python memmap reader"
            )
            lib._has_shard_reader = False
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
    if int(max_clusters) < 1:
        # cap=0 with items present would drive the native scan's first
        # create() into an out-of-bounds write on zero-size buffers (the
        # pure-Python fallback only IndexErrors) — fail identically on
        # both paths before any allocation.
        raise ValueError(
            f"max_clusters must be >= 1, got {max_clusters}"
        )
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
    if ncent < 0:
        raise RuntimeError(
            "native incremental scan rejected its inputs (cap < 1)"
        )
    return (
        centroids[:ncent].astype(np.float32),
        assignments,
        counts[:ncent].copy(),
        # .copy(): a bare slice view would pin the full [cap, F] f64
        # allocation alive for as long as the caller keeps the (typically
        # tiny) result.
        m2[:ncent].copy(),
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


class ShardReader:
    """Streaming block reader over raw shard files with native background
    read-ahead (native/shard_reader.cpp): the next block is read from disk
    while the caller uploads the current one. Iterates ``[block_rows, f]``
    arrays of ``dtype`` (default float32 — the raw corpus; the int8 sketch
    reload streams through the same reader with ``dtype=np.int8``). The
    last block may be shorter.

    Falls back to a pure-Python generator over ``np.memmap`` views when the
    native library is unavailable.

    ``start_row`` starts the stream that many rows into the concatenated
    shards — a SEEK, not a read: crash-resume skips completed blocks
    without paying their disk IO (16 GB of re-reads at a 41%-done 100M×96
    λ pass).
    """

    def __init__(self, paths, block_rows: int, n_features: int,
                 start_row: int = 0, dtype=np.float32):
        if int(start_row) < 0:
            # The native reader's skip guard ignores negatives (streams
            # from row 0 — silent duplicate rows on a resumed λ pass) and
            # the Python fallback raises an opaque broadcast error; fail
            # both paths fast and identically instead.
            raise ValueError(f"start_row must be >= 0, got {start_row}")
        self.paths = [str(p) for p in paths]
        self.block_rows = int(block_rows)
        self.f = int(n_features)
        self.dtype = np.dtype(dtype)
        self.row_bytes = self.f * self.dtype.itemsize
        self.start_row = int(start_row)
        self._lib = get_lib()
        self._handle = None
        if self._lib is not None and getattr(self._lib, "_has_shard_reader", False):
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths]
            )
            self._handle = self._lib.mrs_shard_reader_open_at(
                arr, len(self.paths), self.block_rows, self.row_bytes,
                self.start_row,
            )
        self._py_iter = None if self._handle else self._python_blocks()

    def _python_blocks(self):
        buf = np.empty((self.block_rows, self.f), self.dtype)
        fill = 0
        skip = self.start_row
        for p in self.paths:
            mm = np.memmap(p, dtype=self.dtype).reshape(-1, self.f)
            if skip >= len(mm):
                skip -= len(mm)
                continue
            pos = skip
            skip = 0
            while pos < len(mm):
                take = min(self.block_rows - fill, len(mm) - pos)
                buf[fill : fill + take] = mm[pos : pos + take]
                fill += take
                pos += take
                if fill == self.block_rows:
                    yield buf.copy()
                    fill = 0
        if fill:
            yield buf[:fill].copy()

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._handle is not None:
            out = np.empty((self.block_rows, self.f), self.dtype)
            rows = self._lib.mrs_shard_reader_next(
                self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_char))
            )
            if rows < 0:
                self.close()
                raise IOError("native shard reader IO error")
            if rows == 0:
                self.close()
                raise StopIteration
            return out[:rows]
        if self._py_iter is None:
            # Native stream already exhausted/closed — stay exhausted
            # (callers may probe past the end, e.g. padding-only devices).
            raise StopIteration
        return next(self._py_iter)

    def close(self) -> None:
        if self._handle is not None:
            self._lib.mrs_shard_reader_close(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover — best-effort cleanup
        try:
            self.close()
        except Exception:
            pass
