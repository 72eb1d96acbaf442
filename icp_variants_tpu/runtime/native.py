"""ctypes bridge to the native IO runtime (native/icpio.cpp).

Builds ``libicpio.so`` on first use (``make`` in native/) and exposes the
fast whitespace-float scanner. Every caller has a numpy fallback, so the
framework works without a compiler; with one, ETH-scale ASCII parsing gets
10-50x faster.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libicpio.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_load_failed = False


def _load() -> ctypes.CDLL | None:
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        src = os.path.join(_NATIVE_DIR, "icpio.cpp")
        stale = not os.path.exists(_LIB_PATH) or (
            os.path.exists(src)
            and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
        )
        if stale:
            try:
                subprocess.run(
                    ["make", "-s", "-B"], cwd=_NATIVE_DIR, check=True,
                    capture_output=True, timeout=120,
                )
            except Exception:
                _load_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.icpio_parse_floats.restype = ctypes.c_int64
            lib.icpio_parse_floats.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ]
            lib.icpio_parse_floats_f32.restype = ctypes.c_int64
            lib.icpio_parse_floats_f32.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ]
            if hasattr(lib, "icpio_kd_partition"):
                lib.icpio_kd_partition.restype = ctypes.c_int64
                lib.icpio_kd_partition.argtypes = [
                    ctypes.POINTER(ctypes.c_float),
                    ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.c_int64,
                ]
            if hasattr(lib, "icpio_parse_files_f32"):
                lib.icpio_parse_files_f32.restype = ctypes.c_int64
                lib.icpio_parse_files_f32.argtypes = [
                    ctypes.POINTER(ctypes.c_char_p),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.POINTER(ctypes.c_int64),
                    ctypes.c_int64, ctypes.c_int64,
                ]
            _lib = lib
        except Exception:
            _load_failed = True
        return _lib


def available() -> bool:
    return _load() is not None


def parse_floats(
    path: str, offset: int, max_count: int, dtype=np.float64
) -> np.ndarray | None:
    """Parse whitespace-separated numbers from ``path`` starting at byte
    ``offset``. Returns the parsed array, or None if the native library is
    unavailable (callers fall back to numpy)."""
    lib = _load()
    if lib is None:
        return None
    if dtype == np.float32:
        out = np.empty(max_count, np.float32)
        n = lib.icpio_parse_floats_f32(
            path.encode(), offset,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_count,
        )
    else:
        out = np.empty(max_count, np.float64)
        n = lib.icpio_parse_floats(
            path.encode(), offset,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), max_count,
        )
    if n < 0:
        raise IOError(f"icpio failed to read {path}")
    return out[:n]


def parse_floats_f32_batch(
    specs: list[tuple[str, int, int]], n_threads: int = 0
) -> list[np.ndarray] | None:
    """Parse many files CONCURRENTLY through the native thread pool.

    ``specs`` is ``[(path, byte_offset, max_count), ...]``; returns one f32
    array per file (the data-loader prefetch path — a batched ETH sweep
    hands all 2*B .pcd bodies of a batch to the pool at once). Returns None
    when the native library is unavailable; raises on any per-file I/O
    error, like :func:`parse_floats`.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "icpio_parse_files_f32"):
        return None
    n = len(specs)
    if n == 0:
        return []
    outs = [np.empty(mc, np.float32) for (_, _, mc) in specs]
    paths = (ctypes.c_char_p * n)(*[p.encode() for (p, _, _) in specs])
    offsets = (ctypes.c_int64 * n)(*[o for (_, o, _) in specs])
    max_counts = (ctypes.c_int64 * n)(*[mc for (_, _, mc) in specs])
    counts = (ctypes.c_int64 * n)()
    ptrs = (ctypes.POINTER(ctypes.c_float) * n)(
        *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for a in outs]
    )
    lib.icpio_parse_files_f32(
        paths, offsets, ptrs, max_counts, counts, n, n_threads
    )
    results = []
    for i, a in enumerate(outs):
        if counts[i] < 0:
            raise IOError(f"icpio failed to read {specs[i][0]}")
        results.append(a[: counts[i]])
    return results


def kd_partition(points: np.ndarray, depth: int):
    """Native widest-axis median partition (ops/kdtree.kd_partition_np
    semantics): returns ``(perm, blocks)`` with ``blocks`` a list of
    (start, count) in tree order, or None if the library is unavailable
    or lacks the symbol. Splits only on the first 3 columns (geometry) —
    6-dim color features partition on xyz exactly like FLANN's composite
    index, so callers may pass either. Parallelized across subtrees on
    all host cores (the numpy fallback is GIL-bound per node)."""
    lib = _load()
    if lib is None or not hasattr(lib, "icpio_kd_partition"):
        return None
    pts = np.ascontiguousarray(points[:, :3], np.float32)
    n = len(pts)
    perm = np.arange(n, dtype=np.int64)
    n_blocks = 1 << depth
    starts = np.zeros(n_blocks, np.int64)
    counts = np.zeros(n_blocks, np.int64)
    lib.icpio_kd_partition(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, pts.strides[0] // 4, depth,
        perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        0,
    )
    return perm, list(zip(starts.tolist(), counts.tolist()))
