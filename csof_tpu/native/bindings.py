"""Build-on-first-use ctypes bindings for libcsof_native.so."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libcsof_native.so"
_lock = threading.Lock()
_lib = None
_tried = False

_DEFAULT_THREADS = max(1, (os.cpu_count() or 1))


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < (
                _NATIVE_DIR / "csof_native.cpp"
            ).stat().st_mtime:
                subprocess.run(
                    ["make", "-C", str(_NATIVE_DIR)],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(str(_LIB_PATH))
            i64p = ctypes.POINTER(ctypes.c_int64)
            f32p = ctypes.POINTER(ctypes.c_float)
            i32p = ctypes.POINTER(ctypes.c_int32)
            lib.extract_patches_3d_f32.argtypes = [f32p, i64p, i64p, ctypes.c_int64, i64p, f32p, ctypes.c_int]
            lib.extract_patches_2d_f32.argtypes = [f32p, i64p, i64p, ctypes.c_int64, i64p, f32p, ctypes.c_int]
            lib.minmax_normalize_f32.argtypes = [f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_float, ctypes.c_int]
            lib.zscore_normalize_f32.argtypes = [f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_float, ctypes.c_int]
            lib.one_hot_f32.argtypes = [i32p, ctypes.c_int64, ctypes.c_int32, f32p, ctypes.c_int]
            lib.csof_native_version.restype = ctypes.c_int
            assert lib.csof_native_version() == 1
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def _i64(a):
    return np.ascontiguousarray(a, np.int64).ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _f32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def extract_patches_3d(src: np.ndarray, centers: np.ndarray, patch, num_threads: int = _DEFAULT_THREADS):
    """src: (c, z, y, x) float32; centers: (n, 3); -> (n, c, *patch) with
    zero padding past borders."""
    src = np.ascontiguousarray(src, np.float32)
    centers = np.ascontiguousarray(centers, np.int64)
    patch = np.asarray(patch, np.int64)
    n = len(centers)
    out = np.empty((n, src.shape[0], *patch), np.float32)
    lib = _load()
    if lib is not None:
        lib.extract_patches_3d_f32(
            _f32(src), _i64(np.asarray(src.shape)), _i64(centers), n, _i64(patch), _f32(out),
            int(num_threads),
        )
        return out
    return _extract_fallback(src, centers, patch, out)


def extract_patches_2d(src: np.ndarray, centers: np.ndarray, patch, num_threads: int = _DEFAULT_THREADS):
    src = np.ascontiguousarray(src, np.float32)
    centers = np.ascontiguousarray(centers, np.int64)
    patch = np.asarray(patch, np.int64)
    n = len(centers)
    out = np.empty((n, src.shape[0], *patch), np.float32)
    lib = _load()
    if lib is not None:
        lib.extract_patches_2d_f32(
            _f32(src), _i64(np.asarray(src.shape)), _i64(centers), n, _i64(patch), _f32(out),
            int(num_threads),
        )
        return out
    return _extract_fallback(src, centers, patch, out)


def _extract_fallback(src, centers, patch, out):
    out[:] = 0
    spatial = src.shape[1:]
    nd = len(patch)
    for i, center in enumerate(centers):
        src_sl, dst_sl = [slice(None)], [slice(None)]
        ok = True
        for d in range(nd):
            lo = int(center[d]) - int(patch[d]) // 2
            hi = lo + int(patch[d])
            s0, s1 = max(lo, 0), min(hi, spatial[d])
            if s0 >= s1:
                ok = False
                break
            src_sl.append(slice(s0, s1))
            dst_sl.append(slice(s0 - lo, s0 - lo + (s1 - s0)))
        if ok:
            out[i][tuple(dst_sl)] = src[tuple(src_sl)]
    return out


def minmax_normalize(data: np.ndarray, eps: float = 1e-8, num_threads: int = _DEFAULT_THREADS):
    """In-place per-leading-index min-max over flattened trailing dims."""
    assert data.dtype == np.float32 and data.flags.c_contiguous
    n = data.shape[0]
    m = int(np.prod(data.shape[1:]))
    lib = _load()
    if lib is not None:
        lib.minmax_normalize_f32(_f32(data), n, m, eps, int(num_threads))
        return data
    flat = data.reshape(n, m)
    mn = flat.min(1, keepdims=True)
    mx = flat.max(1, keepdims=True)
    flat -= mn
    flat /= mx - mn + eps
    return data


def zscore_normalize(data: np.ndarray, eps: float = 1e-8, num_threads: int = _DEFAULT_THREADS):
    assert data.dtype == np.float32 and data.flags.c_contiguous
    n = data.shape[0]
    m = int(np.prod(data.shape[1:]))
    lib = _load()
    if lib is not None:
        lib.zscore_normalize_f32(_f32(data), n, m, eps, int(num_threads))
        return data
    flat = data.reshape(n, m)
    flat -= flat.mean(1, keepdims=True)
    flat /= flat.std(1, keepdims=True) + eps
    return data


def one_hot(labels: np.ndarray, num_classes: int, num_threads: int = _DEFAULT_THREADS):
    labels = np.ascontiguousarray(labels, np.int32)
    flat = labels.reshape(-1)
    out = np.empty((flat.shape[0], num_classes), np.float32)
    lib = _load()
    if lib is not None:
        lib.one_hot_f32(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            flat.shape[0], num_classes, _f32(out), int(num_threads),
        )
    else:
        out[:] = 0
        valid = (flat >= 0) & (flat < num_classes)
        out[np.arange(flat.shape[0])[valid], flat[valid]] = 1.0
    return out.reshape(*labels.shape, num_classes)
