"""ctypes bindings for the native host-preprocessing library.

Compiles native/l3d_host.cpp on first use (g++, cached as
native/libl3d_host.so) and falls back to numpy implementations when no
toolchain is available. Used by the host data path for fast FPS
subsampling / kNN of raw clouds before they are batched to the device.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SO = _NATIVE_DIR / "libl3d_host.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _SO.exists():
            subprocess.run(
                [
                    "g++", "-O3", "-march=native", "-shared", "-fPIC",
                    str(_NATIVE_DIR / "l3d_host.cpp"), "-o", str(_SO),
                ],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(_SO))
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.l3d_fps.argtypes = [f32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, i32p]
        lib.l3d_knn.argtypes = [f32p, ctypes.c_int32, f32p, ctypes.c_int32, ctypes.c_int32, i32p]
        lib.l3d_jitter.argtypes = [f32p, ctypes.c_int32, ctypes.c_float, ctypes.c_float, ctypes.c_uint64]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def fps_host(points: np.ndarray, npoint: int, start_index: int = 0) -> np.ndarray:
    """Greedy FPS indices for a single (N, 3) float32 cloud."""
    points = np.ascontiguousarray(points[:, :3], np.float32)
    lib = _load()
    out = np.empty(npoint, np.int32)
    if lib is not None:
        lib.l3d_fps(points, points.shape[0], npoint, start_index, out)
        return out
    # numpy fallback (same greedy algorithm)
    n = points.shape[0]
    dist = np.full(n, np.inf, np.float32)
    cur = start_index
    for i in range(npoint):
        out[i] = cur
        d = np.sum((points - points[cur]) ** 2, -1)
        dist = np.minimum(dist, d)
        cur = int(np.argmax(dist))
    return out


def knn_host(points: np.ndarray, queries: np.ndarray, k: int) -> np.ndarray:
    """(Q, k) nearest-neighbor indices of queries among points, nearest first."""
    points = np.ascontiguousarray(points[:, :3], np.float32)
    queries = np.ascontiguousarray(queries[:, :3], np.float32)
    lib = _load()
    out = np.empty((queries.shape[0], k), np.int32)
    if lib is not None:
        lib.l3d_knn(points, points.shape[0], queries, queries.shape[0], k, out)
        return out
    d = np.sum((queries[:, None] - points[None]) ** 2, -1)
    return np.argsort(d, axis=-1)[:, :k].astype(np.int32)


def jitter_host(points: np.ndarray, sigma=0.04, clip=0.05, seed=0) -> np.ndarray:
    """Clipped gaussian jitter in place semantics of the reference
    (dataloaders.py:63-67); returns a new array."""
    out = np.ascontiguousarray(points, np.float32).copy()
    lib = _load()
    if lib is not None:
        lib.l3d_jitter(out.reshape(-1), out.size, sigma, clip, seed or 1)
        return out
    rng = np.random.default_rng(seed)
    s = sigma * rng.random()
    out += np.clip(s * rng.standard_normal(out.shape), -clip, clip).astype(np.float32)
    return out
