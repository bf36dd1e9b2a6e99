"""ctypes bindings + on-demand build for the native ray batcher.

The shared library is compiled once per machine with g++ into the package
directory (no pybind11 in this environment; the C ABI + ctypes keeps the
binding dependency-free). Falls back cleanly: callers check
``native_available()`` and use the numpy sampler otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "raybatcher.cpp")
_LIB = os.path.join(_DIR, "libraybatcher.so")
_lock = threading.Lock()
_lib = None
_build_error = None


def _build() -> None:
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
         _SRC, "-o", _LIB],
        check=True,
        capture_output=True,
    )


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        try:
            if not os.path.exists(_LIB) or (
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
            ):
                _build()
            lib = ctypes.CDLL(_LIB)
            lib.raybatcher_create.restype = ctypes.c_void_p
            lib.raybatcher_create.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_uint64,
            ]
            lib.raybatcher_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
            lib.raybatcher_epoch.restype = ctypes.c_uint64
            lib.raybatcher_epoch.argtypes = [ctypes.c_void_p]
            lib.raybatcher_destroy.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception as e:  # pragma: no cover - toolchain-dependent
            _build_error = e
        return _lib


def native_available() -> bool:
    return _load() is not None


class NativeRayBatcher:
    """Threaded double-buffered batch server over a ray pool.

    Drop-in for data/pipeline.py::BatchedRaySampler's hot path: feed it the
    flattened ``[n_rays, 9]`` (ro|rd|rgb) pool once; ``next()`` returns the
    same dict of [n_rand] arrays, assembled off-thread in C++.
    """

    def __init__(self, rays_rgb: np.ndarray, n_rand: int, seed: int = 0,
                 img_ids: np.ndarray = None):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native batcher unavailable: {_build_error}")
        pool = np.ascontiguousarray(rays_rgb.reshape(rays_rgb.shape[0], -1),
                                    dtype=np.float32)
        self._has_ids = img_ids is not None
        if self._has_ids:
            # Image ids ride the pool as one extra float column (exact up
            # to 2^24 images) — the C++ server is row-width generic, so
            # appearance training costs no ABI change.
            pool = np.ascontiguousarray(np.concatenate(
                [pool, np.asarray(img_ids, np.float32)[:, None]], axis=1))
        self._pool = pool  # keep alive: C++ borrows the buffer
        self._lib = lib
        self.n_rand = n_rand
        self.row_dim = pool.shape[1]
        self._out = np.empty((n_rand, self.row_dim), np.float32)
        self._handle = lib.raybatcher_create(
            pool.ctypes.data_as(ctypes.c_void_p),
            pool.shape[0], self.row_dim, n_rand, seed,
        )

    def next(self):
        self._lib.raybatcher_next(
            self._handle, self._out.ctypes.data_as(ctypes.c_void_p)
        )
        batch = self._out[:, :9].reshape(self.n_rand, 3, 3)
        out = {
            "rays_o": batch[:, 0].copy(),
            "rays_d": batch[:, 1].copy(),
            "target": batch[:, 2].copy(),
        }
        if self._has_ids:
            out["img_idx"] = self._out[:, 9].astype(np.int32)
        return out

    @property
    def epoch(self) -> int:
        return int(self._lib.raybatcher_epoch(self._handle))

    def close(self):
        if self._handle:
            self._lib.raybatcher_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
