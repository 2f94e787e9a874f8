"""ctypes bindings for the native batch loader (native/sgt_loader.cpp).

Builds libsgt_loader.so on first use (g++, cached next to the source);
falls back cleanly when a compiler is unavailable so the pure-numpy path
keeps working.  The native loader owns the mmap and gathers batches with a
thread pool; `prefetch`/`wait` give an async double-buffer that overlaps
host batch assembly with device steps.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native", "sgt_loader.cpp")
_LIB_PATH = os.path.join(os.path.dirname(_SRC), "libsgt_loader.so")
_BUILD_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None


class NativeLoaderUnavailable(RuntimeError):
    pass


def _build() -> str:
    with _BUILD_LOCK:
        if (os.path.exists(_LIB_PATH)
                and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)):
            return _LIB_PATH
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
               _SRC, "-o", _LIB_PATH]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            raise NativeLoaderUnavailable(
                f"could not build native loader: {e}") from e
        return _LIB_PATH


def _lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(_build())
        lib.sgt_open.restype = ctypes.c_void_p
        lib.sgt_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.sgt_ndim.restype = ctypes.c_int
        lib.sgt_ndim.argtypes = [ctypes.c_void_p]
        lib.sgt_shape.argtypes = [ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_int64)]
        lib.sgt_gather.restype = ctypes.c_int
        lib.sgt_gather.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.sgt_prefetch.restype = ctypes.c_int
        lib.sgt_prefetch.argtypes = lib.sgt_gather.argtypes
        lib.sgt_wait.argtypes = [ctypes.c_void_p]
        lib.sgt_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
    return _LIB


class NativeClipLoader:
    """mmap-backed .npy clip gatherer with async prefetch."""

    def __init__(self, data_path: str, num_threads: int = 4):
        lib = _lib()
        self._lib = lib
        handle = lib.sgt_open(data_path.encode(), num_threads)
        if not handle:
            raise NativeLoaderUnavailable(
                f"native loader rejected {data_path} (needs C-order "
                "little-endian f4/f8 .npy)")
        self._handle = ctypes.c_void_p(handle)
        ndim = lib.sgt_ndim(self._handle)
        dims = (ctypes.c_int64 * ndim)()
        lib.sgt_shape(self._handle, dims)
        self.shape: Tuple[int, ...] = tuple(int(d) for d in dims)
        self._pending: Optional[np.ndarray] = None

    def gather(self, indices: np.ndarray) -> np.ndarray:
        """Synchronously fetch clips[indices] -> (n, *clip_shape) float32."""
        idx = np.ascontiguousarray(indices, dtype=np.int64)
        out = np.empty((len(idx),) + self.shape[1:], dtype=np.float32)
        rc = self._lib.sgt_gather(
            self._handle,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(idx),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc != 0:
            raise IndexError(f"index out of range in native gather (rc={rc})")
        return out

    def prefetch(self, indices: np.ndarray) -> None:
        """Start an async gather; retrieve with wait()."""
        idx = np.ascontiguousarray(indices, dtype=np.int64)
        out = np.empty((len(idx),) + self.shape[1:], dtype=np.float32)
        rc = self._lib.sgt_prefetch(
            self._handle,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(idx),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc == -1:
            raise RuntimeError("a prefetch is already outstanding")
        if rc != 0:
            raise IndexError("index out of range in native prefetch")
        self._keepalive = idx  # the worker reads these buffers
        self._pending = out

    def wait(self) -> np.ndarray:
        if self._pending is None:
            raise RuntimeError("no outstanding prefetch")
        self._lib.sgt_wait(self._handle)
        out, self._pending = self._pending, None
        return out

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.sgt_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
