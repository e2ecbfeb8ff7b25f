"""ctypes bindings for the native C++ data loader (runtime/native/),
with transparent numpy fallback when the shared library is unavailable.

The library is compiled lazily with the in-tree Makefile on first use
(g++ is part of the deployment image; pybind11 is not, hence the plain
C ABI + ctypes).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

from ..utils import logging_util as log

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libio_native.so")
_lib = None
_lib_tried = False

MAX_POINTS = 400000


def _load_library() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:
            log.warn("[native_io] build failed ({}); using numpy fallback", repr(e))
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.lo_load_kitti_bin.restype = ctypes.c_long
        lib.lo_load_kitti_bin.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long]
        lib.lo_count_kitti_bin.restype = ctypes.c_long
        lib.lo_count_kitti_bin.argtypes = [ctypes.c_char_p]
        lib.lo_prefetcher_create.restype = ctypes.c_void_p
        lib.lo_prefetcher_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_long, ctypes.c_int]
        lib.lo_prefetcher_next.restype = ctypes.c_long
        lib.lo_prefetcher_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long]
        lib.lo_prefetcher_destroy.restype = None
        lib.lo_prefetcher_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
    except OSError as e:
        log.warn("[native_io] load failed ({}); using numpy fallback", repr(e))
    return _lib


def load_kitti_binary(path: str) -> np.ndarray:
    """(N, 3) float32 from a KITTI .bin file."""
    lib = _load_library()
    if lib is not None:
        buf = np.empty((MAX_POINTS, 3), np.float32)
        n = lib.lo_load_kitti_bin(
            path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            MAX_POINTS)
        if n >= 0:
            return buf[:n].copy()
    raw = np.fromfile(path, dtype=np.float32)
    return raw.reshape(-1, 4)[:, :3].copy()


class Prefetcher:
    """Ordered read-ahead over a file list; decodes scan i+1..i+k on a C++
    thread while scan i is being processed on the device. Falls back to
    synchronous numpy loading without the native library."""

    def __init__(self, paths: List[str], lookahead: int = 4):
        self._paths = list(paths)
        self._idx = 0
        self._handle = None
        lib = _load_library()
        if lib is not None and self._paths:
            arr = (ctypes.c_char_p * len(self._paths))(
                *[p.encode() for p in self._paths])
            self._handle = lib.lo_prefetcher_create(arr, len(self._paths), lookahead)
            self._lib = lib

    def next(self) -> Optional[np.ndarray]:
        if self._idx >= len(self._paths):
            return None
        if self._handle:
            buf = np.empty((MAX_POINTS, 3), np.float32)
            n = self._lib.lo_prefetcher_next(
                self._handle, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                MAX_POINTS)
            self._idx += 1
            if n < 0:
                return None
            return buf[:n]
        path = self._paths[self._idx]
        self._idx += 1
        return load_kitti_binary(path)

    def close(self):
        if self._handle:
            self._lib.lo_prefetcher_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
