# Copyright 2026. Apache License 2.0.
"""ctypes binding for the native C++ data loader (native/medloader.cpp).

Builds the shared library on first use (g++ available in the image;
pybind11 is not, so the binding is a plain C ABI). Falls back to numpy
loading when the toolchain is unavailable.
"""

import ctypes
import os
import subprocess

import numpy as np

from .utils import logger

_LIB = None
_BUILD_FAILED = False


def _lib_path():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(root, "native", "libmedloader.so")


def _src_path():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(root, "native", "medloader.cpp")


def build_library(force=False):
    """Compile native/medloader.cpp -> libmedloader.so."""
    lib = _lib_path()
    src = _src_path()
    if os.path.exists(lib) and not force and \
            os.path.getmtime(lib) >= os.path.getmtime(src):
        return lib
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
           src, "-o", lib]
    subprocess.check_call(cmd)
    return lib


def get_lib():
    """Load (building if needed) the native library; None on failure."""
    global _LIB, _BUILD_FAILED
    if _LIB is not None or _BUILD_FAILED:
        return _LIB
    try:
        path = build_library()
        lib = ctypes.CDLL(path)
        lib.ml_create.restype = ctypes.c_void_p
        lib.ml_create.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                  ctypes.c_int, ctypes.c_int,
                                  ctypes.c_longlong]
        lib.ml_destroy.argtypes = [ctypes.c_void_p]
        lib.ml_prefetch.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_int),
                                    ctypes.c_int]
        lib.ml_load_f32.restype = ctypes.c_longlong
        lib.ml_load_f32.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                    ctypes.POINTER(ctypes.c_float),
                                    ctypes.c_longlong]
        lib.ml_load_i32.restype = ctypes.c_longlong
        lib.ml_load_i32.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                    ctypes.POINTER(ctypes.c_int32),
                                    ctypes.c_longlong]
        lib.ml_shape.restype = ctypes.c_int
        lib.ml_shape.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                 ctypes.POINTER(ctypes.c_longlong)]
        _LIB = lib
    except Exception as e:  # pragma: no cover - toolchain missing
        logger.warning("native medloader unavailable ({}); falling back "
                       "to numpy loading".format(e))
        _BUILD_FAILED = True
    return _LIB


class NativeVolumeLoader:
    """Threaded .npy volume loader with RAM cache and prefetch.

    Args:
        paths: list of .npy file paths (indexable).
        threads: IO/decoder threads.
        cache_bytes: LRU cache budget.
    """

    def __init__(self, paths, threads=4, cache_bytes=2 << 30):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native medloader unavailable")
        self._lib = lib
        self._paths = [os.fspath(p) for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(
            *[p.encode() for p in self._paths])
        self._handle = lib.ml_create(arr, len(self._paths), threads,
                                     cache_bytes)
        if not self._handle:
            raise RuntimeError("ml_create failed")

    def __len__(self):
        return len(self._paths)

    def prefetch(self, indices):
        idxs = (ctypes.c_int * len(indices))(*[int(i) for i in indices])
        self._lib.ml_prefetch(self._handle, idxs, len(indices))

    def shape(self, idx):
        dims = (ctypes.c_longlong * 8)()
        nd = self._lib.ml_shape(self._handle, int(idx), dims)
        if nd < 0:
            raise IOError("failed to read {}".format(self._paths[idx]))
        return tuple(int(dims[i]) for i in range(nd))

    def load_f32(self, idx, out=None):
        shape = self.shape(idx)
        n = int(np.prod(shape))
        if out is None:
            out = np.empty(shape, np.float32)
        got = self._lib.ml_load_f32(
            self._handle, int(idx),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
        if got != n:
            raise IOError("short read on {}".format(self._paths[idx]))
        return out

    def load_i32(self, idx, out=None):
        shape = self.shape(idx)
        n = int(np.prod(shape))
        if out is None:
            out = np.empty(shape, np.int32)
        got = self._lib.ml_load_i32(
            self._handle, int(idx),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n)
        if got != n:
            raise IOError("short read on {}".format(self._paths[idx]))
        return out

    def load_batch(self, indices, dtype=np.float32):
        """Contiguous [N, ...] batch (all volumes must share a shape)."""
        shape = self.shape(indices[0])
        out = np.empty((len(indices),) + shape, dtype)
        self.prefetch(indices)
        for i, idx in enumerate(indices):
            if dtype == np.float32:
                self.load_f32(idx, out[i])
            else:
                self.load_i32(idx, out[i])
        return out

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.ml_destroy(self._handle)
        except Exception:
            pass
