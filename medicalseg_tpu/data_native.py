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

# out_kind codes shared with native/medloader.cpp hu_resize_run; bf16 is
# written into a uint16 buffer and viewed as ml_dtypes.bfloat16.
_OUT_KINDS = {
    "float32": (0, np.float32),
    "bfloat16": (1, np.uint16),
    "uint8": (2, np.uint8),
}


def _view_bf16(arr):
    import ml_dtypes
    return arr.view(ml_dtypes.bfloat16)


def hu_resize_array(vol, size, hu_min=-1200.0, hu_max=600.0,
                    hu_nan=-2000.0, out_dtype="float32", window=True,
                    threads=0):
    """Fused HU-window + trilinear resize of an in-memory volume
    (float32 or int16 [D, H, W]) via the native kernel; matches
    ops.hu_norm_resize / resize3d(order=1) numerics. Raises if the
    native library is unavailable (callers fall back to the jnp path).
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native medloader unavailable")
    vol = np.ascontiguousarray(vol)
    if vol.ndim != 3:
        raise ValueError("expected [D, H, W], got {}".format(vol.shape))
    od, oh, ow = (int(s) for s in size)
    out_kind, np_dtype = _OUT_KINDS[out_dtype]
    out = np.empty((od, oh, ow), np_dtype)
    d, h, w = (int(s) for s in vol.shape)
    args = (vol.ctypes.data_as(ctypes.c_void_p), d, h, w,
            out.ctypes.data_as(ctypes.c_void_p), od, oh, ow,
            hu_min, hu_max, hu_nan, out_kind, 1 if window else 0,
            int(threads))
    if vol.dtype == np.float32:
        got = lib.ml_hu_resize_f32(*args)
    elif vol.dtype == np.int16:
        got = lib.ml_hu_resize_i16(*args)
    else:
        return hu_resize_array(vol.astype(np.float32), size, hu_min,
                               hu_max, hu_nan, out_dtype, window, threads)
    if got != od * oh * ow:
        raise RuntimeError("ml_hu_resize failed")
    return _view_bf16(out) if out_dtype == "bfloat16" else out


def gzip_read_bytes(path):
    """Inflate a whole gzip file via the native backend (libdeflate,
    one-shot — measured 2-3x the Python gzip module on CT payloads).
    Returns a bytes-like memoryview (zero-copy into the decode buffer;
    it keeps that buffer alive for the caller's lifetime), or None when
    the native path is unavailable (caller falls back to the gzip
    module). Handles multi-member streams."""
    lib = get_lib()
    if lib is None:
        return None
    pb = os.fsencode(path)
    hint = lib.ml_gzip_isize(pb)
    if hint < 0:
        return None
    try:
        fsize = os.path.getsize(path)
    except OSError:
        return None
    # ISIZE is exact for the single-member streams scanners emit; only
    # multi-member files need more, handled by the -2 grow-retry below.
    # (Starting at fsize*4 page-faulted a 4x-oversized fresh buffer per
    # call — measured ~4x slower than the fused native path on 105 MB
    # CT payloads.)
    cap = max(int(hint), fsize, 1 << 20)
    for _ in range(3):
        out = np.empty(cap, np.uint8)
        got = lib.ml_gzip_read(pb, out.ctypes.data_as(ctypes.c_void_p),
                               cap)
        if got >= 0:
            # zero-copy view (copying 100+ MB payloads costs real ms on
            # this 1-core host); callers treat it as bytes-like. When a
            # grow-retry left the buffer far oversized (multi-member
            # streams), copy to a right-sized array instead of pinning
            # 4x+ the payload for the caller's lifetime.
            if got * 2 < cap:
                return bytes(memoryview(out)[:got])
            return memoryview(out)[:got]
        if got != -2:  # -3 no backend / -4 corrupt: let gzip module try
            return None
        cap *= 4
    return None


def load_nii_hu_resize(path, size, hu_min=-1200.0, hu_max=600.0,
                       hu_nan=-2000.0, out_dtype="bfloat16", window=True,
                       threads=0):
    """One-shot .nii/.nii.gz ingest: native inflate + header parse +
    fused HU-window/trilinear-resize, no intermediate Python-side
    volume. Raises RuntimeError when the native fast path can't handle
    the file (caller falls back to io.nifti.read + hu_resize_array).
    Matches that fallback's numerics exactly (same hu_resize_run)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native medloader unavailable")
    od, oh, ow = (int(s) for s in size)
    out_kind, np_dtype = _OUT_KINDS[out_dtype]
    out = np.empty((od, oh, ow), np_dtype)
    dims = (ctypes.c_longlong * 3)()
    got = lib.ml_load_nii_hu_resize(
        os.fsencode(path), out.ctypes.data_as(ctypes.c_void_p), od, oh,
        ow, hu_min, hu_max, hu_nan, out_kind, 1 if window else 0,
        int(threads), dims)
    if got != od * oh * ow:
        raise RuntimeError(
            "ml_load_nii_hu_resize({}) failed with code {}".format(
                path, got))
    return _view_bf16(out) if out_dtype == "bfloat16" else out


def _lib_path():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(root, "native", "libmedloader.so")


def _src_path():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(root, "native", "medloader.cpp")


def build_library(force=False):
    """Compile native/medloader.cpp -> libmedloader.so.

    Tries gzip backends in speed order: libdeflate (one-shot inflate,
    2-3x zlib) then zlib; a build with neither still provides every
    non-gzip entry point (ml_gzip_* return -3 and Python falls back to
    its gzip module)."""
    lib = _lib_path()
    src = _src_path()
    if os.path.exists(lib) and not force and \
            os.path.getmtime(lib) >= os.path.getmtime(src):
        return lib
    base = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
            src, "-o", lib]
    # -march=native first (vectorizes the resize inner loops); plain
    # -O3 fallback keeps odd hosts working.
    for extra in (["-march=native", "-DML_WITH_DEFLATE", "-ldeflate"],
                  ["-DML_WITH_DEFLATE", "-ldeflate"],
                  ["-DML_WITH_ZLIB", "-lz"], []):
        try:
            subprocess.check_call(
                base + extra, stderr=subprocess.DEVNULL)
            return lib
        except subprocess.CalledProcessError:
            continue
    # surface the real error from the preferred configuration
    subprocess.check_call(base + ["-DML_WITH_DEFLATE", "-ldeflate"])
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
        lib.ml_load_u8.restype = ctypes.c_longlong
        lib.ml_load_u8.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                   ctypes.POINTER(ctypes.c_uint8),
                                   ctypes.c_longlong]
        lib.ml_load_hu_resize.restype = ctypes.c_longlong
        lib.ml_load_hu_resize.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.ml_hu_resize_f32.restype = ctypes.c_longlong
        lib.ml_hu_resize_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_int,
            ctypes.c_int, ctypes.c_int]
        lib.ml_hu_resize_i16.restype = ctypes.c_longlong
        lib.ml_hu_resize_i16.argtypes = lib.ml_hu_resize_f32.argtypes
        lib.ml_gzip_isize.restype = ctypes.c_longlong
        lib.ml_gzip_isize.argtypes = [ctypes.c_char_p]
        lib.ml_gzip_read.restype = ctypes.c_longlong
        lib.ml_gzip_read.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                     ctypes.c_longlong]
        lib.ml_load_nii_hu_resize.restype = ctypes.c_longlong
        lib.ml_load_nii_hu_resize.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
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

    def load_u8(self, idx, out=None):
        shape = self.shape(idx)
        n = int(np.prod(shape))
        if out is None:
            out = np.empty(shape, np.uint8)
        got = self._lib.ml_load_u8(
            self._handle, int(idx),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n)
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
            elif dtype == np.uint8:
                self.load_u8(idx, out[i])
            else:
                self.load_i32(idx, out[i])
        return out

    def load_hu_resize(self, idx, size, hu_min=-1200.0, hu_max=600.0,
                       hu_nan=-2000.0, out_dtype="float32", window=True,
                       threads=0, out=None):
        """Fused HU-window + trilinear resize of volume ``idx`` to
        ``size`` (d, h, w) — same math as ops.hu_norm_resize, run on the
        host so only ``size``-shaped bytes cross the host->device wire.

        out_dtype: 'float32' | 'bfloat16' | 'uint8'.
        """
        od, oh, ow = (int(s) for s in size)
        out_kind, np_dtype = _OUT_KINDS[out_dtype]
        if out is None:
            out = np.empty((od, oh, ow), np_dtype)
        got = self._lib.ml_load_hu_resize(
            self._handle, int(idx), out.ctypes.data_as(ctypes.c_void_p),
            od, oh, ow, hu_min, hu_max, hu_nan, out_kind,
            1 if window else 0, int(threads))
        if got != od * oh * ow:
            raise IOError("hu_resize failed on {}".format(
                self._paths[idx]))
        return _view_bf16(out) if out_dtype == "bfloat16" else out

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.ml_destroy(self._handle)
        except Exception:
            pass
