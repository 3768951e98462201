"""ctypes bindings for the tipcore C++ host-runtime library.

Builds ``libtipcore.so`` from tipcore.cpp on first use (g++, cached next to
the source) and exposes the packing hot loops.  Every entry point has a pure
numpy fallback, so the package works without a toolchain — the native path
is an accelerator, not a dependency.  numpy/native equivalence is covered by
tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "tipcore.cpp")
_SO = os.path.join(_HERE, "libtipcore.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """The loaded library, building it if needed; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.tip_sort_edges.argtypes = [i32p, i32p, i32p, ctypes.c_int64,
                                       ctypes.c_int64, i64p]
        lib.tip_build_bitmap.argtypes = [i64p, ctypes.c_int64, u32p]
        lib.tip_pad_typed.argtypes = [i32p, i32p, i64p, i64p, i64p,
                                      ctypes.c_int64, i32p, i32p, u8p]
        lib.tip_bincount.argtypes = [i32p, ctypes.c_int64, i64p]
        _lib = lib
        return _lib


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def sort_edges_order(et: np.ndarray, dst: np.ndarray, src: np.ndarray,
                     n_nodes: int) -> np.ndarray:
    """Permutation sorting edges by (et, dst, src)."""
    lib = get_lib()
    if lib is None:
        return np.lexsort((src, dst, et))
    e = et.shape[0]
    order = np.empty(e, np.int64)
    lib.tip_sort_edges(
        _ptr(np.ascontiguousarray(et, np.int32), ctypes.c_int32),
        _ptr(np.ascontiguousarray(dst, np.int32), ctypes.c_int32),
        _ptr(np.ascontiguousarray(src, np.int32), ctypes.c_int32),
        e, n_nodes, _ptr(order, ctypes.c_int64),
    )
    return order


def build_bitmap(keys: np.ndarray, key_space: int) -> np.ndarray:
    n_words = (key_space + 31) // 32
    bitmap = np.zeros(n_words, np.uint32)
    lib = get_lib()
    if lib is None:
        words = (keys >> 5).astype(np.int64)
        bits = (keys & 31).astype(np.uint32)
        np.bitwise_or.at(bitmap, words, np.uint32(1) << bits)
        return bitmap
    k = np.ascontiguousarray(keys, np.int64)
    lib.tip_build_bitmap(_ptr(k, ctypes.c_int64), k.shape[0],
                         _ptr(bitmap, ctypes.c_uint32))
    return bitmap


def pad_typed_fill(src, dst, range_list, out_starts, total, n_nodes):
    """Fill padded (src, dst, valid) buffers; returns (psrc, pdst, valid)."""
    psrc = np.zeros(total, np.int32)
    pdst = np.full(total, n_nodes, np.int32)
    valid = np.zeros(total, np.uint8)
    lib = get_lib()
    starts = np.ascontiguousarray(range_list[:, 0], np.int64)
    ends = np.ascontiguousarray(range_list[:, 1], np.int64)
    outs = np.ascontiguousarray(out_starts, np.int64)
    if lib is None:
        for t in range(range_list.shape[0]):
            s, e, o = int(starts[t]), int(ends[t]), int(outs[t])
            n = e - s
            psrc[o:o + n] = src[s:e]
            pdst[o:o + n] = dst[s:e]
            valid[o:o + n] = 1
        return psrc, pdst, valid.astype(bool)
    lib.tip_pad_typed(
        _ptr(np.ascontiguousarray(src, np.int32), ctypes.c_int32),
        _ptr(np.ascontiguousarray(dst, np.int32), ctypes.c_int32),
        _ptr(starts, ctypes.c_int64), _ptr(ends, ctypes.c_int64),
        _ptr(outs, ctypes.c_int64), range_list.shape[0],
        _ptr(psrc, ctypes.c_int32), _ptr(pdst, ctypes.c_int32),
        _ptr(valid, ctypes.c_uint8),
    )
    return psrc, pdst, valid.astype(bool)


def bincount_i32(x: np.ndarray, n: int) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        return np.bincount(x, minlength=n).astype(np.int64)
    out = np.zeros(n, np.int64)
    xs = np.ascontiguousarray(x, np.int32)
    lib.tip_bincount(_ptr(xs, ctypes.c_int32), xs.shape[0],
                     _ptr(out, ctypes.c_int64))
    return out
