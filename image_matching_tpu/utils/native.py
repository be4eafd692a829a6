"""ctypes bindings for the native host runtime (native/imtpu_native.cpp).

Falls back to pure-Python implementations when the shared library has not
been built (`make -C native`)."""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "..", "_native.so")
    try:
        lib = ctypes.CDLL(os.path.abspath(path))
        lib.imtpu_parse_dat.restype = ctypes.c_long
        lib.imtpu_parse_dat.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_long,
        ]
        lib.imtpu_crt_compose_centered.restype = None
        lib.imtpu_crt_compose_centered.argtypes = [
            np.ctypeslib.ndpointer(dtype=np.uint32, flags="C_CONTIGUOUS"),
            ctypes.c_long,
            ctypes.c_long,
            np.ctypeslib.ndpointer(dtype=np.uint64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS"),
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _lib() is not None


def parse_dat(path: str, max_vals: int) -> np.ndarray | None:
    lib = _lib()
    if lib is None:
        return None
    out = np.empty(max_vals, dtype=np.float64)
    n = lib.imtpu_parse_dat(path.encode(), out, max_vals)
    if n < 0:
        return None
    return out[:n]


def crt_compose_centered(res: np.ndarray, primes) -> np.ndarray | None:
    """res: uint32 [..., L, n] standard residues -> centered float64 [..., n]."""
    lib = _lib()
    if lib is None:
        return None
    res = np.ascontiguousarray(res, dtype=np.uint32)
    shape = res.shape
    L, n = shape[-2], shape[-1]
    flat = res.reshape(-1, L, n)
    pr = np.asarray([int(p) for p in primes], dtype=np.uint64)
    out = np.empty((flat.shape[0], n), dtype=np.float64)
    for b in range(flat.shape[0]):
        lib.imtpu_crt_compose_centered(flat[b], L, n, pr, out[b])
    return out.reshape(shape[:-2] + (n,))
