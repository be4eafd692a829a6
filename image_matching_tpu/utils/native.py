"""ctypes bindings for the native host runtime (native/imtpu_native.cpp).

Falls back to pure-Python implementations when the shared library has not
been built (`make -C native`)."""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _ensure_built(path: str):
    """Build the shared library in-tree when missing or stale (the
    reference ships a CMake build; ours is `make -C native`, run lazily)."""
    src_dir = os.path.join(os.path.dirname(path), "..", "native")
    src = os.path.join(src_dir, "imtpu_native.cpp")
    if not os.path.exists(src):
        return
    if os.path.exists(path) and os.path.getmtime(path) >= os.path.getmtime(src):
        return
    import subprocess

    try:
        subprocess.run(["make", "-C", src_dir], capture_output=True,
                       timeout=120, check=False)
    except Exception:
        pass


def _lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "_native.so"))
    _ensure_built(path)
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
        lib.imtpu_enroll_group.restype = None
        lib.imtpu_enroll_group.argtypes = [
            np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS"),
            ctypes.c_long, ctypes.c_long, ctypes.c_long,
            np.ctypeslib.ndpointer(dtype=np.uint32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(dtype=np.uint32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(dtype=np.uint32, flags="C_CONTIGUOUS"),
            ctypes.c_uint32, ctypes.c_uint32,
            np.ctypeslib.ndpointer(dtype=np.uint32, flags="C_CONTIGUOUS"),
            ctypes.c_int,
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


def enroll_group(m_plus_e: np.ndarray, primes: np.ndarray, psis: np.ndarray,
                 s_eval: np.ndarray, seed: int, group: int,
                 n_threads: int = 0) -> np.ndarray | None:
    """Host-side seeded symmetric encryption of one DB group (see
    native/imtpu_native.cpp imtpu_enroll_group): [B, N] int64 coeffs ->
    c0 [B, L, N] uint32 Montgomery/eval."""
    lib = _lib()
    if lib is None:
        return None
    if not n_threads:
        n_threads = os.cpu_count() or 1
    m_plus_e = np.ascontiguousarray(m_plus_e, dtype=np.int64)
    B, N = m_plus_e.shape
    primes = np.ascontiguousarray(primes, dtype=np.uint32)
    L = primes.shape[0]
    psis = np.ascontiguousarray(psis[:L], dtype=np.uint32)
    s_eval = np.ascontiguousarray(s_eval[:L], dtype=np.uint32)
    out = np.empty((B, L, N), dtype=np.uint32)
    lib.imtpu_enroll_group(m_plus_e, B, N, L, primes, psis, s_eval,
                           seed & 0xFFFFFFFF, group & 0xFFFFFFFF, out,
                           n_threads)
    return out


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
