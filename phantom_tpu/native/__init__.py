"""Native (C++) host-math acceleration, loaded via ctypes.

The shared library is built on first import (one-time, cached next to the
source); every entry point has a pure-Python fallback in phantom_tpu/host/,
so the package works without a toolchain.  This mirrors the reference's
split between native host precompute and device kernels
(src/host/*.cu; SURVEY.md §2 rows 1-7).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import List, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "host_math.cpp")
_LIB = os.path.join(_HERE, "libphantom_host.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    for cc in ("g++", "c++", "clang++"):
        try:
            r = subprocess.run(
                [cc, "-O2", "-shared", "-fPIC", _SRC, "-o", _LIB],
                capture_output=True, timeout=120)
            if r.returncode == 0:
                return True
        except (OSError, subprocess.TimeoutExpired):
            continue
    return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB) or (os.path.getmtime(_LIB)
                                    < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    lib.pt_is_prime.restype = ctypes.c_int
    lib.pt_is_prime.argtypes = [ctypes.c_uint64]
    lib.pt_get_primes.restype = ctypes.c_int
    lib.pt_get_primes.argtypes = [ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
                                  ctypes.POINTER(ctypes.c_uint64)]
    lib.pt_get_primes_below.restype = ctypes.c_int
    lib.pt_get_primes_below.argtypes = [
        ctypes.c_uint64, ctypes.c_uint64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint64)]
    lib.pt_fill_ntt_tables.restype = None
    lib.pt_fill_ntt_tables.argtypes = [
        ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_int] + [
        ctypes.POINTER(ctypes.c_uint64)] * 4
    lib.pt_blake2b.restype = None
    lib.pt_blake2b.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                               ctypes.c_char_p, ctypes.c_int]
    lib.pt_salsa20_blocks.restype = None
    lib.pt_salsa20_blocks.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint64), ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_uint8)]
    for name in ("pt_sample_uniform", "pt_sample_ternary",
                 "pt_sample_error"):
        fn = getattr(lib, name)
        fn.restype = None
        fn.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint64),
                       ctypes.c_int, ctypes.c_uint64,
                       ctypes.POINTER(ctypes.c_uint64)]
    _lib = lib
    return _lib


def is_prime(n: int) -> Optional[bool]:
    lib = get_lib()
    if lib is None:
        return None
    return bool(lib.pt_is_prime(n))


def get_primes(factor: int, bit_size: int, count: int) -> Optional[List[int]]:
    lib = get_lib()
    if lib is None:
        return None
    buf = (ctypes.c_uint64 * count)()
    found = lib.pt_get_primes(factor, bit_size, count, buf)
    if found < count:
        return None
    return [int(buf[i]) for i in range(count)]


def get_primes_below(upper: int, factor: int,
                     count: int) -> Optional[List[int]]:
    lib = get_lib()
    if lib is None:
        return None
    buf = (ctypes.c_uint64 * count)()
    found = lib.pt_get_primes_below(upper, factor, count, buf)
    if found < count:
        return None
    return [int(buf[i]) for i in range(count)]


def fill_ntt_tables(q: int, psi: int, psi_inv: int, logn: int):
    """Returns (root_powers, root_shoup, inv_root_powers, inv_root_shoup)
    numpy arrays, or None without the native lib."""
    lib = get_lib()
    if lib is None:
        return None
    n = 1 << logn
    arrs = [np.empty(n, dtype=np.uint64) for _ in range(4)]
    ptrs = [a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)) for a in arrs]
    lib.pt_fill_ntt_tables(q, psi, psi_inv, logn, *ptrs)
    return tuple(arrs)


def blake2b(data: bytes, outlen: int = 64) -> Optional[bytes]:
    lib = get_lib()
    if lib is None:
        return None
    out = ctypes.create_string_buffer(outlen)
    lib.pt_blake2b(data, len(data), out, outlen)
    return out.raw


def salsa20_blocks(seed: bytes, nonces) -> Optional[np.ndarray]:
    """(M, 64) uint8 phantom-variant Salsa20 keystream blocks, one per
    nonce; None without the native lib (numpy fallback in utils/salsa20)."""
    lib = get_lib()
    if lib is None:
        return None
    nonces = np.ascontiguousarray(nonces, dtype=np.uint64).ravel()
    out = np.empty((nonces.shape[0], 64), dtype=np.uint8)
    lib.pt_salsa20_blocks(
        seed[:56], nonces.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        nonces.shape[0], out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def _sample(name: str, seed: bytes, moduli, n: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    qs = np.asarray([int(q) for q in moduli], dtype=np.uint64)
    out = np.empty((qs.shape[0], n), dtype=np.uint64)
    getattr(lib, name)(
        seed[:56], qs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        qs.shape[0], n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    return out


def sample_uniform(seed: bytes, moduli, n: int) -> Optional[np.ndarray]:
    return _sample("pt_sample_uniform", seed, moduli, n)


def sample_ternary(seed: bytes, moduli, n: int) -> Optional[np.ndarray]:
    return _sample("pt_sample_ternary", seed, moduli, n)


def sample_error(seed: bytes, moduli, n: int) -> Optional[np.ndarray]:
    return _sample("pt_sample_error", seed, moduli, n)
