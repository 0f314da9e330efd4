"""Small host helpers bridging exact-integer constants to device arrays."""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np

_M64 = (1 << 64) - 1


def to_u64_array(values: Sequence[int]) -> np.ndarray:
    """Exact Python ints (< 2^64) -> numpy uint64 array."""
    return np.array([int(v) & _M64 for v in values], dtype=np.uint64)


def split_u128(values: Sequence[int]):
    """Exact ints (< 2^128) -> (lo, hi) numpy uint64 arrays."""
    lo = np.array([int(v) & _M64 for v in values], dtype=np.uint64)
    hi = np.array([(int(v) >> 64) & _M64 for v in values], dtype=np.uint64)
    return lo, hi


class ModulusVec(NamedTuple):
    """Device-resident per-limb modulus constants (DModulus equivalent,
    reference include/ntt.cuh:6-32): value + 2^128 Barrett ratio words."""

    q: jnp.ndarray          # (L,) uint64
    ratio_lo: jnp.ndarray   # (L,) floor(2^128/q) low word
    ratio_hi: jnp.ndarray   # (L,) floor(2^128/q) high word


def modulus_vec(moduli: Sequence[int]) -> ModulusVec:
    qs = [int(m) for m in moduli]
    ratios = [(1 << 128) // q for q in qs]
    lo, hi = split_u128(ratios)
    return ModulusVec(q=jnp.asarray(to_u64_array(qs)),
                      ratio_lo=jnp.asarray(lo), ratio_hi=jnp.asarray(hi))


def ratios_for(q_array) -> tuple:
    """Barrett ratio words for a uint64 modulus array (host computation)."""
    qs = [int(v) for v in np.asarray(q_array)]
    ratios = [(1 << 128) // q for q in qs]
    lo, hi = split_u128(ratios)
    return jnp.asarray(lo), jnp.asarray(hi)
