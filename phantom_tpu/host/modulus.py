"""Modulus objects with Barrett/Shoup precomputation (host side).

Equivalent of the reference's `Modulus` (include/host/modulus.h:14-95) and
`CoeffModulus::Create` / `PlainModulus::Batching` factories
(src/host/modulus.cu:80-111).  A `Modulus` carries the 2^128 Barrett ratio
used by both host scalar reduction and the device Barrett kernels.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Sequence

from . import numth

MOD_BIT_COUNT_MAX = 61
MOD_BIT_COUNT_MIN = 2


@dataclass(frozen=True)
class Modulus:
    """A word-size prime modulus q < 2^61 with const_ratio = floor(2^128 / q)."""

    value: int
    const_ratio: tuple = field(init=False)  # (lo, mid, remainder) 64-bit words
    is_prime: bool = field(init=False)

    def __post_init__(self):
        q = self.value
        if q != 0 and (q.bit_length() > MOD_BIT_COUNT_MAX or q < 2):
            raise ValueError(f"modulus {q} out of supported range")
        if q == 0:
            ratio = (0, 0, 0)
            prime = False
        else:
            full = (1 << 128) // q
            rem = (1 << 128) - full * q
            ratio = (full & ((1 << 64) - 1), full >> 64, rem)
            prime = numth.is_prime(q)
        object.__setattr__(self, "const_ratio", ratio)
        object.__setattr__(self, "is_prime", prime)

    def bit_count(self) -> int:
        return self.value.bit_length()

    def reduce(self, value: int) -> int:
        return value % self.value

    def __int__(self) -> int:
        return self.value


def compute_shoup(operand: int, modulus: int) -> int:
    """Shoup companion word: floor(operand * 2^64 / modulus).

    Requires operand < modulus (reference: uintarithsmallmod.h:119).
    """
    if operand >= modulus:
        raise ValueError("compute_shoup requires operand < modulus")
    return (operand << 64) // modulus


class CoeffModulus:
    """Factory for RNS coefficient modulus chains (NTT-friendly primes)."""

    @staticmethod
    def create(poly_modulus_degree: int, bit_sizes: Sequence[int]) -> List[Modulus]:
        """Distinct primes, each == 1 mod 2N, with the requested bit sizes.

        Matches the semantics of CoeffModulus::Create (src/host/modulus.cu:80):
        primes of equal bit size are distinct, searched downward from 2^bits.
        """
        if poly_modulus_degree < 2 or poly_modulus_degree & (poly_modulus_degree - 1):
            raise ValueError("poly_modulus_degree must be a power of two >= 2")
        factor = 2 * poly_modulus_degree
        counts = {}
        for b in bit_sizes:
            if b < MOD_BIT_COUNT_MIN or b > MOD_BIT_COUNT_MAX:
                raise ValueError(f"bit size {b} out of [2, 61]")
            counts[b] = counts.get(b, 0) + 1
        pools = {b: numth.get_primes(factor, b, c) for b, c in counts.items()}
        out: List[Modulus] = []
        taken = {b: 0 for b in counts}
        for b in bit_sizes:
            out.append(Modulus(pools[b][taken[b]]))
            taken[b] += 1
        return out

    @staticmethod
    def max_bit_count(poly_modulus_degree: int, sec_level: int = 128) -> int:
        from . import hestd
        return hestd.max_coeff_modulus_bits(poly_modulus_degree, sec_level)


class PlainModulus:
    """Factory for batching-capable plain moduli (primes == 1 mod 2N)."""

    @staticmethod
    def batching(poly_modulus_degree: int, bit_size: int) -> Modulus:
        return CoeffModulus.create(poly_modulus_degree, [bit_size])[0]

    @staticmethod
    def batching_many(poly_modulus_degree: int, bit_sizes: Sequence[int]) -> List[Modulus]:
        return CoeffModulus.create(poly_modulus_degree, bit_sizes)
