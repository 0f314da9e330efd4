"""Encryption parameters (reference: include/host/encryptionparams.h).

Parameter names match the reference for test parity: scheme, poly_modulus_degree,
coeff_modulus (data primes followed by special primes), plain_modulus,
special_modulus_size (alpha), mul_tech (BFV multiplication technique).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

from ..host import hestd
from ..host.modulus import Modulus


class Scheme(enum.Enum):
    NONE = 0
    BFV = 1
    CKKS = 2
    BGV = 3


class MulTech(enum.Enum):
    """BFV multiplication technique (reference: mul_tech_type)."""

    BEHZ = 0
    HPS = 1
    HPS_OVERQ = 2
    HPS_OVERQ_LEVELED = 3


@dataclass(frozen=True)
class EncryptionParameters:
    scheme: Scheme
    poly_modulus_degree: int
    coeff_modulus: Tuple[int, ...]          # data primes then special primes
    plain_modulus: int = 0                  # BFV/BGV only
    special_modulus_size: int = 1           # alpha (hybrid keyswitching)
    mul_tech: MulTech = MulTech.HPS
    sec_level: int = 0                      # 0 disables HE-std enforcement
    galois_elts: Tuple[int, ...] = ()

    def __post_init__(self):
        n = self.poly_modulus_degree
        if n < 2 or n & (n - 1):
            raise ValueError("poly_modulus_degree must be a power of two")
        if len(self.coeff_modulus) < 1:
            raise ValueError("coeff_modulus must not be empty")
        if self.special_modulus_size < 1 or (
                self.special_modulus_size >= len(self.coeff_modulus)):
            raise ValueError("need 1 <= special_modulus_size < #coeff_modulus")
        if self.scheme in (Scheme.BFV, Scheme.BGV) and self.plain_modulus < 2:
            raise ValueError("BFV/BGV require a plain modulus")
        total_bits = sum(int(q).bit_length() for q in self.coeff_modulus)
        if self.sec_level and total_bits > hestd.max_coeff_modulus_bits(
                n, self.sec_level):
            raise ValueError(
                f"coeff modulus ({total_bits} bits) exceeds HE-std budget for "
                f"N={n} at {self.sec_level}-bit security")

    @staticmethod
    def create(scheme: Scheme, poly_modulus_degree: int,
               coeff_modulus: Sequence, plain_modulus=0,
               special_modulus_size: int = 1,
               mul_tech: MulTech = MulTech.HPS,
               sec_level: int = 0,
               galois_elts: Sequence[int] = ()) -> "EncryptionParameters":
        cm = tuple(int(m) for m in coeff_modulus)
        return EncryptionParameters(
            scheme=scheme, poly_modulus_degree=poly_modulus_degree,
            coeff_modulus=cm, plain_modulus=int(plain_modulus),
            special_modulus_size=special_modulus_size, mul_tech=mul_tech,
            sec_level=sec_level, galois_elts=tuple(galois_elts))

    @property
    def n(self) -> int:
        return self.poly_modulus_degree

    @property
    def size_qp(self) -> int:
        return len(self.coeff_modulus)

    @property
    def size_q(self) -> int:
        return len(self.coeff_modulus) - self.special_modulus_size

    @property
    def size_p(self) -> int:
        return self.special_modulus_size

    @property
    def data_moduli(self) -> Tuple[int, ...]:
        return self.coeff_modulus[:self.size_q]

    @property
    def special_moduli(self) -> Tuple[int, ...]:
        return self.coeff_modulus[self.size_q:]
