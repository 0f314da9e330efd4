"""Host RNS base and base-converter precompute (exact integers).

Equivalent of the reference's host RNSBase/BaseConverter
(include/host/rns.h:15-198, src/host/rns.cu): punctured products Q/q_i and
their inverses, cross-base matrices [Q/q_i mod p_j], and the constants that
feed the device base-conversion kernels.

Where the reference precomputes `double` reciprocals 1/q_i for the HPS
floating-point correction (rns.cu, rns_bconv.cu:354), we instead precompute
the exact fixed-point pair (U_i, V_i) with 2^64 = U_i * q_i + V_i, enabling
the device to evaluate floor(sum y_i / q_i) exactly in integer arithmetic
(see ops/bconv.py) — the TPU has no fast f64, and the integer path is both
faster there and strictly more accurate.
"""

from __future__ import annotations

from math import gcd
from typing import List, Sequence

from .modulus import compute_shoup
from .numth import invert_mod


class RNSBase:
    """An ordered RNS base {q_0..q_{k-1}} with CRT precompute."""

    def __init__(self, moduli: Sequence[int]):
        self.moduli: List[int] = [int(m) for m in moduli]
        k = len(self.moduli)
        if k == 0:
            raise ValueError("empty RNS base")
        for i in range(k):
            for j in range(i + 1, k):
                if gcd(self.moduli[i], self.moduli[j]) != 1:
                    raise ValueError("RNS moduli must be pairwise coprime")
        self.size = k
        self.prod = 1
        for q in self.moduli:
            self.prod *= q
        # punctured products Q/q_i and inverses mod q_i
        self.punctured = [self.prod // q for q in self.moduli]
        self.qhat_mod_qi = [p % q for p, q in zip(self.punctured, self.moduli)]
        self.qhat_inv_mod_qi = [invert_mod(h, q)
                                for h, q in zip(self.qhat_mod_qi, self.moduli)]
        self.qhat_inv_shoup = [compute_shoup(v, q)
                               for v, q in zip(self.qhat_inv_mod_qi, self.moduli)]
        # exact fixed-point reciprocals: 2^64 = U*q + V
        self.U = [(1 << 64) // q for q in self.moduli]
        self.V = [(1 << 64) - u * q for u, q in zip(self.U, self.moduli)]

    def decompose(self, value: int) -> List[int]:
        return [value % q for q in self.moduli]

    def compose(self, residues: Sequence[int]) -> int:
        assert len(residues) == self.size
        acc = 0
        for r, h, hinv, q in zip(residues, self.punctured,
                                 self.qhat_inv_mod_qi, self.moduli):
            acc += (r * hinv % q) * h
        return acc % self.prod

    def extend(self, extra: Sequence[int]) -> "RNSBase":
        return RNSBase(self.moduli + [int(m) for m in extra])


class BaseConverter:
    """Constants for converting RNS representation from ibase to obase.

    Device semantics (ops/bconv.py):
      y_i   = [x_i * (Q/q_i)^{-1}]_{q_i}
      out_j = [ sum_i y_i * (Q/q_i)  -  v * Q ]_{p_j},  v = floor(sum y_i/q_i)
    Reference: BaseConverter (host/rns.h:135-198) + bConv_BEHZ / bConv_HPS
    (src/rns_bconv.cu:212,354).
    """

    def __init__(self, ibase: RNSBase, obase: RNSBase):
        self.ibase = ibase
        self.obase = obase
        # (k_out, k_in) matrix of punctured products mod p_j
        self.qhat_mod_p = [[h % p for h in ibase.punctured]
                           for p in obase.moduli]
        # Q mod p_j (for the v*Q correction)
        self.q_mod_p = [ibase.prod % p for p in obase.moduli]
        # 2^64 mod p_j (for wide reductions against small output primes)
        self.pow64_mod_p = [(1 << 64) % p for p in obase.moduli]
