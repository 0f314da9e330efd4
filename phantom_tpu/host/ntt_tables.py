"""Host-side NTT twiddle-table generation.

Equivalent of the reference's host `NTT` / `RNSNTT` precompute
(include/host/ntt.h:13-71, src/host/ntt.cu): for each RNS prime q == 1 mod 2N
we find a primitive 2N-th root psi, and tabulate its powers in the
bit-reversed (Harvey/SEAL) ordering used by the iterative negacyclic NTT,
together with Shoup companion words and scaled inverse-N constants.

Tables are produced as numpy uint64 arrays ready to be uploaded as device
constants.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

import numpy as np

from . import numth
from .modulus import Modulus, compute_shoup


@dataclass(frozen=True)
class NTTTables:
    """Twiddle tables for one (N, q) pair.

    root_powers[i]      = psi^{bitrev(i, log2 N)} mod q           (forward CT)
    inv_root_powers[i]  = psi^{-bitrev(i, log2 N)} mod q          (inverse GS)
    *_shoup             = floor(x * 2^64 / q) companions.
    inv_degree          = N^{-1} mod q (plus Shoup word).

    The iterative kernels index both tables identically: the stage with m
    groups consumes entries [m, 2m).  Forward applies Cooley-Tukey stages for
    m = 1..N/2; inverse applies Gentleman-Sande stages for m = N/2..1, so each
    stage exactly undoes its forward counterpart.
    """

    modulus: Modulus
    coeff_count_power: int
    root: int
    root_powers: np.ndarray
    root_powers_shoup: np.ndarray
    inv_root_powers: np.ndarray
    inv_root_powers_shoup: np.ndarray
    inv_degree: int
    inv_degree_shoup: int

    @property
    def n(self) -> int:
        return 1 << self.coeff_count_power


def _bitrev_array(values: List[int], logn: int) -> List[int]:
    out = [0] * len(values)
    for i, v in enumerate(values):
        out[numth.reverse_bits(i, logn)] = v
    return out


def make_ntt_tables(poly_modulus_degree: int, modulus: Modulus) -> NTTTables:
    n = poly_modulus_degree
    logn = n.bit_length() - 1
    q = modulus.value
    if (q - 1) % (2 * n) != 0:
        raise ValueError(f"modulus {q} is not NTT-friendly for N={n}")
    psi = numth.minimal_primitive_root(2 * n, q)

    # Native fast path: fill all four tables in C++ (phantom_tpu/native).
    from .. import native
    inv_psi_n = numth.invert_mod(psi, q)
    fast = native.fill_ntt_tables(q, psi, inv_psi_n, logn)
    if fast is not None:
        rp, rps, irp, irps = fast
        return NTTTables(
            modulus=modulus, coeff_count_power=logn, root=psi,
            root_powers=rp, root_powers_shoup=rps,
            inv_root_powers=irp, inv_root_powers_shoup=irps,
            inv_degree=numth.invert_mod(n, q),
            inv_degree_shoup=compute_shoup(numth.invert_mod(n, q), q),
        )

    # Forward: powers of psi in bit-reversed order.
    powers = [1] * n
    for i in range(1, n):
        powers[i] = (powers[i - 1] * psi) % q
    root_powers = _bitrev_array(powers, logn)

    # Inverse: powers of psi^{-1} in the same bit-reversed indexing.
    inv_psi = numth.invert_mod(psi, q)
    inv_powers_nat = [1] * n
    for i in range(1, n):
        inv_powers_nat[i] = (inv_powers_nat[i - 1] * inv_psi) % q
    inv_root_powers = _bitrev_array(inv_powers_nat, logn)

    inv_degree = numth.invert_mod(n, q)

    def shoup_arr(vals: List[int]) -> np.ndarray:
        return np.array([compute_shoup(v, q) for v in vals], dtype=np.uint64)

    return NTTTables(
        modulus=modulus,
        coeff_count_power=logn,
        root=psi,
        root_powers=np.array(root_powers, dtype=np.uint64),
        root_powers_shoup=shoup_arr(root_powers),
        inv_root_powers=np.array(inv_root_powers, dtype=np.uint64),
        inv_root_powers_shoup=shoup_arr(inv_root_powers),
        inv_degree=inv_degree,
        inv_degree_shoup=compute_shoup(inv_degree, q),
    )


@dataclass(frozen=True)
class RNSNTTTables:
    """Stacked tables across an RNS base: arrays of shape (L, N) / (L,)."""

    n: int
    moduli: tuple
    root_powers: np.ndarray
    root_powers_shoup: np.ndarray
    inv_root_powers: np.ndarray
    inv_root_powers_shoup: np.ndarray
    inv_degree: np.ndarray
    inv_degree_shoup: np.ndarray


def make_rns_ntt_tables(poly_modulus_degree: int,
                        moduli: Sequence[Modulus]) -> RNSNTTTables:
    tables = [make_ntt_tables(poly_modulus_degree, m) for m in moduli]
    return RNSNTTTables(
        n=poly_modulus_degree,
        moduli=tuple(m.value for m in moduli),
        root_powers=np.stack([t.root_powers for t in tables]),
        root_powers_shoup=np.stack([t.root_powers_shoup for t in tables]),
        inv_root_powers=np.stack([t.inv_root_powers for t in tables]),
        inv_root_powers_shoup=np.stack([t.inv_root_powers_shoup for t in tables]),
        inv_degree=np.array([t.inv_degree for t in tables], dtype=np.uint64),
        inv_degree_shoup=np.array([t.inv_degree_shoup for t in tables],
                                  dtype=np.uint64),
    )
