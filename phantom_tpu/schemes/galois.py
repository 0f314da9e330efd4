"""Galois automorphism engine: element algebra and permutation tables.

Equivalent of the reference's PhantomGaloisTool (include/galois.cuh:14-159,
src/galois.cu): step -> element via powers of the generator 5, NTT-domain
permutation tables (pure gather: the NTT layout out[k] = p(psi^{2*rev(k)+1})
turns sigma_g into an index permutation), and coefficient-domain index-raw
tables with sign flips for BFV.

All tables are built host-side once per context and applied on device as a
single gather (+ conditional negate in coefficient domain) — XLA fuses the
gather with neighbouring elementwise work.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

GENERATOR = 5


def reverse_bits(x: int, bits: int) -> int:
    r = 0
    for _ in range(bits):
        r = (r << 1) | (x & 1)
        x >>= 1
    return r


def get_elt_from_step(step: int, n: int) -> int:
    """Rotation step -> Galois element (reference: get_elt_from_step,
    galois.cuh:16-49).  step 0 means conjugation (element 2N-1)."""
    m = 2 * n
    if step == 0:
        return m - 1
    period = n // 2
    step = step % period
    return pow(GENERATOR, step, m)


def get_elts_from_steps(steps: Sequence[int], n: int) -> List[int]:
    return [get_elt_from_step(s, n) for s in steps]


def default_elts(n: int) -> List[int]:
    """All power-of-two rotations plus conjugation (reference:
    src/galois.cu:41-65 default element set)."""
    elts = []
    step = 1
    while step < n // 2:
        elts.append(get_elt_from_step(step, n))
        elts.append(get_elt_from_step(-step, n))
        step <<= 1
    elts.append(2 * n - 1)  # conjugation / rotate_columns
    return elts


def make_ntt_perm(elt: int, n: int) -> np.ndarray:
    """Gather indices for NTT-form operands: out[k] = in[perm[k]].

    With the evaluation layout out[k] = p(psi^{2*rev(k)+1}),
    (sigma_g p)(psi^{e}) = p(psi^{e*g}), so
    perm[k] = rev(((2*rev(k)+1)*g mod 2n - 1) / 2).
    Reference: PhantomGaloisTool permutation tables (galois.cuh:77-131).
    """
    logn = n.bit_length() - 1
    m = 2 * n
    perm = np.zeros(n, dtype=np.int64)
    for k in range(n):
        e = (2 * reverse_bits(k, logn) + 1) * elt % m
        perm[k] = reverse_bits((e - 1) >> 1, logn)
    return perm


def make_coeff_perm(elt: int, n: int) -> Tuple[np.ndarray, np.ndarray]:
    """Coefficient-domain gather: out[j] = sign[j] ? -in[src[j]] : in[src[j]].

    sigma_g maps coeff i to position i*g mod 2n with negacyclic sign; the
    gather form inverts that map with g^{-1} mod 2n.
    Reference: apply_galois index-raw tables (galois.cu:20-39).
    """
    m = 2 * n
    ginv = pow(elt, -1, m)
    src = np.zeros(n, dtype=np.int64)
    neg = np.zeros(n, dtype=bool)
    for j in range(n):
        i = j * ginv % m
        if i < n:
            src[j] = i
        else:
            src[j] = i - n
            neg[j] = True
    return src, neg


class GaloisTool:
    """Per-context cache of device permutation tables.

    Lives on Context as a static (non-pytree) field; the tables are a pure
    function of n, so equality/hash are keyed on n — two contexts with the
    same degree share a jit cache entry.
    """

    def __init__(self, n: int):
        self.n = n
        self._ntt: Dict[int, jnp.ndarray] = {}
        self._coeff: Dict[int, Tuple[jnp.ndarray, jnp.ndarray]] = {}

    def __eq__(self, other):
        return isinstance(other, GaloisTool) and other.n == self.n

    def __hash__(self):
        return hash(("GaloisTool", self.n))

    def ntt_perm(self, elt: int) -> jnp.ndarray:
        if elt not in self._ntt:
            self._ntt[elt] = jnp.asarray(make_ntt_perm(elt, self.n))
        return self._ntt[elt]

    def coeff_perm(self, elt: int):
        if elt not in self._coeff:
            src, neg = make_coeff_perm(elt, self.n)
            self._coeff[elt] = (jnp.asarray(src), jnp.asarray(neg))
        return self._coeff[elt]

    def apply_ntt(self, x: jnp.ndarray, elt: int) -> jnp.ndarray:
        """x: (..., N) NTT form -> permuted."""
        return x[..., self.ntt_perm(elt)]

    def apply_coeff(self, x: jnp.ndarray, elt: int,
                    q: jnp.ndarray) -> jnp.ndarray:
        """x: (..., L, N) coeff form, q: (L,) moduli -> sigma_g(x)."""
        src, negmask = self.coeff_perm(elt)
        g = x[..., src]
        negated = jnp.where(g == 0, jnp.uint64(0), q[:, None] - g)
        return jnp.where(negmask[None, :], negated, g)
