"""Elementwise RNS polynomial ops and ciphertext tensor products.

TPU-native equivalent of the reference's polymath kernels (src/polymath.cu):
everything is expressed as jnp ops over (..., L, N) uint64 tensors and fused
by XLA; the reference's (limb, coeff) CUDA grid is simply the array layout.
Moduli constants arrive as a ModulusVec (ops/rns_host.py) and broadcast as
(L, 1) columns.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import modmath as mm
from .rns_host import ModulusVec


def _col(v: jnp.ndarray) -> jnp.ndarray:
    return v.reshape(-1, 1)


def add_rns(a, b, mv: ModulusVec):
    return mm.add_mod(a, b, _col(mv.q))


def sub_rns(a, b, mv: ModulusVec):
    return mm.sub_mod(a, b, _col(mv.q))


def neg_rns(a, mv: ModulusVec):
    return mm.neg_mod(a, _col(mv.q))


def mul_rns(a, b, mv: ModulusVec):
    return mm.mul_mod(a, b, _col(mv.q), _col(mv.ratio_lo), _col(mv.ratio_hi))


def fma_rns(a, b, c, mv: ModulusVec):
    """(a * b + c) mod q."""
    return mm.add_mod(mul_rns(a, b, mv), c, _col(mv.q))


def scalar_mul_rns(a, s, s_shoup, mv: ModulusVec):
    """Multiply by a per-limb scalar s (L,) with Shoup companion."""
    return mm.mul_mod_shoup(a, _col(s), _col(s_shoup), _col(mv.q))


def tensor_prod_2x2(ct1, ct2, mv: ModulusVec):
    """Dyadic ciphertext product for two 2-polynomial ciphertexts (NTT form).

    ct1, ct2: (2, L, N).  Returns (3, L, N):
      c0 = a0*b0, c1 = a0*b1 + a1*b0, c2 = a1*b1.
    Reference: tensor_prod_2x2_rns_poly (src/polymath.cu:463).
    """
    a0, a1 = ct1[0], ct1[1]
    b0, b1 = ct2[0], ct2[1]
    c0 = mul_rns(a0, b0, mv)
    # cross terms: one lazy 128-bit add, one Barrett (2q^2 < q*2^64)
    h1, l1 = mm.mul_wide(a0, b1)
    h2, l2 = mm.mul_wide(a1, b0)
    hs, ls = mm.add_wide(h1, l1, h2, l2)
    c1 = mm.barrett_reduce_u128(hs, ls, _col(mv.q), _col(mv.ratio_lo),
                                _col(mv.ratio_hi))
    c2 = mul_rns(a1, b1, mv)
    return jnp.stack([c0, c1, c2])


def tensor_square_2x2(ct, mv: ModulusVec):
    """Squaring shortcut: (a0, a1)^2 -> (a0^2, 2*a0*a1, a1^2).

    Reference: tensor_square_2x2_rns_poly (src/polymath.cu:500).
    """
    a0, a1 = ct[0], ct[1]
    c0 = mul_rns(a0, a0, mv)
    # doubled cross term reduced once (2q^2 < q*2^64)
    h, l = mm.mul_wide(a0, a1)
    hs, ls = mm.add_wide(h, l, h, l)
    c1 = mm.barrett_reduce_u128(hs, ls, _col(mv.q), _col(mv.ratio_lo),
                                _col(mv.ratio_hi))
    c2 = mul_rns(a1, a1, mv)
    return jnp.stack([c0, c1, c2])


def tensor_prod_mxn(ct1, ct2, mv: ModulusVec):
    """General (m, L, N) x (n, L, N) -> (m+n-1, L, N) ciphertext product.

    Reference: tensor_prod_mxn_rns_poly (src/polymath.cu:546).
    """
    m, n = ct1.shape[0], ct2.shape[0]
    out = []
    for k in range(m + n - 1):
        # accumulate the <= min(m, n) wide products lazily, reduce once
        # (t*q^2 < q*2^64 whenever t*q < 2^64)
        hs = ls = None
        for i in range(max(0, k - n + 1), min(m, k + 1)):
            h, l = mm.mul_wide(ct1[i], ct2[k - i])
            if hs is None:
                hs, ls = h, l
            else:
                hs, ls = mm.add_wide(hs, ls, h, l)
        out.append(mm.barrett_reduce_u128(
            hs, ls, _col(mv.q), _col(mv.ratio_lo), _col(mv.ratio_hi)))
    return jnp.stack(out)
