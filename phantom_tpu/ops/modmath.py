"""Vectorized 64-bit modular arithmetic on device (XLA path).

TPU-native re-design of the reference's device arithmetic primitives
(include/uintmath.cuh, include/uintmodmath.cuh).  The TPU has no native
64-bit multiplier; XLA emulates uint64 with 32-bit ops, and the wide
(64x64 -> 128) products needed by Barrett/Shoup reduction are built here
explicitly from 32-bit half-words so every operation lowers to native
VPU int32 instructions.  All functions broadcast: scalars, (L, 1) per-limb
constants, and (..., L, N) coefficient tensors compose freely.

Value-range conventions follow Harvey lazy reduction:
  - `*_lazy` results lie in [0, 2q)
  - strict results lie in [0, q)
Inputs are documented per function.  q < 2^61 throughout (MOD_BIT_COUNT_MAX),
so 4q fits in 63 bits and lazy accumulation never overflows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

U64 = jnp.uint64
_MASK32 = U64(0xFFFFFFFF)
_SH32 = U64(32)


def u64(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=jnp.uint64)


def mul_wide(a, b):
    """64x64 -> 128-bit product as (hi, lo) uint64 pair.

    Built from four 32x32->64 partial products (native on TPU VPU).
    """
    a = u64(a)
    b = u64(b)
    a0 = a & _MASK32
    a1 = a >> _SH32
    b0 = b & _MASK32
    b1 = b >> _SH32
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = (p00 >> _SH32) + (p01 & _MASK32) + (p10 & _MASK32)
    lo = (p00 & _MASK32) | (mid << _SH32)
    hi = p11 + (p01 >> _SH32) + (p10 >> _SH32) + (mid >> _SH32)
    return hi, lo


def mul_hi(a, b):
    """High 64 bits of the 64x64 product."""
    hi, _ = mul_wide(a, b)
    return hi


def mul_lo(a, b):
    return u64(a) * u64(b)


def add_wide(a_hi, a_lo, b_hi, b_lo):
    """128 + 128 -> 128 (mod 2^128) as (hi, lo)."""
    lo = a_lo + b_lo
    carry = (lo < a_lo).astype(jnp.uint64)
    hi = a_hi + b_hi + carry
    return hi, lo


def add_u64_carry(a, b):
    """64 + 64 -> (sum mod 2^64, carry)."""
    s = a + b
    return s, (s < a).astype(jnp.uint64)


def csub(x, q):
    """Conditional subtract: x - q if x >= q else x.  Maps [0,2q) -> [0,q)."""
    return x - jnp.where(x >= q, q, U64(0))


def add_mod(a, b, q):
    """(a + b) mod q for a, b in [0, q)."""
    return csub(a + b, q)


def sub_mod(a, b, q):
    """(a - b) mod q for a, b in [0, q)."""
    return csub(a - b + q, q)


def neg_mod(a, q):
    """(-a) mod q for a in [0, q)."""
    return jnp.where(a == 0, U64(0), q - a)


def barrett_reduce_u64(x, q, ratio_hi):
    """x mod q for arbitrary 64-bit x; ratio_hi = floor(2^128/q) >> 64.

    Reference semantics: barrett_reduce_64 (uintmodmath.cuh).
    """
    k = mul_hi(x, ratio_hi)
    r = x - k * q
    return csub(r, q)


def barrett_reduce_u128(x_hi, x_lo, q, ratio_lo, ratio_hi):
    """(x_hi * 2^64 + x_lo) mod q, valid for x < q * 2^64.

    Computes k ~= floor(x * ratio / 2^128) with ratio = floor(2^128 / q),
    then one conditional subtraction (Barrett error < 2).
    Reference semantics: barrett_reduce_uint128_uint64 (uintmodmath.cuh:96).
    """
    c = mul_hi(x_lo, ratio_lo)
    ha, la = mul_wide(x_lo, ratio_hi)
    hb, lb = mul_wide(x_hi, ratio_lo)
    s1, c1 = add_u64_carry(la, c)
    s2, c2 = add_u64_carry(s1, lb)
    k = x_hi * ratio_hi + ha + hb + c1 + c2
    r = x_lo - k * q
    return csub(r, q)


def barrett_div_mod_u128(x_hi, x_lo, q, ratio_lo, ratio_hi):
    """Exact (floor(x/q), x mod q) for x = x_hi*2^64 + x_lo < q * 2^64.

    The Barrett quotient estimate k satisfies k in {floor(x/q)-1, floor(x/q)};
    one comparison repairs it.  The exact quotient is the engine behind the
    framework's exact-integer replacements for the reference's double-precision
    HPS paths (rns.cu:1519-1632): floor(a*2^64/q) etc. become exact u64 math.
    Quotient is returned mod 2^64 (callers guarantee it fits).
    """
    c = mul_hi(x_lo, ratio_lo)
    ha, la = mul_wide(x_lo, ratio_hi)
    hb, lb = mul_wide(x_hi, ratio_lo)
    s1, c1 = add_u64_carry(la, c)
    s2, c2 = add_u64_carry(s1, lb)
    k = x_hi * ratio_hi + ha + hb + c1 + c2
    r = x_lo - k * q
    fix = (r >= q).astype(jnp.uint64)
    return k + fix, r - fix * q


def mul_mod(a, b, q, ratio_lo, ratio_hi):
    """(a * b) mod q via full 128-bit Barrett; a, b in [0, 2^63)."""
    hi, lo = mul_wide(a, b)
    return barrett_reduce_u128(hi, lo, q, ratio_lo, ratio_hi)


def mul_mod_shoup_lazy(x, w, w_shoup, q):
    """x * w mod q in [0, 2q), any 64-bit x, w < q, w_shoup = floor(w*2^64/q).

    Reference semantics: multiply_and_reduce_shoup_lazy (uintmodmath.cuh:225).
    """
    k = mul_hi(x, w_shoup)
    return x * w - k * q


def mul_mod_shoup(x, w, w_shoup, q):
    """x * w mod q in [0, q)."""
    return csub(mul_mod_shoup_lazy(x, w, w_shoup, q), q)


def fma_mod(a, b, c, q, ratio_lo, ratio_hi):
    """(a * b + c) mod q, with c in [0, q)."""
    return add_mod(mul_mod(a, b, q, ratio_lo, ratio_hi), c, q)


def reduce_i64_centered(x, q):
    """Map signed values x in (-2^62, 2^62) into [0, q).

    Used when lifting centered noise/plaintext into RNS residues.
    `x` is int64.
    """
    q_i = jnp.asarray(q, dtype=jnp.int64)
    r = x % q_i  # jnp/int: sign of divisor -> already in [0, q)
    return r.astype(jnp.uint64)
