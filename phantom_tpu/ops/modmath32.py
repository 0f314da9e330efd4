"""32-bit modular arithmetic — the TPU-native fast path.

For RNS primes q < 2^31 every residue is a single uint32 VPU word: a Shoup
butterfly costs ~15 native int32 ops instead of the ~100+ that 64-bit
emulation needs (SURVEY.md §7 hard part #1; BASELINE "u64 = 2 x u32" north
star is realized here by *choosing* 32-bit limbs so no pairing is needed at
all — twice the limbs at half the word size, net ~2.5x fewer ops).

Mirrors ops/modmath.py with 2^32-based fixed point:
  - Shoup companions are floor(w * 2^32 / q) (single u32)
  - Barrett ratios are floor(2^64 / q) as (hi, lo) u32 words
  - wide products are (hi, lo) u32 pairs built from u16 half-words
    (16x16->32 products are exact in uint32)

Value ranges follow Harvey lazy reduction with q < 2^31: [0, 2q) and
[0, 4q) intermediates fit uint32.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# numpy scalars act as literals inside Pallas kernels (no captured consts)
U32 = np.uint32
_MASK16 = U32(0xFFFF)
_SH16 = U32(16)


def u32(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=jnp.uint32)


def mul_wide32(a, b):
    """32x32 -> 64-bit product as (hi, lo) uint32 pair via u16 half-words."""
    a = u32(a)
    b = u32(b)
    a0 = a & _MASK16
    a1 = a >> _SH16
    b0 = b & _MASK16
    b1 = b >> _SH16
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = (p00 >> _SH16) + (p01 & _MASK16) + (p10 & _MASK16)
    lo = (p00 & _MASK16) | (mid << _SH16)
    hi = p11 + (p01 >> _SH16) + (p10 >> _SH16) + (mid >> _SH16)
    return hi, lo


def mul_hi32(a, b):
    hi, _ = mul_wide32(a, b)
    return hi


def mul_lo32(a, b):
    return u32(a) * u32(b)


def add_wide32(a_hi, a_lo, b_hi, b_lo):
    """64 + 64 -> 64 (mod 2^64) as (hi, lo) u32 pairs."""
    lo = a_lo + b_lo
    carry = (lo < a_lo).astype(jnp.uint32)
    return a_hi + b_hi + carry, lo


def add_u32_carry(a, b):
    s = a + b
    return s, (s < a).astype(jnp.uint32)


def csub32(x, q):
    """[0, 2q) -> [0, q), q < 2^31."""
    return x - jnp.where(x >= q, q, U32(0))


def csub32_i31(x, q):
    """csub32 for x < 2^31 (signed-range values): the compare+select runs
    on int32, which the v5e VPU executes ~1.6x faster than the unsigned
    form (unsigned vector compares lower to multi-op sequences; measured
    2026-08-19: 2.75 vs 1.67 T elem/s).  Bit-identical to csub32 whenever
    x < 2^31 — the caller must guarantee the range (q_bits <= 29 keeps
    every lazy [0, 4q) intermediate below 2^31)."""
    xs = u32(x).astype(jnp.int32)
    qs = u32(q).astype(jnp.int32)
    return (xs - jnp.where(xs >= qs, qs, np.int32(0))).astype(jnp.uint32)


def add_mod32(a, b, q):
    return csub32(a + b, q)


def sub_mod32(a, b, q):
    return csub32(a - b + q, q)


def neg_mod32(a, q):
    return jnp.where(a == 0, U32(0), q - a)


def barrett_reduce_u64_32(x_hi, x_lo, q, ratio_hi, ratio_lo):
    """(x_hi*2^32 + x_lo) mod q for x < q * 2^32; ratio = floor(2^64/q)
    as (hi, lo) u32 words.  Mirrors barrett_reduce_uint128_uint64."""
    c = mul_hi32(x_lo, ratio_lo)
    ha, la = mul_wide32(x_lo, ratio_hi)
    hb, lb = mul_wide32(x_hi, ratio_lo)
    s1, c1 = add_u32_carry(la, c)
    s2, c2 = add_u32_carry(s1, lb)
    k = x_hi * ratio_hi + ha + hb + c1 + c2
    r = x_lo - k * q
    return csub32(r, q)


def barrett_reduce_u32(x, q, ratio_hi):
    """x mod q for arbitrary 32-bit x; ratio_hi = floor(2^64/q) >> 32."""
    k = mul_hi32(x, ratio_hi)
    r = x - k * q
    return csub32(r, q)


def barrett_div_mod_u64_32(x_hi, x_lo, q, ratio_hi, ratio_lo):
    """Exact (floor(x/q) mod 2^32, x mod q) for x = x_hi*2^32+x_lo < q*2^32."""
    c = mul_hi32(x_lo, ratio_lo)
    ha, la = mul_wide32(x_lo, ratio_hi)
    hb, lb = mul_wide32(x_hi, ratio_lo)
    s1, c1 = add_u32_carry(la, c)
    s2, c2 = add_u32_carry(s1, lb)
    k = x_hi * ratio_hi + ha + hb + c1 + c2
    r = x_lo - k * q
    fix = (r >= q).astype(jnp.uint32)
    return k + fix, r - fix * q


def mul_mod32(a, b, q, ratio_hi, ratio_lo):
    """(a * b) mod q via Barrett; a, b full 32-bit."""
    hi, lo = mul_wide32(a, b)
    return barrett_reduce_u64_32(hi, lo, q, ratio_hi, ratio_lo)


def mul_mod_shoup_lazy32(x, w, w_shoup, q):
    """x * w mod q in [0, 2q); w < q, w_shoup = floor(w*2^32/q), q < 2^31."""
    k = mul_hi32(x, w_shoup)
    return x * w - k * q


def mul_mod_shoup32(x, w, w_shoup, q):
    return csub32(mul_mod_shoup_lazy32(x, w, w_shoup, q), q)


def compute_shoup32(value: int, q: int) -> int:
    return (value << 32) // q


def ratio32(q: int):
    """floor(2^64/q) as (hi, lo) python ints."""
    r = (1 << 64) // q
    return r >> 32, r & 0xFFFFFFFF
