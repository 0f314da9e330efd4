"""Exact-integer number theory for parameter/precompute generation.

Host-side equivalent of the reference library's number-theory layer
(reference: include/host/numth.h, src/host/numth.cu): Miller-Rabin primality,
NTT-friendly prime search (primes == 1 mod 2N), primitive 2N-th roots of
unity, modular inverses, and NAF decomposition.  Everything here runs in pure
Python with exact big integers -- it executes once at context-build time and
feeds device constant buffers, so clarity and exactness beat speed.
"""

from __future__ import annotations

from typing import List

# Deterministic Miller-Rabin witnesses valid for all n < 3.3e24 (covers u64).
_MR_WITNESSES = (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37)

_SMALL_PRIMES = (
    2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61, 67,
    71, 73, 79, 83, 89, 97, 101, 103, 107, 109, 113,
)


def is_prime(n: int) -> bool:
    """Deterministic Miller-Rabin for 64-bit-range integers."""
    if n < 2:
        return False
    for p in _SMALL_PRIMES:
        if n == p:
            return True
        if n % p == 0:
            return False
    d = n - 1
    r = 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for a in _MR_WITNESSES:
        x = pow(a, d, n)
        if x == 1 or x == n - 1:
            continue
        for _ in range(r - 1):
            x = (x * x) % n
            if x == n - 1:
                break
        else:
            return False
    return True


def get_primes(factor: int, bit_size: int, count: int) -> List[int]:
    """Find `count` primes p with p.bit_length() == bit_size and p == 1 (mod factor).

    Searches downward from 2**bit_size (reference behavior: largest suitable
    primes of the requested size; src/host/numth.cu:207 equivalent).
    """
    if bit_size < 2 or bit_size > 61:
        raise ValueError(f"prime bit_size must be in [2, 61], got {bit_size}")
    from .. import native
    fast = native.get_primes(factor, bit_size, count)
    if fast is not None:
        return fast
    out: List[int] = []
    # Largest candidate < 2**bit_size that is == 1 mod factor.
    value = (1 << bit_size) - 1
    value -= (value - 1) % factor
    while len(out) < count and value.bit_length() == bit_size:
        if is_prime(value):
            out.append(value)
        value -= factor
    if len(out) < count:
        raise ValueError(
            f"failed to find {count} {bit_size}-bit primes == 1 mod {factor}")
    return out


def get_prime(factor: int, bit_size: int) -> int:
    return get_primes(factor, bit_size, 1)[0]


def get_primes_below(upper_bound: int, factor: int, count: int) -> List[int]:
    """Find `count` primes p < upper_bound with p == 1 (mod factor), descending.

    Used by the HPS multiplication technique to build the auxiliary base Rl
    below min(q_i) (reference: src/host/numth.cu:235 equivalent).
    """
    from .. import native
    fast = native.get_primes_below(upper_bound, factor, count)
    if fast is not None:
        return fast
    out: List[int] = []
    value = upper_bound - 1
    value -= (value - 1) % factor
    while len(out) < count and value > factor:
        if is_prime(value):
            out.append(value)
        value -= factor
    if len(out) < count:
        raise ValueError(
            f"failed to find {count} primes below {upper_bound} == 1 mod {factor}")
    return out


def try_invert_mod(value: int, modulus: int):
    """Return (ok, value^{-1} mod modulus)."""
    value %= modulus
    if value == 0:
        return False, 0
    g, x, _ = _xgcd(value, modulus)
    if g != 1:
        return False, 0
    return True, x % modulus


def invert_mod(value: int, modulus: int) -> int:
    ok, inv = try_invert_mod(value, modulus)
    if not ok:
        raise ValueError(f"{value} not invertible mod {modulus}")
    return inv


def _xgcd(a: int, b: int):
    x0, x1, y0, y1 = 1, 0, 0, 1
    while b:
        q, a, b = a // b, b, a % b
        x0, x1 = x1, x0 - q * x1
        y0, y1 = y1, y0 - q * y1
    return a, x0, y0


def is_primitive_root(root: int, degree: int, modulus: int) -> bool:
    """Is `root` a primitive `degree`-th root of unity mod prime `modulus`?

    degree must be a power of two; the test reduces to root^(degree/2) == -1.
    """
    if root == 0:
        return False
    return pow(root, degree // 2, modulus) == modulus - 1


def try_primitive_root(degree: int, modulus: int):
    """Find some primitive degree-th root of unity mod prime modulus.

    degree is a power of 2 and degree | modulus - 1.
    """
    group_size = modulus - 1
    if group_size % degree != 0:
        return False, 0
    quotient = group_size // degree
    # Deterministic scan of small bases keeps context construction reproducible.
    for base in range(2, modulus):
        candidate = pow(base, quotient, modulus)
        if is_primitive_root(candidate, degree, modulus):
            return True, candidate
        if base > 2000:
            break
    return False, 0


def try_minimal_primitive_root(degree: int, modulus: int):
    """Find the minimal primitive degree-th root of unity mod prime modulus.

    All primitive degree-th roots are root^k for odd k; walk them via
    repeated multiplication by root^2 and track the minimum (reference:
    src/host/numth.cu try_minimal_primitive_root equivalent).
    """
    ok, root = try_primitive_root(degree, modulus)
    if not ok:
        return False, 0
    if degree <= 2:
        return True, root
    gen_sq = (root * root) % modulus
    current = root
    best = root
    for _ in range(degree // 2 - 1):
        current = (current * gen_sq) % modulus
        if current < best:
            best = current
    return True, best


def minimal_primitive_root(degree: int, modulus: int) -> int:
    ok, root = try_minimal_primitive_root(degree, modulus)
    if not ok:
        raise ValueError(f"no primitive {degree}-th root mod {modulus}")
    return root


def naf(value: int) -> List[int]:
    """Non-adjacent form of a signed 32-bit value, as list of signed powers.

    Returns terms t (each +/- 2^k) with sum(t) == value; used by rotation
    step decomposition (reference: include/host/numth.h:17 equivalent).
    """
    res: List[int] = []
    sign = -1 if value < 0 else 1
    v = abs(value)
    i = 0
    while v:
        if v & 1:
            z = 2 - (v % 4)  # z in {+1, -1}
            res.append(sign * z * (1 << i))
            v -= z
        v >>= 1
        i += 1
    return res


def reverse_bits(value: int, bit_count: int) -> int:
    """Bit-reversal of `value` within `bit_count` bits."""
    result = 0
    for _ in range(bit_count):
        result = (result << 1) | (value & 1)
        value >>= 1
    return result
