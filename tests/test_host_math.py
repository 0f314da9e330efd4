"""Host math core tests (reference L0 parity: numth/modulus/ntt tables)."""

import numpy as np
import pytest

from phantom_tpu.host import numth
from phantom_tpu.host.modulus import Modulus, CoeffModulus, PlainModulus, compute_shoup
from phantom_tpu.host import ntt_tables


def test_is_prime_basics():
    primes = [2, 3, 5, 7, 65537, 0xFFFFFFFF00000001 >> 3]  # last is arbitrary
    assert numth.is_prime(2)
    assert numth.is_prime(65537)
    assert not numth.is_prime(1)
    assert not numth.is_prime(65536)
    assert numth.is_prime((1 << 61) - 1)  # Mersenne prime 2^61-1
    assert not numth.is_prime((1 << 61) - 3)


def test_get_primes_ntt_friendly():
    n = 4096
    ps = numth.get_primes(2 * n, 36, 3)
    assert len(set(ps)) == 3
    for p in ps:
        assert p.bit_length() == 36
        assert p % (2 * n) == 1
        assert numth.is_prime(p)


def test_get_primes_below():
    n = 4096
    anchor = numth.get_primes(2 * n, 36, 1)[0]
    ps = numth.get_primes_below(anchor, 2 * n, 2)
    for p in ps:
        assert p < anchor and p % (2 * n) == 1 and numth.is_prime(p)


def test_invert_mod():
    q = numth.get_primes(8192, 50, 1)[0]
    for v in [1, 2, 12345, q - 1]:
        inv = numth.invert_mod(v, q)
        assert (v * inv) % q == 1


def test_primitive_root():
    n = 1024
    q = numth.get_primes(2 * n, 30, 1)[0]
    root = numth.minimal_primitive_root(2 * n, q)
    assert pow(root, n, q) == q - 1          # psi^N == -1 (negacyclic)
    assert pow(root, 2 * n, q) == 1
    # minimality: it is the smallest generator among a few odd powers
    others = {pow(root, k, q) for k in range(1, 64, 2)}
    assert root == min(others | {root})


def test_naf():
    for v in [0, 1, 5, -7, 123456, -98765, (1 << 30) - 1]:
        assert sum(numth.naf(v)) == v
        # non-adjacency: sorted exponents differ by >= 2
        exps = sorted(abs(t).bit_length() - 1 for t in numth.naf(v))
        assert all(b - a >= 2 for a, b in zip(exps, exps[1:]))


def test_modulus_barrett_ratio():
    q = numth.get_primes(8192, 55, 1)[0]
    m = Modulus(q)
    lo, hi, rem = m.const_ratio
    assert (hi << 64) + lo == (1 << 128) // q
    assert rem == (1 << 128) % q
    assert m.is_prime


def test_compute_shoup():
    q = (1 << 60) + 0x4001  # any odd < 2^61; exactness only
    w = 123456789123456789 % q
    s = compute_shoup(w, q)
    assert s == (w << 64) // q
    with pytest.raises(ValueError):
        compute_shoup(q, q)


def test_coeff_modulus_create_distinct():
    mods = CoeffModulus.create(4096, [36, 36, 37])
    vals = [m.value for m in mods]
    assert len(set(vals)) == 3
    assert [v.bit_length() for v in vals] == [36, 36, 37]
    for v in vals:
        assert v % 8192 == 1


def test_plain_modulus_batching():
    t = PlainModulus.batching(4096, 20)
    assert t.value % 8192 == 1 and t.value.bit_length() == 20


def test_ntt_tables_properties():
    n = 64
    q = numth.get_primes(2 * n, 20, 1)[0]
    tbl = ntt_tables.make_ntt_tables(n, Modulus(q))
    logn = 6
    # bit-reversed indexing of forward/inverse tables
    for i in [0, 1, 5, 63]:
        e = numth.reverse_bits(i, logn)
        assert int(tbl.root_powers[i]) == pow(tbl.root, e, q)
        assert int(tbl.inv_root_powers[i]) == pow(numth.invert_mod(tbl.root, q), e, q)
    assert (tbl.inv_degree * n) % q == 1
    # shoup words
    assert int(tbl.root_powers_shoup[3]) == (int(tbl.root_powers[3]) << 64) // q


def test_default_chains():
    from phantom_tpu.host import default_coeff_modulus_128
    mods = default_coeff_modulus_128(8192)
    total = 1
    for m in mods:
        total *= m.value
        assert m.value % (2 * 8192) == 1
    from phantom_tpu.host import hestd
    assert total.bit_length() <= hestd.max_coeff_modulus_bits(8192, 128)


def test_hestd_budget_enforced():
    """HE-std logQ caps reject oversized chains (hestdparms.h parity)."""
    import pytest
    from phantom_tpu.host import hestd, numth
    from phantom_tpu.schemes import EncryptionParameters, Scheme
    assert hestd.max_coeff_modulus_bits(8192, 128) == 218
    assert hestd.max_coeff_modulus_bits(65536, 192) == 1229
    assert hestd.max_coeff_modulus_bits_quantum(8192, 128) == 204
    n = 4096
    qs = numth.get_primes(2 * n, 40, 3)  # 120 bits > 109-bit budget
    with pytest.raises(ValueError):
        EncryptionParameters.create(
            Scheme.CKKS, n, qs, special_modulus_size=1, sec_level=128)
    # within budget passes
    qs2 = numth.get_primes(2 * n, 30, 3)  # 90 bits
    EncryptionParameters.create(
        Scheme.CKKS, n, qs2, special_modulus_size=1, sec_level=128)


def test_native_salsa20_samplers_match_numpy():
    """The C++ phantom-variant Salsa20 core and the three reference
    samplers (native/host_math.cpp) are bit-identical to the numpy oracle
    (utils/salsa20.py), including the uniform sampler's block-regeneration
    rejection path (prng.cu:194-199 semantics), which the first modulus
    (2^64 mod q ~ q/2 -> ~50% lane rejection) exercises heavily."""
    import numpy as np
    import pytest
    from phantom_tpu import native
    from phantom_tpu.utils import salsa20 as s
    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    seed = bytes(range(64))
    nonces = np.arange(37, dtype=np.uint64) * 977
    np.testing.assert_array_equal(native.salsa20_blocks(seed, nonces),
                                  s.phantom_salsa20_block(seed, nonces))
    mods = [2170000000000000001, 536813569, 1099511590913]
    for fn in (s.sample_uniform_ref, s.sample_ternary_ref,
               s.sample_error_ref):
        np.testing.assert_array_equal(fn(seed, mods, 128, use_native=True),
                                      fn(seed, mods, 128, use_native=False))
