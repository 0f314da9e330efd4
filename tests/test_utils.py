"""Salsa20 core vs published test vector; blake2b vs hashlib; timers."""

import hashlib

import numpy as np

from phantom_tpu.utils import salsa20


def test_phantom_salsa20_core_vs_ecrypt_vector():
    """Validate the 20-round core against the ECRYPT Salsa20/20 vector by
    building a phantom seed whose state layout coincides with the standard
    cipher's: phantom words 0-7/10-15 come from the seed and 8-9 from the
    nonce (prng.cu:28-45), so seeding sigma/key/nonce into those slots and
    passing the standard counter as the phantom nonce reproduces standard
    Salsa20 exactly."""
    import struct
    sigma = (0x61707865, 0x3320646E, 0x79622D32, 0x6B206574)
    key = bytes([0x80] + [0] * 31)
    k = struct.unpack("<8I", key)
    # standard state: [s0 k0 k1 k2 k3 s1 n0 n1 c0 c1 s2 k4 k5 k6 k7 s3]
    seed_words = [sigma[0], k[0], k[1], k[2], k[3], sigma[1], 0, 0,
                  sigma[2], k[4], k[5], k[6], k[7], sigma[3]]
    seed = struct.pack("<14I", *seed_words) + bytes(8)
    block = salsa20.phantom_salsa20_block(seed, [0])[0].tobytes()
    expect = bytes.fromhex(
        "E3BE8FDD8BECA2E3EA8EF9475B29A6E7"
        "003951E1097A5C38D23B7A5FAD9F6844"
        "B22C97559E2723C7CBBD3FE4FC8D9A07"
        "44652A83E72A9C461876AF4D7EF1A117")
    assert block == expect[:64]


def test_phantom_salsa20_samplers():
    seed = bytes(range(64))
    moduli = [0xFFFFEE001, 0xFFFFC4001]  # 36-bit primes
    n = 64
    tern = salsa20.sample_ternary_ref(seed, moduli, n)
    # ternary: every limb holds the same {-1,0,1} vector mod its q
    for li, q in enumerate(moduli):
        c = tern[li].astype(np.int64)
        c = np.where(c > q // 2, c - q, c)
        assert set(np.unique(c)) <= {-1, 0, 1}
        if li:
            assert (c == prev).all()
        prev = c
    err = salsa20.sample_error_ref(seed, moduli, n)
    for li, q in enumerate(moduli):
        c = err[li].astype(np.int64)
        c = np.where(c > q // 2, c - q, c)
        assert (np.abs(c) <= 21).all()
    uni = salsa20.sample_uniform_ref(seed, moduli, n)
    assert uni.shape == (2, n)
    for li, q in enumerate(moduli):
        assert (uni[li] < q).all()
    # uniform limbs are independent streams (different tid ranges)
    assert not (uni[0] == uni[1]).all()
    # deterministic
    assert (salsa20.sample_uniform_ref(seed, moduli, n) == uni).all()


def test_native_blake2b_matches_hashlib():
    from phantom_tpu import native
    if native.get_lib() is None:
        import pytest
        pytest.skip("native lib unavailable")
    for msg in (b"", b"abc", bytes(range(256)) * 3):
        assert native.blake2b(msg, 64) == hashlib.blake2b(msg).digest()
        assert native.blake2b(msg, 32) == hashlib.blake2b(
            msg, digest_size=32).digest()
