"""Salsa20 core vs published test vector; blake2b vs hashlib; timers."""

import hashlib

import numpy as np

from phantom_tpu.utils import salsa20


def test_salsa20_core_vector():
    # ECRYPT verified set 1 vector 0 (Salsa20/20, 256-bit key, zero nonce):
    # key = 80 00 ... 00
    key = bytes([0x80] + [0] * 31)
    nonce = bytes(8)
    block = salsa20.salsa20_block(key, nonce, 0)
    expect = bytes.fromhex(
        "E3BE8FDD8BECA2E3EA8EF9475B29A6E7"
        "003951E1097A5C38D23B7A5FAD9F6844"
        "B22C97559E2723C7CBBD3FE4FC8D9A07"
        "44652A83E72A9C461876AF4D7EF1A117")
    assert block[:64] == expect[:64]


def test_salsa20_keystream_extends():
    key = bytes(range(32))
    ks = salsa20.salsa20_keystream(key, bytes(8), 200)
    assert len(ks) == 200
    # block boundary consistency
    b0 = salsa20.salsa20_block(key, bytes(8), 0)
    b1 = salsa20.salsa20_block(key, bytes(8), 1)
    assert ks[:64] == b0 and ks[64:128] == b1


def test_native_blake2b_matches_hashlib():
    from phantom_tpu import native
    if native.get_lib() is None:
        import pytest
        pytest.skip("native lib unavailable")
    for msg in (b"", b"abc", bytes(range(256)) * 3):
        assert native.blake2b(msg, 64) == hashlib.blake2b(msg).digest()
        assert native.blake2b(msg, 32) == hashlib.blake2b(
            msg, digest_size=32).digest()
