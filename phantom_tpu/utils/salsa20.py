"""Salsa20 stream cipher (host reimplementation).

The reference generates device randomness with a Salsa20 core
(src/prng.cu:17-133) and stores its seed in compressed symmetric
ciphertexts.  This framework samples with JAX threefry (documented swap,
ops/sampling.py); this host Salsa20 exists for wire-format parity work:
loading reference-produced seed-compressed ciphertexts requires
regenerating their c1 stream with the same cipher.
"""

from __future__ import annotations

import struct
from typing import List


def _rotl32(x: int, n: int) -> int:
    x &= 0xFFFFFFFF
    return ((x << n) | (x >> (32 - n))) & 0xFFFFFFFF


def _quarter_round(s: List[int], a: int, b: int, c: int, d: int):
    s[b] ^= _rotl32(s[a] + s[d], 7)
    s[c] ^= _rotl32(s[b] + s[a], 9)
    s[d] ^= _rotl32(s[c] + s[b], 13)
    s[a] ^= _rotl32(s[d] + s[c], 18)


def salsa20_core(state16: List[int], rounds: int = 20) -> List[int]:
    """The Salsa20/20 core permutation on 16 little-endian u32 words."""
    s = list(state16)
    for _ in range(rounds // 2):
        # column rounds
        _quarter_round(s, 0, 4, 8, 12)
        _quarter_round(s, 5, 9, 13, 1)
        _quarter_round(s, 10, 14, 2, 6)
        _quarter_round(s, 15, 3, 7, 11)
        # row rounds
        _quarter_round(s, 0, 1, 2, 3)
        _quarter_round(s, 5, 6, 7, 4)
        _quarter_round(s, 10, 11, 8, 9)
        _quarter_round(s, 15, 12, 13, 14)
    return [(x + y) & 0xFFFFFFFF for x, y in zip(s, state16)]


_SIGMA = (0x61707865, 0x3320646E, 0x79622D32, 0x6B206574)  # "expand 32-byte k"


def salsa20_block(key32: bytes, nonce8: bytes, counter: int) -> bytes:
    """One 64-byte keystream block (key 32B, nonce 8B, 64-bit counter)."""
    assert len(key32) == 32 and len(nonce8) == 8
    k = struct.unpack("<8I", key32)
    n = struct.unpack("<2I", nonce8)
    c = (counter & 0xFFFFFFFF, (counter >> 32) & 0xFFFFFFFF)
    state = [
        _SIGMA[0], k[0], k[1], k[2],
        k[3], _SIGMA[1], n[0], n[1],
        c[0], c[1], _SIGMA[2], k[4],
        k[5], k[6], k[7], _SIGMA[3],
    ]
    return struct.pack("<16I", *salsa20_core(state))


def salsa20_keystream(key32: bytes, nonce8: bytes, nbytes: int,
                      counter: int = 0) -> bytes:
    out = bytearray()
    while len(out) < nbytes:
        out += salsa20_block(key32, nonce8, counter)
        counter += 1
    return bytes(out[:nbytes])
