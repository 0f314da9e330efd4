"""Phantom-variant Salsa20 PRNG (host reimplementation, numpy-vectorized).

The reference generates all device randomness with a *nonstandard* Salsa20
core (src/prng.cu:17-133): the 16-word state holds key words at positions
0-7 and 10-15 (56 bytes of the 64-byte seed; bytes 56-64 unused,
host/globals.h:20-21) and a 64-bit per-element nonce at words 8-9 — there
are NO sigma constants and NO block counter.  Every invocation produces one
64-byte block; the samplers call it once per output element with
tid-derived nonces (prng.cu:142-244).

This module reproduces that construction bit-exactly so reference-produced
seed-compressed ciphertexts can be loaded: regenerating c1 requires
replaying `sample_uniform_ref` with the stored seed
(include/ciphertext.h:216-307).  The framework's own sampling uses JAX
threefry (documented swap, ops/sampling.py); this path exists purely for
wire-format parity.
"""

from __future__ import annotations

import numpy as np

from .. import native as _native

_M32 = np.uint32(0xFFFFFFFF)


def _rotl(x: np.ndarray, c: int) -> np.ndarray:
    return (x << np.uint32(c)) | (x >> np.uint32(32 - c))


def _core_rounds(x: list) -> None:
    """20 Salsa20 double-rounds, in-place on 16 uint32 arrays.

    Same quarter-round schedule as prng.cu:63-97 (standard Salsa20 core —
    only the state *layout* is nonstandard)."""
    for _ in range(10):
        # column rounds
        x[4] ^= _rotl(x[0] + x[12], 7)
        x[8] ^= _rotl(x[4] + x[0], 9)
        x[12] ^= _rotl(x[8] + x[4], 13)
        x[0] ^= _rotl(x[12] + x[8], 18)
        x[9] ^= _rotl(x[5] + x[1], 7)
        x[13] ^= _rotl(x[9] + x[5], 9)
        x[1] ^= _rotl(x[13] + x[9], 13)
        x[5] ^= _rotl(x[1] + x[13], 18)
        x[14] ^= _rotl(x[10] + x[6], 7)
        x[2] ^= _rotl(x[14] + x[10], 9)
        x[6] ^= _rotl(x[2] + x[14], 13)
        x[10] ^= _rotl(x[6] + x[2], 18)
        x[3] ^= _rotl(x[15] + x[11], 7)
        x[7] ^= _rotl(x[3] + x[15], 9)
        x[11] ^= _rotl(x[7] + x[3], 13)
        x[15] ^= _rotl(x[11] + x[7], 18)
        # row rounds
        x[1] ^= _rotl(x[0] + x[3], 7)
        x[2] ^= _rotl(x[1] + x[0], 9)
        x[3] ^= _rotl(x[2] + x[1], 13)
        x[0] ^= _rotl(x[3] + x[2], 18)
        x[6] ^= _rotl(x[5] + x[4], 7)
        x[7] ^= _rotl(x[6] + x[5], 9)
        x[4] ^= _rotl(x[7] + x[6], 13)
        x[5] ^= _rotl(x[4] + x[7], 18)
        x[11] ^= _rotl(x[10] + x[9], 7)
        x[8] ^= _rotl(x[11] + x[10], 9)
        x[9] ^= _rotl(x[8] + x[11], 13)
        x[10] ^= _rotl(x[9] + x[8], 18)
        x[12] ^= _rotl(x[15] + x[14], 7)
        x[13] ^= _rotl(x[12] + x[15], 9)
        x[14] ^= _rotl(x[13] + x[12], 13)
        x[15] ^= _rotl(x[14] + x[13], 18)


def phantom_salsa20_block_words(seed: bytes, nonces: np.ndarray) -> np.ndarray:
    """One 64-byte keystream block per nonce, as (M, 16) uint32 words.

    State layout per prng.cu:28-45: words 0-7 = seed[0:32] LE, words 8-9 =
    (nonce lo32, nonce hi32), words 10-15 = seed[32:56] LE.
    """
    if len(seed) < 56:
        raise ValueError("phantom salsa20 needs a >=56-byte seed")
    kw = np.frombuffer(seed[:56], dtype="<u4").astype(np.uint32)  # 14 words
    nonces = np.asarray(nonces, dtype=np.uint64).ravel()
    nlo = (nonces & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    nhi = (nonces >> np.uint64(32)).astype(np.uint32)
    m = nonces.shape[0]
    j = []
    for w in range(8):
        j.append(np.broadcast_to(kw[w], (m,)).copy())
    j.append(nlo.copy())
    j.append(nhi.copy())
    for w in range(8, 14):
        j.append(np.broadcast_to(kw[w], (m,)).copy())
    x = [a.copy() for a in j]
    with np.errstate(over="ignore"):
        _core_rounds(x)
        out = np.stack([a + b for a, b in zip(x, j)], axis=1)  # (M, 16)
    return out


def phantom_salsa20_block(seed: bytes, nonces) -> np.ndarray:
    """(M, 64) uint8 keystream blocks, one per nonce."""
    words = phantom_salsa20_block_words(seed, nonces)
    return words.astype("<u4").view(np.uint8).reshape(words.shape[0], 64)


# ---------------------------------------------------------------------------
# Reference sampler derivations (for wire-format load / oracle tests)
# ---------------------------------------------------------------------------

def sample_ternary_ref(seed: bytes, moduli, n: int,
                       use_native: bool = True) -> np.ndarray:
    """Reference sample_ternary_poly (prng.cu:142-163): one block per
    coefficient (nonce = tid % N so all limbs share the ternary vector),
    value = tmp[0] % 3 - 1 mapped into [0, q)."""
    if use_native:
        out = _native.sample_ternary(seed, moduli, n)
        if out is not None:
            return out
    blocks = phantom_salsa20_block(seed, np.arange(n, dtype=np.uint64))
    v = (blocks[:, 0] % 3).astype(np.int64) - 1  # (n,) in {-1,0,1}
    qs = np.asarray([int(q) for q in moduli], dtype=np.int64)
    return (v[None, :] % qs[:, None]).astype(np.uint64)  # -1 -> q-1


def sample_error_ref(seed: bytes, moduli, n: int,
                     use_native: bool = True) -> np.ndarray:
    """Reference sample_error_poly (prng.cu:224-244): CBD from the hamming
    weights of 21+21 keystream bits, same noise across limbs."""
    if use_native:
        out = _native.sample_error(seed, moduli, n)
        if out is not None:
            return out
    blocks = phantom_salsa20_block(seed, np.arange(n, dtype=np.uint64))
    b = blocks.astype(np.uint8)
    pop = np.unpackbits(b[:, :6], axis=1).reshape(n, 6, 8).sum(axis=2)
    # tmp[2] & 0x1F / tmp[5] & 0x1F: only low 5 bits
    m2 = np.unpackbits(b[:, 2] & np.uint8(0x1F)).reshape(n, 8).sum(axis=1)
    m5 = np.unpackbits(b[:, 5] & np.uint8(0x1F)).reshape(n, 8).sum(axis=1)
    cbd = (pop[:, 0] + pop[:, 1] + m2
           - pop[:, 3] - pop[:, 4] - m5).astype(np.int64)
    qs = np.asarray([int(q) for q in moduli], dtype=np.int64)
    return (cbd[None, :] % qs[:, None]).astype(np.uint64)


def sample_uniform_ref(seed: bytes, moduli, n: int,
                       use_native: bool = True) -> np.ndarray:
    """Reference sample_uniform_poly (prng.cu:174-205): one block per 8
    coefficients per limb (nonce = tid over the flattened (limb, n/8)
    grid), rejection sampling above the max uniform multiple, then Barrett
    reduction mod q.  Returns (L, n) uint64.

    The native C++ core (native/host_math.cpp:pt_sample_uniform) is tried
    first — regenerating c1 of a seed-compressed ciphertext at N=65536
    L=30 needs ~250k keystream blocks, where the per-group Python loop
    below is ~100x slower; both paths are bit-identical (tested)."""
    if use_native:
        out = _native.sample_uniform(seed, moduli, n)
        if out is not None:
            return out
    qs = [int(q) for q in moduli]
    num_l = len(qs)
    groups = n >> 3
    total = groups * num_l
    stride = n * num_l  # reference retry-nonce stride: poly_degree * L
    tids = np.arange(total, dtype=np.uint64)
    blocks = phantom_salsa20_block(seed, tids)
    rnd = blocks.view("<u8").reshape(total, 8).astype(np.uint64)
    out = np.zeros((num_l, n), dtype=np.uint64)
    max_random = (1 << 64) - 1
    for li, q in enumerate(qs):
        max_multiple = max_random - (max_random % q) - 1
        for g in range(groups):
            tid = li * groups + g
            vals = rnd[tid].copy()
            tries = 1
            bad = vals > max_multiple
            while bad.any():
                # reference semantics (prng.cu:194-199): on a rejected lane
                # the *entire* 64-byte block is regenerated at nonce
                # tid + tries*N*L, so that lane and every later lane now
                # come from the fresh block; earlier lanes were already
                # emitted from the previous block
                nb = phantom_salsa20_block(
                    seed, np.asarray([tid + tries * stride],
                                     dtype=np.uint64))
                newvals = nb.view("<u8").ravel().astype(np.uint64)
                first_bad = int(np.argmax(bad))
                vals[first_bad:] = newvals[first_bad:]
                tries += 1
                bad = vals > max_multiple
            out[li, g * 8:(g + 1) * 8] = vals % np.uint64(q)
    return out
