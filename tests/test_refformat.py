"""Reference (PhantomFHE) wire format: byte-layout golden checks, save/load
roundtrips, and the seed-compressed symmetric path with Salsa20 c1
regeneration (reference: include/ciphertext.h:173-307)."""

import io
import struct

import jax
import numpy as np
import pytest

from phantom_tpu.host import numth
from phantom_tpu.host.modulus import PlainModulus
from phantom_tpu.schemes import (BatchEncoder, CKKSEncoder,
                                 EncryptionParameters, Scheme, evaluate,
                                 keys, make_context)
from phantom_tpu.utils import refformat as rf

N = 128


@pytest.fixture(scope="module")
def ckks():
    qs = numth.get_primes(2 * N, 30, 3)
    ps = numth.get_primes(2 * N, 31, 1)
    params = EncryptionParameters.create(
        Scheme.CKKS, N, qs + ps, special_modulus_size=1)
    ctx = make_context(params)
    k = jax.random.split(jax.random.PRNGKey(1), 4)
    sk = keys.gen_secret_key(ctx, k[0])
    pk = keys.gen_public_key(ctx, sk, k[1])
    rlk = keys.gen_relin_key(ctx, sk, k[2])
    enc = CKKSEncoder(ctx)
    return ctx, sk, pk, rlk, enc


def test_header_layout_matches_spec(ckks):
    """The 66-byte header must be the reference's exact field order/sizes:
    4 x size_t, double, u64, size_t, 2 x bool (ciphertext.h:173-183)."""
    ctx, sk, pk, rlk, enc = ckks
    z = np.random.default_rng(0).standard_normal(enc.slots)
    ct = keys.encrypt_asymmetric(ctx, pk, enc.encode(z, 2.0 ** 20),
                                 jax.random.PRNGKey(9))
    buf = io.BytesIO()
    rf.save_ciphertext_ref(ct, buf)
    raw = buf.getvalue()
    size, num_l, n = ct.data.shape
    # hand-decode at fixed offsets
    assert struct.unpack_from("<Q", raw, 0)[0] == ct.chain_index
    assert struct.unpack_from("<Q", raw, 8)[0] == size
    assert struct.unpack_from("<Q", raw, 16)[0] == n
    assert struct.unpack_from("<Q", raw, 24)[0] == num_l
    assert struct.unpack_from("<d", raw, 32)[0] == ct.scale
    assert struct.unpack_from("<Q", raw, 40)[0] == ct.correction_factor
    assert struct.unpack_from("<Q", raw, 48)[0] == ct.noise_scale_deg
    assert raw[56] == (1 if ct.is_ntt_form else 0)
    assert raw[57] == 1  # is_asymmetric
    assert len(raw) == 58 + size * num_l * n * 8
    # first payload word
    assert struct.unpack_from("<Q", raw, 58)[0] == int(
        np.asarray(ct.data)[0, 0, 0])


def test_ciphertext_roundtrip(ckks):
    ctx, sk, pk, rlk, enc = ckks
    z = np.random.default_rng(1).standard_normal(enc.slots)
    ct = keys.encrypt_asymmetric(ctx, pk, enc.encode(z, 2.0 ** 20),
                                 jax.random.PRNGKey(10))
    buf = io.BytesIO()
    rf.save_ciphertext_ref(ct, buf)
    buf.seek(0)
    ct2 = rf.load_ciphertext_ref(buf)
    np.testing.assert_array_equal(np.asarray(ct.data), np.asarray(ct2.data))
    got = enc.decode(keys.decrypt(ctx, sk, ct2))
    np.testing.assert_allclose(got.real, z, atol=1e-3)


def test_seed_compressed_symmetric_ckks(ckks):
    ctx, sk, pk, rlk, enc = ckks
    z = np.random.default_rng(2).standard_normal(enc.slots)
    seed = bytes(range(64))
    ct = rf.encrypt_symmetric_seeded(ctx, sk, enc.encode(z, 2.0 ** 20),
                                     seed, jax.random.PRNGKey(11))
    # decrypts directly
    got = enc.decode(keys.decrypt(ctx, sk, ct))
    np.testing.assert_allclose(got.real, z, atol=1e-3)
    # seed-compressed roundtrip: c1 regenerated, bit-identical
    buf = io.BytesIO()
    rf.save_ciphertext_symmetric_ref(ct, seed, buf)
    assert len(buf.getvalue()) == 58 + ct.data.shape[1] * N * 8 + 64
    buf.seek(0)
    ct2 = rf.load_ciphertext_symmetric_ref(ctx, buf)
    np.testing.assert_array_equal(np.asarray(ct.data), np.asarray(ct2.data))
    got2 = enc.decode(keys.decrypt(ctx, sk, ct2))
    np.testing.assert_allclose(got2.real, z, atol=1e-3)


def test_seed_compressed_symmetric_bfv():
    qs = numth.get_primes(2 * N, 30, 3)
    ps = numth.get_primes(2 * N, 31, 1)
    t = PlainModulus.batching(N, 16).value
    params = EncryptionParameters.create(
        Scheme.BFV, N, qs + ps, plain_modulus=t, special_modulus_size=1)
    ctx = make_context(params)
    k = jax.random.split(jax.random.PRNGKey(3), 2)
    sk = keys.gen_secret_key(ctx, k[0])
    enc = BatchEncoder(ctx)
    vals = np.random.default_rng(4).integers(0, t, N, dtype=np.uint64)
    seed = bytes(reversed(range(64)))
    ct = rf.encrypt_symmetric_seeded(ctx, sk, enc.encode(vals), seed, k[1])
    buf = io.BytesIO()
    rf.save_ciphertext_symmetric_ref(ct, seed, buf)
    buf.seek(0)
    ct2 = rf.load_ciphertext_symmetric_ref(ctx, buf)
    # BFV is coeff form: c1 was inverse-NTT'd on load; must match exactly
    np.testing.assert_array_equal(np.asarray(ct.data), np.asarray(ct2.data))
    np.testing.assert_array_equal(
        enc.decode(keys.decrypt(ctx, sk, ct2)), vals)


def test_key_roundtrips(ckks):
    ctx, sk, pk, rlk, enc = ckks
    buf = io.BytesIO()
    rf.save_secret_key_ref(sk, buf)
    rf.save_public_key_ref(pk, buf)
    rf.save_relin_key_ref(rlk, buf)
    buf.seek(0)
    sk2 = rf.load_secret_key_ref(buf)
    pk2 = rf.load_public_key_ref(buf)
    rlk2 = rf.load_relin_key_ref(buf)
    np.testing.assert_array_equal(np.asarray(sk.data), np.asarray(sk2.data))
    np.testing.assert_array_equal(np.asarray(pk.data), np.asarray(pk2.data))
    np.testing.assert_array_equal(np.asarray(rlk.data),
                                  np.asarray(rlk2.data))
    # the reloaded keys work end-to-end
    z = np.random.default_rng(5).standard_normal(enc.slots)
    ct = keys.encrypt_asymmetric(ctx, pk2, enc.encode(z, 2.0 ** 20),
                                 jax.random.PRNGKey(12))
    prod = evaluate.multiply_and_relin(ctx, ct, ct, rlk2)
    got = enc.decode(keys.decrypt(ctx, sk2, prod))
    np.testing.assert_allclose(got.real, z * z, atol=1e-2)


def test_galois_key_roundtrip(ckks):
    ctx, sk, pk, rlk, enc = ckks
    glk = keys.create_galois_keys(ctx, sk, jax.random.PRNGKey(13), steps=[1])
    buf = io.BytesIO()
    rf.save_galois_key_ref(glk, buf)
    buf.seek(0)
    glk2 = rf.load_galois_key_ref(buf, elts=glk.elts)
    np.testing.assert_array_equal(np.asarray(glk.data),
                                  np.asarray(glk2.data))
    assert glk2.elts == glk.elts
