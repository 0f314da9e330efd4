"""Serialization roundtrips incl. seed-compressed symmetric ciphertexts
(reference: examples/serialization.cu:201-456)."""

import io

import jax
import numpy as np
import pytest

from phantom_tpu.host.modulus import CoeffModulus, PlainModulus
from phantom_tpu.schemes import (BatchEncoder, EncryptionParameters, Scheme,
                                 keys, make_context)
from phantom_tpu.utils import serialize as ser


@pytest.fixture(scope="module")
def setup():
    n = 1024
    coeff = [m.value for m in CoeffModulus.create(n, [40, 40, 40])]
    t = PlainModulus.batching(n, 16).value
    params = EncryptionParameters.create(
        Scheme.BFV, n, coeff, plain_modulus=t, special_modulus_size=1)
    ctx = make_context(params)
    rng = jax.random.PRNGKey(0)
    k_sk, k_pk = jax.random.split(rng)
    sk = keys.gen_secret_key(ctx, k_sk)
    pk = keys.gen_public_key(ctx, sk, k_pk)
    return ctx, sk, pk


def test_ciphertext_roundtrip(setup):
    ctx, sk, pk = setup
    enc = BatchEncoder(ctx)
    vals = np.arange(ctx.params.n, dtype=np.uint64) % ctx.params.plain_modulus
    ct = keys.encrypt_asymmetric(ctx, pk, enc.encode(vals),
                                 jax.random.PRNGKey(1))
    blob = ser.to_bytes(ct)
    ct2 = ser.from_bytes(blob)
    np.testing.assert_array_equal(np.asarray(ct.data), np.asarray(ct2.data))
    assert ct2.chain_index == ct.chain_index
    np.testing.assert_array_equal(enc.decode(keys.decrypt(ctx, sk, ct2)), vals)


def test_plaintext_roundtrip(setup):
    ctx, sk, pk = setup
    enc = BatchEncoder(ctx)
    vals = np.arange(ctx.params.n, dtype=np.uint64) % ctx.params.plain_modulus
    pt = enc.encode(vals)
    pt2 = ser.from_bytes(ser.to_bytes(pt))
    np.testing.assert_array_equal(np.asarray(pt.data), np.asarray(pt2.data))


def test_key_roundtrips(setup):
    ctx, sk, pk = setup
    sk2 = ser.from_bytes(ser.to_bytes(sk))
    np.testing.assert_array_equal(np.asarray(sk.data), np.asarray(sk2.data))
    pk2 = ser.from_bytes(ser.to_bytes(pk))
    np.testing.assert_array_equal(np.asarray(pk.data), np.asarray(pk2.data))
    rlk = keys.gen_relin_key(ctx, sk, jax.random.PRNGKey(2))
    rlk2 = ser.from_bytes(ser.to_bytes(rlk))
    np.testing.assert_array_equal(np.asarray(rlk.data), np.asarray(rlk2.data))


def test_seed_compressed_symmetric(setup):
    ctx, sk, pk = setup
    enc = BatchEncoder(ctx)
    vals = (np.arange(ctx.params.n, dtype=np.uint64) * 3) % ctx.params.plain_modulus
    ct, seed = ser.encrypt_symmetric_compressed(ctx, sk, enc.encode(vals),
                                                jax.random.PRNGKey(3))
    buf = io.BytesIO()
    ser.save_ciphertext_symmetric(ct, seed, buf)
    full = ser.to_bytes(ct)
    assert buf.tell() < len(full) * 0.6  # roughly half the bytes
    ct2 = ser.from_bytes(buf.getvalue(), ctx)
    np.testing.assert_array_equal(np.asarray(ct.data), np.asarray(ct2.data))
    np.testing.assert_array_equal(enc.decode(keys.decrypt(ctx, sk, ct2)), vals)


def test_noise_budget(setup):
    ctx, sk, pk = setup
    enc = BatchEncoder(ctx)
    vals = np.arange(ctx.params.n, dtype=np.uint64) % ctx.params.plain_modulus
    ct = keys.encrypt_asymmetric(ctx, pk, enc.encode(vals),
                                 jax.random.PRNGKey(5))
    b0 = keys.invariant_noise_budget(ctx, sk, ct)
    assert b0 > 20
    from phantom_tpu.schemes import evaluate
    ct2 = evaluate.multiply(ctx, ct, ct)
    b1 = keys.invariant_noise_budget(ctx, sk, ct2)
    assert 0 < b1 < b0


def test_ckks_and_bgv_ciphertext_roundtrip():
    """Scale / correction-factor fields survive the wire format."""
    import jax
    from phantom_tpu.host import numth
    from phantom_tpu.schemes import (CKKSEncoder, EncryptionParameters,
                                     Scheme, evaluate, keys as K,
                                     make_context)
    n = 512
    qs = numth.get_primes(2 * n, 40, 2) + numth.get_primes(2 * n, 30, 1)
    params = EncryptionParameters.create(
        Scheme.CKKS, n, [qs[0], qs[2], qs[1]], special_modulus_size=1)
    ctx = make_context(params)
    rng = jax.random.PRNGKey(0)
    k_sk, k_pk = jax.random.split(rng)
    sk = K.gen_secret_key(ctx, k_sk)
    pk = K.gen_public_key(ctx, sk, k_pk)
    enc = CKKSEncoder(ctx)
    z = np.random.default_rng(0).standard_normal(enc.slots)
    ct = K.encrypt_asymmetric(ctx, pk, enc.encode(z, 2.0 ** 30),
                              jax.random.PRNGKey(1))
    ct2 = ser.from_bytes(ser.to_bytes(ct))
    assert ct2.scale == ct.scale and ct2.is_ntt_form
    np.testing.assert_allclose(
        enc.decode(K.decrypt(ctx, sk, ct2)).real, z, atol=1e-4)
