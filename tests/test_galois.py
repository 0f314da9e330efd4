"""Galois rotation tests: BFV row/column rotation, CKKS slot rotation,
NAF-decomposed arbitrary steps (reference: examples rotation scenarios,
1_bfv.cu / 3_ckks.cu; evaluate.cu:1633)."""

import jax
import numpy as np
import pytest

from phantom_tpu.host import numth
from phantom_tpu.host.modulus import CoeffModulus, PlainModulus
from phantom_tpu.schemes import (BatchEncoder, CKKSEncoder,
                                 EncryptionParameters, Scheme, evaluate,
                                 keys, make_context)


@pytest.fixture(scope="module")
def bfv_setup():
    n = 1024
    coeff = [m.value for m in CoeffModulus.create(n, [40, 40, 40])]
    t = PlainModulus.batching(n, 16).value
    params = EncryptionParameters.create(
        Scheme.BFV, n, coeff, plain_modulus=t, special_modulus_size=1)
    ctx = make_context(params)
    rng = jax.random.PRNGKey(0)
    k_sk, k_pk, k_glk = jax.random.split(rng, 3)
    sk = keys.gen_secret_key(ctx, k_sk)
    pk = keys.gen_public_key(ctx, sk, k_pk)
    glk = keys.create_galois_keys(ctx, sk, k_glk)
    return ctx, sk, pk, glk


def test_bfv_rotate_rows(bfv_setup):
    ctx, sk, pk, glk = bfv_setup
    enc = BatchEncoder(ctx)
    n, t = ctx.params.n, ctx.params.plain_modulus
    vals = np.arange(n, dtype=np.uint64) % t
    ct = keys.encrypt_asymmetric(ctx, pk, enc.encode(vals),
                                 jax.random.PRNGKey(1))
    ct_r = evaluate.rotate_rows(ctx, ct, 1, glk)
    got = enc.decode(keys.decrypt(ctx, sk, ct_r))
    rows = vals.reshape(2, n // 2)
    expect = np.roll(rows, -1, axis=1).ravel()
    np.testing.assert_array_equal(got, expect)


def test_bfv_rotate_rows_arbitrary_step(bfv_setup):
    ctx, sk, pk, glk = bfv_setup
    enc = BatchEncoder(ctx)
    n, t = ctx.params.n, ctx.params.plain_modulus
    vals = np.arange(n, dtype=np.uint64) % t
    ct = keys.encrypt_asymmetric(ctx, pk, enc.encode(vals),
                                 jax.random.PRNGKey(2))
    step = 5  # NAF path: 5 = 4 + 1
    ct_r = evaluate.rotate_rows(ctx, ct, step, glk)
    got = enc.decode(keys.decrypt(ctx, sk, ct_r))
    rows = vals.reshape(2, n // 2)
    expect = np.roll(rows, -step, axis=1).ravel()
    np.testing.assert_array_equal(got, expect)


def test_bfv_rotate_columns(bfv_setup):
    ctx, sk, pk, glk = bfv_setup
    enc = BatchEncoder(ctx)
    n, t = ctx.params.n, ctx.params.plain_modulus
    vals = np.arange(n, dtype=np.uint64) % t
    ct = keys.encrypt_asymmetric(ctx, pk, enc.encode(vals),
                                 jax.random.PRNGKey(3))
    ct_c = evaluate.rotate_columns(ctx, ct, glk)
    got = enc.decode(keys.decrypt(ctx, sk, ct_c))
    rows = vals.reshape(2, n // 2)
    expect = rows[::-1].ravel()
    np.testing.assert_array_equal(got, expect)


@pytest.fixture(scope="module")
def ckks_setup():
    n = 1024
    qs = numth.get_primes(2 * n, 40, 2) + numth.get_primes(2 * n, 30, 1)
    coeff = [qs[0], qs[2], qs[1]]
    params = EncryptionParameters.create(
        Scheme.CKKS, n, coeff, special_modulus_size=1)
    ctx = make_context(params)
    rng = jax.random.PRNGKey(0)
    k_sk, k_pk, k_glk = jax.random.split(rng, 3)
    sk = keys.gen_secret_key(ctx, k_sk)
    pk = keys.gen_public_key(ctx, sk, k_pk)
    glk = keys.create_galois_keys(ctx, sk, k_glk)
    return ctx, sk, pk, glk


def test_ckks_rotate(ckks_setup):
    ctx, sk, pk, glk = ckks_setup
    enc = CKKSEncoder(ctx)
    rng = np.random.default_rng(4)
    z = rng.standard_normal(enc.slots)
    ct = keys.encrypt_asymmetric(ctx, pk, enc.encode(z, 2.0 ** 30),
                                 jax.random.PRNGKey(5))
    ct_r = evaluate.rotate_vector(ctx, ct, 1, glk)
    got = enc.decode(keys.decrypt(ctx, sk, ct_r))
    np.testing.assert_allclose(got.real, np.roll(z, -1), atol=1e-3)


def test_ckks_conjugate(ckks_setup):
    ctx, sk, pk, glk = ckks_setup
    enc = CKKSEncoder(ctx)
    rng = np.random.default_rng(5)
    z = rng.standard_normal(enc.slots) + 1j * rng.standard_normal(enc.slots)
    ct = keys.encrypt_asymmetric(ctx, pk, enc.encode(z, 2.0 ** 30),
                                 jax.random.PRNGKey(6))
    ct_c = evaluate.complex_conjugate(ctx, ct, glk)
    got = enc.decode(keys.decrypt(ctx, sk, ct_c))
    np.testing.assert_allclose(got, np.conj(z), atol=1e-3)


def test_bfv_hoisting(bfv_setup):
    """hoisting == sum of individual rotations (evaluate.cu:1670)."""
    ctx, sk, pk, glk = bfv_setup
    enc = BatchEncoder(ctx)
    n, t = ctx.params.n, ctx.params.plain_modulus
    vals = np.arange(n, dtype=np.uint64) % t
    ct = keys.encrypt_asymmetric(ctx, pk, enc.encode(vals),
                                 jax.random.PRNGKey(30))
    steps = [1, 2, 4]
    hct = evaluate.hoisting(ctx, ct, glk, steps)
    got = enc.decode(keys.decrypt(ctx, sk, hct)).astype(object)
    rows = vals.reshape(2, n // 2).astype(object)
    expect = sum(np.roll(rows, -s, axis=1) for s in steps).ravel() % t
    np.testing.assert_array_equal(got, expect)


def test_ckks_hoisting(ckks_setup):
    ctx, sk, pk, glk = ckks_setup
    from phantom_tpu.schemes import CKKSEncoder
    enc = CKKSEncoder(ctx)
    rng = np.random.default_rng(31)
    z = rng.standard_normal(enc.slots)
    ct = keys.encrypt_asymmetric(ctx, pk, enc.encode(z, 2.0 ** 30),
                                 jax.random.PRNGKey(32))
    steps = [1, 2]
    hct = evaluate.hoisting(ctx, ct, glk, steps)
    got = enc.decode(keys.decrypt(ctx, sk, hct))
    expect = np.roll(z, -1) + np.roll(z, -2)
    np.testing.assert_allclose(got.real, expect, atol=1e-3)
