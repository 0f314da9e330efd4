"""BGV end-to-end: enc/dec, add/sub, mul+relin, mod switch with
correction-factor tracking (reference: examples/2_bgv.cu:93-434)."""

import jax
import numpy as np
import pytest

from phantom_tpu.host.modulus import CoeffModulus, PlainModulus
from phantom_tpu.schemes import (BatchEncoder, EncryptionParameters, Scheme,
                                 evaluate, keys, make_context)


@pytest.fixture(scope="module")
def setup():
    n = 1024
    coeff = [m.value for m in CoeffModulus.create(n, [40, 40, 40, 40])]
    t = PlainModulus.batching(n, 16).value
    params = EncryptionParameters.create(
        Scheme.BGV, n, coeff, plain_modulus=t, special_modulus_size=1)
    ctx = make_context(params)
    rng = jax.random.PRNGKey(0)
    k_sk, k_pk, k_rlk = jax.random.split(rng, 3)
    sk = keys.gen_secret_key(ctx, k_sk)
    pk = keys.gen_public_key(ctx, sk, k_pk)
    rlk = keys.gen_relin_key(ctx, sk, k_rlk)
    enc = BatchEncoder(ctx)
    return ctx, sk, pk, rlk, enc


def test_enc_dec(setup):
    ctx, sk, pk, rlk, enc = setup
    n, t = ctx.params.n, ctx.params.plain_modulus
    rng = np.random.default_rng(1)
    vals = rng.integers(0, t, n, dtype=np.uint64)
    ct = keys.encrypt_asymmetric(ctx, pk, enc.encode(vals),
                                 jax.random.PRNGKey(4))
    np.testing.assert_array_equal(enc.decode(keys.decrypt(ctx, sk, ct)), vals)
    ct_s = keys.encrypt_symmetric(ctx, sk, enc.encode(vals),
                                  jax.random.PRNGKey(5))
    np.testing.assert_array_equal(enc.decode(keys.decrypt(ctx, sk, ct_s)),
                                  vals)


def test_add_sub(setup):
    ctx, sk, pk, rlk, enc = setup
    n, t = ctx.params.n, ctx.params.plain_modulus
    rng = np.random.default_rng(2)
    a = rng.integers(0, t, n, dtype=np.uint64)
    b = rng.integers(0, t, n, dtype=np.uint64)
    ct_a = keys.encrypt_asymmetric(ctx, pk, enc.encode(a), jax.random.PRNGKey(6))
    ct_b = keys.encrypt_asymmetric(ctx, pk, enc.encode(b), jax.random.PRNGKey(7))
    np.testing.assert_array_equal(
        enc.decode(keys.decrypt(ctx, sk, evaluate.add(ctx, ct_a, ct_b))),
        (a.astype(object) + b.astype(object)) % t)
    np.testing.assert_array_equal(
        enc.decode(keys.decrypt(ctx, sk, evaluate.sub(ctx, ct_a, ct_b))),
        (a.astype(object) - b.astype(object)) % t)


def test_mul_relin(setup):
    ctx, sk, pk, rlk, enc = setup
    n, t = ctx.params.n, ctx.params.plain_modulus
    rng = np.random.default_rng(3)
    a = rng.integers(0, t, n, dtype=np.uint64)
    b = rng.integers(0, t, n, dtype=np.uint64)
    ct_a = keys.encrypt_asymmetric(ctx, pk, enc.encode(a), jax.random.PRNGKey(8))
    ct_b = keys.encrypt_asymmetric(ctx, pk, enc.encode(b), jax.random.PRNGKey(9))
    ct = evaluate.multiply_and_relin(ctx, ct_a, ct_b, rlk)
    np.testing.assert_array_equal(
        enc.decode(keys.decrypt(ctx, sk, ct)).astype(object),
        (a.astype(object) * b.astype(object)) % t)


def test_mod_switch_and_correction(setup):
    ctx, sk, pk, rlk, enc = setup
    n, t = ctx.params.n, ctx.params.plain_modulus
    vals = np.arange(n, dtype=np.uint64) % t
    ct = keys.encrypt_asymmetric(ctx, pk, enc.encode(vals),
                                 jax.random.PRNGKey(10))
    ct_sw = evaluate.mod_switch_to_next(ctx, ct)
    assert ct_sw.chain_index == ct.chain_index + 1
    assert ct_sw.correction_factor != 1
    np.testing.assert_array_equal(
        enc.decode(keys.decrypt(ctx, sk, ct_sw)), vals)
    # add two cts with different correction factors -> balancing path
    ct_b = keys.encrypt_asymmetric(ctx, pk, enc.encode(vals),
                                   jax.random.PRNGKey(11))
    ct_b_sw = evaluate.mod_switch_to_next(ctx, ct_b)
    ct_sum = evaluate.add(ctx, ct_sw, ct_b_sw)
    np.testing.assert_array_equal(
        enc.decode(keys.decrypt(ctx, sk, ct_sum)),
        (2 * vals.astype(object)) % t)


def test_mul_then_modswitch(setup):
    ctx, sk, pk, rlk, enc = setup
    n, t = ctx.params.n, ctx.params.plain_modulus
    rng = np.random.default_rng(12)
    a = rng.integers(0, t, n, dtype=np.uint64)
    b = rng.integers(0, t, n, dtype=np.uint64)
    ct_a = keys.encrypt_asymmetric(ctx, pk, enc.encode(a), jax.random.PRNGKey(13))
    ct_b = keys.encrypt_asymmetric(ctx, pk, enc.encode(b), jax.random.PRNGKey(14))
    ct = evaluate.multiply_and_relin(ctx, ct_a, ct_b, rlk)
    ct = evaluate.mod_switch_to_next(ctx, ct)
    np.testing.assert_array_equal(
        enc.decode(keys.decrypt(ctx, sk, ct)).astype(object),
        (a.astype(object) * b.astype(object)) % t)


def test_multiply_plain(setup):
    ctx, sk, pk, rlk, enc = setup
    n, t = ctx.params.n, ctx.params.plain_modulus
    rng = np.random.default_rng(15)
    a = rng.integers(0, t, n, dtype=np.uint64)
    b = rng.integers(0, t, n, dtype=np.uint64)
    ct = keys.encrypt_asymmetric(ctx, pk, enc.encode(a), jax.random.PRNGKey(16))
    ct_mp = evaluate.multiply_plain(ctx, ct, enc.encode(b))
    np.testing.assert_array_equal(
        enc.decode(keys.decrypt(ctx, sk, ct_mp)).astype(object),
        (a.astype(object) * b.astype(object)) % t)


def test_balanced_add_unequal_factors(setup):
    """Adding ciphertexts whose correction factors diverged (mul-then-switch
    vs switch-then-mul) must balance with the noise-minimizing centered
    multipliers (reference: balance_correction_factors, evaluate.cu:20-79).
    Regression: scaling by the positive representative of a near-t
    multiplier overflowed e*noise past Q/2."""
    ctx, sk, pk, rlk, enc = setup
    n, t = ctx.params.n, ctx.params.plain_modulus
    rng = np.random.default_rng(9)
    a = rng.integers(0, t, n, dtype=np.uint64)
    b = rng.integers(0, t, n, dtype=np.uint64)
    ca = keys.encrypt_asymmetric(ctx, pk, enc.encode(a), jax.random.PRNGKey(20))
    cb = keys.encrypt_asymmetric(ctx, pk, enc.encode(b), jax.random.PRNGKey(21))
    A = evaluate.mod_switch_to_next(ctx, evaluate.multiply(ctx, ca, cb))
    B = evaluate.multiply(ctx, evaluate.mod_switch_to_next(ctx, ca),
                          evaluate.mod_switch_to_next(ctx, cb))
    assert A.correction_factor != B.correction_factor
    s = evaluate.add(ctx, A, B)
    dec = enc.decode(keys.decrypt(ctx, sk, s))
    expect = (2 * (a.astype(object) * b.astype(object))) % t
    np.testing.assert_array_equal(dec.astype(object), expect)
    d = evaluate.sub(ctx, A, B)
    dec_d = enc.decode(keys.decrypt(ctx, sk, d))
    np.testing.assert_array_equal(dec_d, np.zeros(n, dtype=np.uint64))
