"""BFV multiply + relinearize correctness (HPS technique).

Mirrors the reference's hybrid-keyswitch mul+relin golden tests
(examples/1_bfv.cu:1269-1352: slot i -> i^2 after multiply+relin) and the
randomized multiply-correctness sweep (1_bfv.cu:1422).
"""

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
        Scheme.BFV, n, coeff, plain_modulus=t, special_modulus_size=1)
    ctx = make_context(params)
    rng = jax.random.PRNGKey(0)
    k_sk, k_pk, k_rlk = jax.random.split(rng, 3)
    sk = keys.gen_secret_key(ctx, k_sk)
    pk = keys.gen_public_key(ctx, sk, k_pk)
    rlk = keys.gen_relin_key(ctx, sk, k_rlk)
    enc = BatchEncoder(ctx)
    return ctx, sk, pk, rlk, enc


def test_mul_squares(setup):
    """slot i -> i^2 (reference: 1_bfv.cu:1317-1321)."""
    ctx, sk, pk, rlk, enc = setup
    n = ctx.params.n
    t = ctx.params.plain_modulus
    vals = np.arange(n, dtype=np.uint64) % t
    pt = enc.encode(vals)
    ct = keys.encrypt_asymmetric(ctx, pk, pt, jax.random.PRNGKey(11))
    ct2 = evaluate.multiply(ctx, ct, ct)
    assert ct2.size == 3
    dec = keys.decrypt(ctx, sk, ct2)
    expect = (vals.astype(object) ** 2) % t
    np.testing.assert_array_equal(enc.decode(dec).astype(object), expect)


def test_mul_relin(setup):
    ctx, sk, pk, rlk, enc = setup
    n = ctx.params.n
    t = ctx.params.plain_modulus
    rng = np.random.default_rng(5)
    a = rng.integers(0, t, n, dtype=np.uint64)
    b = rng.integers(0, t, n, dtype=np.uint64)
    ct_a = keys.encrypt_asymmetric(ctx, pk, enc.encode(a), jax.random.PRNGKey(1))
    ct_b = keys.encrypt_asymmetric(ctx, pk, enc.encode(b), jax.random.PRNGKey(2))
    ct = evaluate.multiply_and_relin(ctx, ct_a, ct_b, rlk)
    assert ct.size == 2
    dec = enc.decode(keys.decrypt(ctx, sk, ct)).astype(object)
    expect = (a.astype(object) * b.astype(object)) % t
    np.testing.assert_array_equal(dec, expect)


def test_square(setup):
    ctx, sk, pk, rlk, enc = setup
    n, t = ctx.params.n, ctx.params.plain_modulus
    vals = (np.arange(n, dtype=np.uint64) * 7 + 3) % t
    ct = keys.encrypt_asymmetric(ctx, pk, enc.encode(vals),
                                 jax.random.PRNGKey(21))
    ct2 = evaluate.relinearize(ctx, evaluate.square(ctx, ct), rlk)
    dec = enc.decode(keys.decrypt(ctx, sk, ct2)).astype(object)
    np.testing.assert_array_equal(dec, (vals.astype(object) ** 2) % t)


def test_add_sub_plain(setup):
    ctx, sk, pk, rlk, enc = setup
    n, t = ctx.params.n, ctx.params.plain_modulus
    rng = np.random.default_rng(6)
    a = rng.integers(0, t, n, dtype=np.uint64)
    b = rng.integers(0, t, n, dtype=np.uint64)
    ct = keys.encrypt_asymmetric(ctx, pk, enc.encode(a), jax.random.PRNGKey(3))
    ct_add = evaluate.add_plain(ctx, ct, enc.encode(b))
    np.testing.assert_array_equal(
        enc.decode(keys.decrypt(ctx, sk, ct_add)),
        (a.astype(object) + b.astype(object)) % t)
    ct_sub = evaluate.sub_plain(ctx, ct, enc.encode(b))
    np.testing.assert_array_equal(
        enc.decode(keys.decrypt(ctx, sk, ct_sub)),
        (a.astype(object) - b.astype(object)) % t)


def test_multiply_plain(setup):
    ctx, sk, pk, rlk, enc = setup
    n, t = ctx.params.n, ctx.params.plain_modulus
    rng = np.random.default_rng(7)
    a = rng.integers(0, t, n, dtype=np.uint64)
    b = rng.integers(0, t, n, dtype=np.uint64)
    ct = keys.encrypt_asymmetric(ctx, pk, enc.encode(a), jax.random.PRNGKey(4))
    ct_mp = evaluate.multiply_plain(ctx, ct, enc.encode(b))
    np.testing.assert_array_equal(
        enc.decode(keys.decrypt(ctx, sk, ct_mp)).astype(object),
        (a.astype(object) * b.astype(object)) % t)


def test_add_sub_ct(setup):
    ctx, sk, pk, rlk, enc = setup
    n, t = ctx.params.n, ctx.params.plain_modulus
    rng = np.random.default_rng(8)
    a = rng.integers(0, t, n, dtype=np.uint64)
    b = rng.integers(0, t, n, dtype=np.uint64)
    ct_a = keys.encrypt_asymmetric(ctx, pk, enc.encode(a), jax.random.PRNGKey(5))
    ct_b = keys.encrypt_asymmetric(ctx, pk, enc.encode(b), jax.random.PRNGKey(6))
    np.testing.assert_array_equal(
        enc.decode(keys.decrypt(ctx, sk, evaluate.add(ctx, ct_a, ct_b))),
        (a.astype(object) + b.astype(object)) % t)
    np.testing.assert_array_equal(
        enc.decode(keys.decrypt(ctx, sk, evaluate.sub(ctx, ct_a, ct_b))),
        (a.astype(object) - b.astype(object)) % t)


def test_bfv_mod_switch(setup):
    ctx, sk, pk, rlk, enc = setup
    n, t = ctx.params.n, ctx.params.plain_modulus
    vals = np.arange(n, dtype=np.uint64) % t
    ct = keys.encrypt_asymmetric(ctx, pk, enc.encode(vals),
                                 jax.random.PRNGKey(9))
    ct_sw = evaluate.mod_switch_to_next(ctx, ct)
    assert ct_sw.chain_index == ct.chain_index + 1
    np.testing.assert_array_equal(
        enc.decode(keys.decrypt(ctx, sk, ct_sw)), vals)
