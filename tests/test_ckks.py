"""CKKS end-to-end: encode/encrypt/add/mul/relin/rescale/decrypt.

Mirrors the reference's CKKS golden examples (examples/3_ckks.cu:28-763),
including the small-parameter N=2048-style case on a reduced degree.
"""

import jax
import numpy as np
import pytest

from phantom_tpu.host import numth
from phantom_tpu.schemes import (CKKSEncoder, EncryptionParameters, Scheme,
                                 evaluate, keys, make_context)

SCALE = 2.0 ** 30


@pytest.fixture(scope="module")
def setup():
    n = 1024
    qs = numth.get_primes(2 * n, 40, 2) + numth.get_primes(2 * n, 30, 2)
    # order: q0(40) q1(30) q2(30, dropped by rescale) | p(40 special)
    coeff = [qs[0], qs[2], qs[3], qs[1]]
    params = EncryptionParameters.create(
        Scheme.CKKS, n, coeff, special_modulus_size=1)
    ctx = make_context(params)
    rng = jax.random.PRNGKey(0)
    k_sk, k_pk, k_rlk = jax.random.split(rng, 3)
    sk = keys.gen_secret_key(ctx, k_sk)
    pk = keys.gen_public_key(ctx, sk, k_pk)
    rlk = keys.gen_relin_key(ctx, sk, k_rlk)
    enc = CKKSEncoder(ctx)
    return ctx, sk, pk, rlk, enc


def test_encode_decode(setup):
    ctx, sk, pk, rlk, enc = setup
    rng = np.random.default_rng(1)
    z = rng.standard_normal(enc.slots) + 1j * rng.standard_normal(enc.slots)
    pt = enc.encode(z, SCALE)
    out = enc.decode(pt)
    np.testing.assert_allclose(out, z, atol=1e-5)


def test_encrypt_decrypt(setup):
    ctx, sk, pk, rlk, enc = setup
    rng = np.random.default_rng(2)
    z = rng.standard_normal(enc.slots)
    ct = keys.encrypt_asymmetric(ctx, pk, enc.encode(z, SCALE),
                                 jax.random.PRNGKey(5))
    out = enc.decode(keys.decrypt(ctx, sk, ct))
    np.testing.assert_allclose(out.real, z, atol=1e-4)


def test_add_sub(setup):
    ctx, sk, pk, rlk, enc = setup
    rng = np.random.default_rng(3)
    a = rng.standard_normal(enc.slots)
    b = rng.standard_normal(enc.slots)
    ct_a = keys.encrypt_asymmetric(ctx, pk, enc.encode(a, SCALE),
                                   jax.random.PRNGKey(6))
    ct_b = keys.encrypt_asymmetric(ctx, pk, enc.encode(b, SCALE),
                                   jax.random.PRNGKey(7))
    np.testing.assert_allclose(
        enc.decode(keys.decrypt(ctx, sk, evaluate.add(ctx, ct_a, ct_b))).real,
        a + b, atol=1e-4)
    np.testing.assert_allclose(
        enc.decode(keys.decrypt(ctx, sk, evaluate.sub(ctx, ct_a, ct_b))).real,
        a - b, atol=1e-4)


def test_mul_relin_rescale(setup):
    ctx, sk, pk, rlk, enc = setup
    rng = np.random.default_rng(4)
    a = rng.standard_normal(enc.slots)
    b = rng.standard_normal(enc.slots)
    ct_a = keys.encrypt_asymmetric(ctx, pk, enc.encode(a, SCALE),
                                   jax.random.PRNGKey(8))
    ct_b = keys.encrypt_asymmetric(ctx, pk, enc.encode(b, SCALE),
                                   jax.random.PRNGKey(9))
    ct = evaluate.multiply_and_relin(ctx, ct_a, ct_b, rlk)
    ct = evaluate.rescale_to_next(ctx, ct)
    out = enc.decode(keys.decrypt(ctx, sk, ct))
    np.testing.assert_allclose(out.real, a * b, atol=1e-2)


def test_multiply_plain_and_add_plain(setup):
    ctx, sk, pk, rlk, enc = setup
    rng = np.random.default_rng(5)
    a = rng.standard_normal(enc.slots)
    b = rng.standard_normal(enc.slots)
    ct = keys.encrypt_asymmetric(ctx, pk, enc.encode(a, SCALE),
                                 jax.random.PRNGKey(10))
    pt_b = enc.encode(b, SCALE)
    prod = evaluate.rescale_to_next(ctx, evaluate.multiply_plain(ctx, ct, pt_b))
    np.testing.assert_allclose(
        enc.decode(keys.decrypt(ctx, sk, prod)).real, a * b, atol=1e-2)
    add = evaluate.add_plain(ctx, ct, pt_b)
    np.testing.assert_allclose(
        enc.decode(keys.decrypt(ctx, sk, add)).real, a + b, atol=1e-4)


def test_sym_encrypt(setup):
    ctx, sk, pk, rlk, enc = setup
    rng = np.random.default_rng(6)
    z = rng.standard_normal(enc.slots)
    ct = keys.encrypt_symmetric(ctx, sk, enc.encode(z, SCALE),
                                jax.random.PRNGKey(12))
    np.testing.assert_allclose(
        enc.decode(keys.decrypt(ctx, sk, ct)).real, z, atol=1e-4)


def test_depth2_pipeline(setup):
    """Two multiplicative levels with rescale + level alignment
    (reference: 3_ckks.cu depth scenarios)."""
    ctx, sk, pk, rlk, enc = setup
    rng = np.random.default_rng(7)
    a = rng.standard_normal(enc.slots) * 0.5
    b = rng.standard_normal(enc.slots) * 0.5
    c = rng.standard_normal(enc.slots) * 0.5
    ct_a = keys.encrypt_asymmetric(ctx, pk, enc.encode(a, SCALE),
                                   jax.random.PRNGKey(20))
    ct_b = keys.encrypt_asymmetric(ctx, pk, enc.encode(b, SCALE),
                                   jax.random.PRNGKey(21))
    ab = evaluate.rescale_to_next(
        ctx, evaluate.multiply_and_relin(ctx, ct_a, ct_b, rlk))
    # encode c directly at ab's level and scale, then multiply again
    pt_c = enc.encode(c, ab.scale, chain_index=ab.chain_index)
    ct_c = keys.encrypt_asymmetric(ctx, pk, pt_c, jax.random.PRNGKey(22))
    abc = evaluate.rescale_to_next(
        ctx, evaluate.multiply_and_relin(ctx, ab, ct_c, rlk))
    out = enc.decode(keys.decrypt(ctx, sk, abc))
    np.testing.assert_allclose(out.real, a * b * c, atol=5e-2)


def test_add_many_and_plain_modswitch(setup):
    ctx, sk, pk, rlk, enc = setup
    rng = np.random.default_rng(8)
    vs = [rng.standard_normal(enc.slots) for _ in range(3)]
    cts = [keys.encrypt_asymmetric(ctx, pk, enc.encode(v, SCALE),
                                   jax.random.PRNGKey(30 + i))
           for i, v in enumerate(vs)]
    total = evaluate.add_many(ctx, cts)
    np.testing.assert_allclose(
        enc.decode(keys.decrypt(ctx, sk, total)).real, sum(vs), atol=1e-3)
    # plaintext mod switch follows a rescaled ciphertext's level
    prod = evaluate.rescale_to_next(
        ctx, evaluate.multiply_and_relin(ctx, cts[0], cts[1], rlk))
    pt = enc.encode(vs[2], prod.scale)
    pt_dn = evaluate.mod_switch_plain_to(ctx, pt, prod.chain_index)
    assert pt_dn.chain_index == prod.chain_index
    summed = evaluate.add_plain(ctx, prod, pt_dn)
    np.testing.assert_allclose(
        enc.decode(keys.decrypt(ctx, sk, summed)).real,
        vs[0] * vs[1] + vs[2], atol=1e-2)


def test_encrypted_matvec(setup):
    """Halevi-Shoup diagonal matvec (BASELINE config 5 building block)."""
    ctx, sk, pk, rlk, enc = setup
    rng = np.random.default_rng(9)
    d = 4
    M = rng.standard_normal((d, d)) * 0.3
    x = rng.standard_normal(d) * 0.3
    vec_rep = np.zeros(enc.slots)
    for i in range(2 * d):
        vec_rep[i] = x[i % d]
    glk = keys.create_galois_keys(ctx, sk, jax.random.PRNGKey(40),
                                  steps=list(range(1, d)))
    ct_x = keys.encrypt_asymmetric(ctx, pk, enc.encode(vec_rep, SCALE),
                                   jax.random.PRNGKey(41))
    acc = None
    for k in range(d):
        diag = np.zeros(enc.slots)
        diag[:d] = [M[i % d, (i + k) % d] for i in range(d)]
        pt = enc.encode(diag, SCALE)
        rot = evaluate.rotate_vector(ctx, ct_x, k, glk) if k else ct_x
        term = evaluate.multiply_plain(ctx, rot, pt)
        acc = term if acc is None else evaluate.add(ctx, acc, term)
    y = evaluate.rescale_to_next(ctx, acc)
    got = enc.decode(keys.decrypt(ctx, sk, y)).real[:d]
    np.testing.assert_allclose(got, M @ x, atol=1e-3)


def test_hoisted_linear_combo(setup):
    """Weighted hoisting == sum of multiply_plain(rotate) (one modup)."""
    from phantom_tpu.schemes.ckks_encoder import encode_extended
    ctx, sk, pk, rlk, enc = setup
    rng = np.random.default_rng(10)
    d = 4
    z = rng.standard_normal(enc.slots) * 0.3
    ct = keys.encrypt_asymmetric(ctx, pk, enc.encode(z, SCALE),
                                 jax.random.PRNGKey(50))
    glk = keys.create_galois_keys(ctx, sk, jax.random.PRNGKey(51),
                                  steps=list(range(1, d)))
    weights = [rng.standard_normal(enc.slots) * 0.3 for _ in range(d)]
    steps = list(range(d))
    pts_ext = [encode_extended(enc, w, SCALE, ct.chain_index)
               for w in weights]
    fast = evaluate.hoisted_linear_combo(ctx, ct, glk, steps, pts_ext, SCALE)
    # naive reference
    acc = None
    for s, w in zip(steps, weights):
        rot = evaluate.rotate_vector(ctx, ct, s, glk) if s else ct
        term = evaluate.multiply_plain(ctx, rot, enc.encode(w, SCALE))
        acc = term if acc is None else evaluate.add(ctx, acc, term)
    got = enc.decode(keys.decrypt(ctx, sk, fast))
    ref = enc.decode(keys.decrypt(ctx, sk, acc))
    np.testing.assert_allclose(got.real, ref.real, atol=1e-3)
    expect = sum(w * np.roll(z, -s) for s, w in zip(steps, weights))
    np.testing.assert_allclose(got.real, expect, atol=1e-3)
