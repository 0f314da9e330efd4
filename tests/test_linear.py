"""BSGS encrypted linear transform (schemes/linear.py).

Checks the Halevi-Shoup diagonal method with baby-step/giant-step
scheduling against the plaintext matvec, the zero-diagonal skip path, and
u64-vs-Fast32 bit-identity of the whole composite op.
"""

import jax
import numpy as np
import pytest

from phantom_tpu.host import numth
from phantom_tpu.schemes import (CKKSEncoder, EncryptionParameters,
                                 LinearTransform, Scheme, keys, make_context)

SCALE = 2.0 ** 26


@pytest.fixture(scope="module")
def setup():
    n = 1024
    qs = numth.get_primes(2 * n, 28, 4)   # < 2^30: Fast32-compatible
    coeff = [qs[0], qs[1], qs[2], qs[3]]  # q0 q1 q2 | p special
    params = EncryptionParameters.create(
        Scheme.CKKS, n, coeff, special_modulus_size=1)
    ctx = make_context(params)
    rng = jax.random.PRNGKey(0)
    k_sk, k_pk, k_glk = jax.random.split(rng, 3)
    sk = keys.gen_secret_key(ctx, k_sk)
    pk = keys.gen_public_key(ctx, sk, k_pk)
    enc = CKKSEncoder(ctx)
    return ctx, sk, pk, k_glk, enc


def _encrypt(ctx, pk, enc, lt, x, key):
    pt = lt.encode_input(enc, x, SCALE)
    return keys.encrypt_asymmetric(ctx, pk, pt, jax.random.PRNGKey(key))


def test_bsgs_matvec(setup):
    ctx, sk, pk, k_glk, enc = setup
    rng = np.random.default_rng(1)
    d = 8
    M = rng.standard_normal((d, d)) * 0.3
    x = rng.standard_normal(d) * 0.3
    lt = LinearTransform(M)
    assert lt.bs == 3 and lt.gs == 3          # uneven split: groups 3+3+2
    assert lt.steps_required() == [1, 2, 3, 6]
    glk = keys.create_galois_keys(ctx, sk, k_glk,
                                  steps=lt.steps_required())
    lt.prepare(enc, SCALE)
    ct = _encrypt(ctx, pk, enc, lt, x, 11)
    y = lt.apply(ctx, ct, glk)
    got = enc.decode(keys.decrypt(ctx, sk, y)).real[:d]
    np.testing.assert_allclose(got, M @ x, atol=1e-3)
    # the output stays d-periodic (composable into a next layer)
    full = enc.decode(keys.decrypt(ctx, sk, y)).real
    np.testing.assert_allclose(full[d:2 * d], got, atol=1e-4)


def test_bsgs_zero_diagonals_skipped(setup):
    ctx, sk, pk, k_glk, enc = setup
    rng = np.random.default_rng(2)
    d = 8
    M = np.diag(rng.standard_normal(d) * 0.5)  # only diag_0 is nonzero
    x = rng.standard_normal(d) * 0.5
    lt = LinearTransform(M)
    assert lt.steps_required() == []           # no rotation keys needed
    lt.prepare(enc, SCALE)
    ct = _encrypt(ctx, pk, enc, lt, x, 12)
    y = lt.apply(ctx, ct, glk=None)
    got = enc.decode(keys.decrypt(ctx, sk, y)).real[:d]
    np.testing.assert_allclose(got, M @ x, atol=1e-3)


def test_bsgs_fast32_bit_match(setup):
    """apply_fast32 must be bit-identical to the u64 apply."""
    from phantom_tpu import Fast32
    ctx, sk, pk, k_glk, enc = setup
    rng = np.random.default_rng(3)
    d = 16
    M = rng.standard_normal((d, d)) * 0.3
    M[rng.random((d, d)) < 0.2] = 0.0
    x = rng.standard_normal(d) * 0.3
    lt = LinearTransform(M)
    glk = keys.create_galois_keys(ctx, sk, k_glk,
                                  steps=lt.steps_required())
    lt.prepare(enc, SCALE)
    ct = _encrypt(ctx, pk, enc, lt, x, 13)
    y64 = lt.apply(ctx, ct, glk)
    ev = Fast32(ctx, glk=glk)
    y32 = lt.apply_fast32(ev, ev.from_ciphertext(ct))
    got = enc.decode(keys.decrypt(ctx, sk, y64)).real[:d]
    np.testing.assert_allclose(got, M @ x, atol=1e-3)
    assert np.array_equal(np.asarray(y64.data),
                          np.asarray(ev.to_ciphertext(y32).data))
    assert y32.scale == y64.scale
