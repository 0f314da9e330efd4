"""Paterson-Stockmeyer polynomial evaluation (schemes/poly.py).

Checks the automatic scale-managed BSGS evaluator against numpy on dense,
sparse, and high-degree polynomials, the depth accounting, and u64-vs-
Fast32 bit-identity of the whole composite op.
"""

import jax
import numpy as np
import pytest

from phantom_tpu.host import numth
from phantom_tpu.schemes import (CKKSEncoder, EncryptionParameters, Scheme,
                                 keys, make_context)
from phantom_tpu.schemes.poly import (bsgs_counts, poly_depth, poly_eval,
                                      poly_eval_fast32)

SCALE = 2.0 ** 28   # ~ the rescale primes, so the power ladder stays flat


@pytest.fixture(scope="module")
def setup():
    n = 1024
    qs = numth.get_primes(2 * n, 28, 10)  # q0 + 8 levels | special
    params = EncryptionParameters.create(
        Scheme.CKKS, n, qs, special_modulus_size=1)
    ctx = make_context(params)
    k = jax.random.split(jax.random.PRNGKey(4), 3)
    sk = keys.gen_secret_key(ctx, k[0])
    pk = keys.gen_public_key(ctx, sk, k[1])
    rlk = keys.gen_relin_key(ctx, sk, k[2])
    enc = CKKSEncoder(ctx)
    return ctx, sk, pk, rlk, enc


def _encrypt(setup, x, seed):
    ctx, sk, pk, rlk, enc = setup
    return keys.encrypt_asymmetric(ctx, pk, enc.encode(x, SCALE),
                                   jax.random.PRNGKey(seed))


def _run(setup, coeffs, x, seed, atol=2e-3, bs=None):
    ctx, sk, pk, rlk, enc = setup
    ct = _encrypt(setup, x, seed)
    out = poly_eval(ctx, ct, coeffs, rlk, enc, bs=bs)
    got = enc.decode(keys.decrypt(ctx, sk, out)).real
    want = np.polyval(np.asarray(coeffs, float)[::-1], x)
    np.testing.assert_allclose(got, want, atol=atol)
    return ct, out


def test_deg7_dense(setup):
    rng = np.random.default_rng(0)
    enc = setup[4]
    x = rng.uniform(-0.9, 0.9, enc.slots)
    coeffs = [0.5, 0.197, 0.04, -0.004, 0.01, -0.02, 0.003, -0.001]
    ct, out = _run(setup, coeffs, x, 21)
    # depth accounting: chain consumption matches poly_depth
    assert out.chain_index - ct.chain_index == poly_depth(7)
    # unrescaled convention
    assert abs(out.scale - SCALE * SCALE) < 1e-6 * out.scale


def test_deg13_two_giants(setup):
    """gs > 2 exercises the recursive split (k=1 and k=0 giants)."""
    rng = np.random.default_rng(1)
    enc = setup[4]
    x = rng.uniform(-0.8, 0.8, enc.slots)
    coeffs = rng.uniform(-0.3, 0.3, 14)
    assert bsgs_counts(13) == (4, 4)
    _run(setup, coeffs, x, 22, atol=5e-3)


def test_sparse_and_constant_chunks(setup):
    """Zero chunks and constant-only hi-chunks hit the pt*giant path."""
    rng = np.random.default_rng(2)
    enc = setup[4]
    x = rng.uniform(-0.9, 0.9, enc.slots)
    coeffs = np.zeros(9)
    coeffs[0], coeffs[3], coeffs[8] = 0.3, 0.2, 0.1   # hi chunk = const
    _run(setup, coeffs, x, 23)


def test_odd_polynomial_skips_even_powers(setup):
    ctx, sk, pk, rlk, enc = setup
    rng = np.random.default_rng(3)
    x = rng.uniform(-0.9, 0.9, enc.slots)
    coeffs = [0.0, 0.197, 0.0, -0.004, 0.0, 0.002, 0.0, -0.0008]
    _run(setup, coeffs, x, 24)


def test_explicit_bs(setup):
    """bs=2 (deep-narrow) must agree with the default split."""
    rng = np.random.default_rng(4)
    enc = setup[4]
    x = rng.uniform(-0.8, 0.8, enc.slots)
    coeffs = rng.uniform(-0.3, 0.3, 8)
    _run(setup, coeffs, x, 25, bs=2)


def test_fast32_bit_match(setup):
    """poly_eval_fast32 must be bit-identical to the u64 evaluator."""
    from phantom_tpu import Fast32
    ctx, sk, pk, rlk, enc = setup
    rng = np.random.default_rng(5)
    x = rng.uniform(-0.8, 0.8, enc.slots)
    coeffs = rng.uniform(-0.3, 0.3, 14)
    ct = _encrypt(setup, x, 26)
    y64 = poly_eval(ctx, ct, coeffs, rlk, enc)
    ev = Fast32(ctx, rlk=rlk)
    y32 = poly_eval_fast32(ev, ev.from_ciphertext(ct), coeffs, enc)
    assert np.array_equal(np.asarray(y64.data),
                          np.asarray(ev.to_ciphertext(y32).data))
    assert y32.scale == y64.scale
    assert y32.chain_index == y64.chain_index


def test_chebyshev_deg13(setup):
    """Chebyshev-basis PS (T_i ladder + division by T_m) vs numpy."""
    from numpy.polynomial import chebyshev as C
    from phantom_tpu.schemes.poly import poly_eval_cheb
    ctx, sk, pk, rlk, enc = setup
    rng = np.random.default_rng(6)
    x = rng.uniform(-1.0, 1.0, enc.slots)
    cc = rng.uniform(-0.3, 0.3, 14)
    ct = _encrypt(setup, x, 27)
    out = poly_eval_cheb(ctx, ct, cc, rlk, enc)
    got = enc.decode(keys.decrypt(ctx, sk, out)).real
    np.testing.assert_allclose(got, C.chebval(x, cc), atol=5e-3)


def test_chebyshev_interval_sine(setup):
    """chebyshev_fit + interval mapping: the EvalMod shape (high-degree
    sine over a wide interval, coefficients stay O(1))."""
    from numpy.polynomial import chebyshev as C
    from phantom_tpu.schemes.poly import chebyshev_fit, poly_eval_cheb
    ctx, sk, pk, rlk, enc = setup
    rng = np.random.default_rng(7)
    K = 2.25
    f = lambda v: np.sin(2 * np.pi * v) / (2 * np.pi)  # noqa: E731
    cc = chebyshev_fit(f, 23, (-K, K))
    assert np.max(np.abs(cc)) < 1.0                    # no 2^deg blowup
    x = rng.uniform(-K, K, enc.slots)
    ct = _encrypt(setup, x, 28)
    out = poly_eval_cheb(ctx, ct, cc, rlk, enc, interval=(-K, K))
    got = enc.decode(keys.decrypt(ctx, sk, out)).real
    np.testing.assert_allclose(got, f(x), atol=5e-3)


def test_chebyshev_fast32_bit_match(setup):
    from phantom_tpu import Fast32
    from phantom_tpu.schemes.poly import (poly_eval_cheb,
                                          poly_eval_cheb_fast32)
    ctx, sk, pk, rlk, enc = setup
    rng = np.random.default_rng(8)
    x = rng.uniform(-1.0, 1.0, enc.slots)
    cc = rng.uniform(-0.3, 0.3, 14)
    ct = _encrypt(setup, x, 29)
    y64 = poly_eval_cheb(ctx, ct, cc, rlk, enc)
    ev = Fast32(ctx, rlk=rlk)
    y32 = poly_eval_cheb_fast32(ev, ev.from_ciphertext(ct), cc, enc)
    assert np.array_equal(np.asarray(y64.data),
                          np.asarray(ev.to_ciphertext(y32).data))
    assert y32.scale == y64.scale


def test_degenerate_inputs(setup):
    ctx, sk, pk, rlk, enc = setup
    with pytest.raises(ValueError):
        poly_eval(ctx, None, [1.0], rlk, enc)          # constant
    with pytest.raises(ValueError):
        poly_eval(ctx, None, [1.0, 0.0, 0.0], rlk, enc)  # trailing zeros
