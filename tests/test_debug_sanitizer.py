"""Range-invariant sanitizer (phantom_tpu.utils.debug): clean pipelines
pass, an out-of-range ciphertext word trips a located checkify error,
and disabled mode adds zero ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phantom_tpu.host import numth
from phantom_tpu.ops import pipeline32 as pp
from phantom_tpu.schemes import (CKKSEncoder, EncryptionParameters, Scheme,
                                 keys, make_context)
from phantom_tpu.utils import debug


@pytest.fixture(scope="module")
def setup():
    n = 256
    qs = numth.get_primes(2 * n, 28, 4)
    ps = numth.get_primes(2 * n, 29, 1)
    params = EncryptionParameters.create(
        Scheme.CKKS, n, qs + ps, special_modulus_size=1)
    ctx = make_context(params)
    k = jax.random.split(jax.random.PRNGKey(11), 5)
    sk = keys.gen_secret_key(ctx, k[0])
    pk = keys.gen_public_key(ctx, sk, k[1])
    rlk = keys.gen_relin_key(ctx, sk, k[2])
    enc = CKKSEncoder(ctx)
    pt = enc.encode(np.arange(n // 2) / n, 2.0 ** 22)
    ct1 = keys.encrypt_asymmetric(ctx, pk, pt, k[3])
    ct2 = keys.encrypt_asymmetric(ctx, pk, pt, k[4])
    pipe = pp.build_pipeline32(ctx, rlk)
    d1 = jnp.asarray(np.asarray(ct1.data).astype(np.uint32))
    d2 = jnp.asarray(np.asarray(ct2.data).astype(np.uint32))
    return pipe, d1, d2


def test_clean_run_passes_checks(setup):
    pipe, d1, d2 = setup
    ref = np.asarray(pp.mult_relin_rescale32(pipe, d1, d2))
    debug.enable()
    try:
        out = debug.checked_call(pp.mult_relin_rescale32, pipe, d1, d2)
    finally:
        debug.enable(False)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_out_of_range_input_trips(setup):
    pipe, d1, d2 = setup
    bad = d1.at[0, 0, 0].set(jnp.uint32(0xFFFFFFFF))
    debug.enable()
    try:
        with pytest.raises(Exception, match="not canonical"):
            debug.checked_call(pp.mult_relin_rescale32, pipe, bad, d2)
    finally:
        debug.enable(False)


def test_disabled_mode_adds_no_checks(setup):
    pipe, d1, d2 = setup
    assert not debug.enabled()
    lowered = jax.jit(pp.mult_relin_rescale32).lower(pipe, d1, d2)
    assert "check" not in lowered.as_text().lower().replace(
        "checkpoint", "")  # no checkify custom calls in the clean graph
