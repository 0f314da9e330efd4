"""BFV end-to-end: encode/encrypt/decrypt roundtrips (sym + asym).

Mirrors the reference's example-driven integration tests
(examples/1_bfv.cu:478-523 enc/dec sweeps).
"""

import jax
import numpy as np
import pytest

from phantom_tpu.host import numth
from phantom_tpu.host.modulus import CoeffModulus, PlainModulus
from phantom_tpu.schemes import (BatchEncoder, EncryptionParameters, Scheme,
                                 make_context, keys)


@pytest.fixture(scope="module")
def bfv_ctx():
    n = 1024  # small for CPU test speed; structure identical to n=4096+
    coeff = [m.value for m in CoeffModulus.create(n, [40, 40, 40])]
    t = PlainModulus.batching(n, 16).value
    params = EncryptionParameters.create(
        Scheme.BFV, n, coeff, plain_modulus=t, special_modulus_size=1)
    return make_context(params)


@pytest.fixture(scope="module")
def bfv_keys(bfv_ctx):
    rng = jax.random.PRNGKey(0)
    k_sk, k_pk = jax.random.split(rng)
    sk = keys.gen_secret_key(bfv_ctx, k_sk)
    pk = keys.gen_public_key(bfv_ctx, sk, k_pk)
    return sk, pk


def test_encode_decode_roundtrip(bfv_ctx):
    enc = BatchEncoder(bfv_ctx)
    n = bfv_ctx.params.n
    rng = np.random.default_rng(1)
    vals = rng.integers(0, bfv_ctx.params.plain_modulus, n, dtype=np.uint64)
    pt = enc.encode(vals)
    out = enc.decode(pt)
    np.testing.assert_array_equal(out, vals)


def test_sym_encrypt_decrypt(bfv_ctx, bfv_keys):
    sk, _ = bfv_keys
    enc = BatchEncoder(bfv_ctx)
    n = bfv_ctx.params.n
    vals = np.arange(n, dtype=np.uint64) % bfv_ctx.params.plain_modulus
    pt = enc.encode(vals)
    ct = keys.encrypt_symmetric(bfv_ctx, sk, pt, jax.random.PRNGKey(42))
    dec = keys.decrypt(bfv_ctx, sk, ct)
    np.testing.assert_array_equal(enc.decode(dec), vals)


def test_asym_encrypt_decrypt(bfv_ctx, bfv_keys):
    sk, pk = bfv_keys
    enc = BatchEncoder(bfv_ctx)
    n = bfv_ctx.params.n
    rng = np.random.default_rng(3)
    vals = rng.integers(0, bfv_ctx.params.plain_modulus, n, dtype=np.uint64)
    pt = enc.encode(vals)
    ct = keys.encrypt_asymmetric(bfv_ctx, pk, pt, jax.random.PRNGKey(7))
    dec = keys.decrypt(bfv_ctx, sk, ct)
    np.testing.assert_array_equal(enc.decode(dec), vals)
