"""Mesh-sharded pipeline == single-device pipeline (CPU 8-device mesh)."""

import jax
import numpy as np
import pytest

from phantom_tpu.host import numth
from phantom_tpu.schemes import (EncryptionParameters, Scheme, evaluate,
                                 keys, make_context)
from phantom_tpu.parallel import (make_mesh, shard_ciphertext_data,
                                  sharded_mul_relin_rescale_step)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_sharded_matches_local():
    n = 128
    limbs, alpha = 8, 4
    qs = numth.get_primes(2 * n, 30, limbs)
    ps = numth.get_primes(2 * n, 31, alpha)
    params = EncryptionParameters.create(
        Scheme.CKKS, n, qs + ps, special_modulus_size=alpha)
    ctx = make_context(params)
    rng = jax.random.PRNGKey(0)
    k_sk, k_pk, k_rlk, k1, k2 = jax.random.split(rng, 5)
    sk = keys.gen_secret_key(ctx, k_sk)
    pk = keys.gen_public_key(ctx, sk, k_pk)
    rlk = keys.gen_relin_key(ctx, sk, k_rlk)
    from phantom_tpu.schemes import CKKSEncoder
    enc = CKKSEncoder(ctx)
    z = np.random.default_rng(0).standard_normal(enc.slots)
    pt = enc.encode(z, 2.0 ** 20)
    ct1 = keys.encrypt_asymmetric(ctx, pk, pt, k1)
    ct2 = keys.encrypt_asymmetric(ctx, pk, pt, k2)

    local = evaluate.rescale_to_next(
        ctx, evaluate.multiply_and_relin(ctx, ct1, ct2, rlk)).data

    mesh = make_mesh(8)
    dp = mesh.shape["dp"]
    step = sharded_mul_relin_rescale_step(ctx, ct1, ct2, rlk, mesh)
    d1 = shard_ciphertext_data(
        jax.numpy.broadcast_to(ct1.data[None], (dp,) + ct1.data.shape), mesh)
    d2 = shard_ciphertext_data(
        jax.numpy.broadcast_to(ct2.data[None], (dp,) + ct2.data.shape), mesh)
    out = np.asarray(step(d1, d2))
    for b in range(dp):
        np.testing.assert_array_equal(out[b], np.asarray(local))
