"""BFV multiplication technique parity: BEHZ, HPSoverQ, HPSoverQ-leveled
(reference: mul_tech dispatch, evaluate.cu:805; examples/1_bfv.cu HPS
variant scenarios)."""

import jax
import numpy as np
import pytest

from phantom_tpu.host.modulus import CoeffModulus, PlainModulus
from phantom_tpu.schemes import (BatchEncoder, EncryptionParameters, MulTech,
                                 Scheme, evaluate, keys, make_context)


@pytest.mark.parametrize("mt", [MulTech.BEHZ, MulTech.HPS_OVERQ,
                                MulTech.HPS_OVERQ_LEVELED])
def test_mul_relin_all_techs(mt):
    n = 512
    coeff = [m.value for m in CoeffModulus.create(n, [40, 40, 40, 40])]
    t = PlainModulus.batching(n, 16).value
    params = EncryptionParameters.create(
        Scheme.BFV, n, coeff, plain_modulus=t, special_modulus_size=1,
        mul_tech=mt)
    ctx = make_context(params)
    rng = jax.random.PRNGKey(0)
    k_sk, k_pk, k_rlk = jax.random.split(rng, 3)
    sk = keys.gen_secret_key(ctx, k_sk)
    pk = keys.gen_public_key(ctx, sk, k_pk)
    rlk = keys.gen_relin_key(ctx, sk, k_rlk)
    enc = BatchEncoder(ctx)
    rg = np.random.default_rng(5)
    a = rg.integers(0, t, n, dtype=np.uint64)
    b = rg.integers(0, t, n, dtype=np.uint64)
    ct_a = keys.encrypt_asymmetric(ctx, pk, enc.encode(a),
                                   jax.random.PRNGKey(1))
    ct_b = keys.encrypt_asymmetric(ctx, pk, enc.encode(b),
                                   jax.random.PRNGKey(2))
    ct = evaluate.multiply_and_relin(ctx, ct_a, ct_b, rlk)
    expect = (a.astype(object) * b.astype(object)) % t
    np.testing.assert_array_equal(
        enc.decode(keys.decrypt(ctx, sk, ct)).astype(object), expect)
    # second depth: square the product
    ct_sq = evaluate.relinearize(ctx, evaluate.square(ctx, ct), rlk)
    np.testing.assert_array_equal(
        enc.decode(keys.decrypt(ctx, sk, ct_sq)).astype(object),
        (expect * expect) % t)
