"""u32 coefficient-sharded pipeline == u32 local pipeline (8-device mesh),
with the all-to-all-only collective audit (the multichip production path:
fast representation + sharded coefficients)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phantom_tpu.host import numth
from phantom_tpu.ops import pipeline32 as pp
from phantom_tpu.parallel import make_coeff_mesh
from phantom_tpu.parallel import sharded32 as s32
from phantom_tpu.schemes import (CKKSEncoder, EncryptionParameters, Scheme,
                                 keys, make_context)


@pytest.fixture(scope="module")
def setup():
    n = 8192
    limbs, alpha = 8, 2
    qs = numth.get_primes(2 * n, 28, limbs)
    ps = numth.get_primes(2 * n, 29, alpha)
    params = EncryptionParameters.create(
        Scheme.CKKS, n, qs + ps, special_modulus_size=alpha)
    ctx = make_context(params)
    k = jax.random.split(jax.random.PRNGKey(51), 5)
    sk = keys.gen_secret_key(ctx, k[0])
    pk = keys.gen_public_key(ctx, sk, k[1])
    rlk = keys.gen_relin_key(ctx, sk, k[2])
    enc = CKKSEncoder(ctx)
    z = np.random.default_rng(1).standard_normal(enc.slots)
    pt = enc.encode(z, 2.0 ** 22)
    ct1 = keys.encrypt_asymmetric(ctx, pk, pt, k[3])
    ct2 = keys.encrypt_asymmetric(ctx, pk, pt, k[4])
    return ctx, rlk, ct1, ct2


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
@pytest.mark.parametrize("engine", ["xla", "mxu"])
def test_sharded32_matches_local(setup, engine):
    ctx, rlk, ct1, ct2 = setup
    pipe = pp.build_pipeline32(ctx, rlk)
    d1 = jnp.asarray(np.asarray(ct1.data).astype(np.uint32))
    d2 = jnp.asarray(np.asarray(ct2.data).astype(np.uint32))
    local = np.asarray(pp.mult_relin_rescale32(pipe, d1, d2))

    mesh = make_coeff_mesh(8, dp=1)
    consts, step = s32.build_sharded_step32(ctx, rlk, mesh, engine=engine)
    n1, n2 = consts.n1, consts.n2
    out = np.asarray(step(d1.reshape(1, 2, -1, n1, n2),
                          d2.reshape(1, 2, -1, n1, n2)))
    np.testing.assert_array_equal(out.reshape(2, -1, n1 * n2), local)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
@pytest.mark.parametrize("engine", ["xla", "mxu"])
def test_sharded32_hlo_collectives(setup, engine):
    ctx, rlk, ct1, ct2 = setup
    mesh = make_coeff_mesh(8, dp=1)
    from jax.sharding import NamedSharding, PartitionSpec as P
    consts = s32.build_sharded32(ctx, rlk, engine=engine)
    n1, n2 = consts.n1, consts.n2
    sh = NamedSharding(mesh, P(None, None, None, "coeff"))
    fn = jax.jit(lambda c, a, b: s32.sharded_mult_relin_rescale32(
        c, mesh, a, b),
        in_shardings=(NamedSharding(mesh, P()), sh, sh), out_shardings=sh)
    d1 = jnp.asarray(np.asarray(ct1.data).astype(np.uint32)
                     ).reshape(2, -1, n1, n2)
    hlo = fn.lower(consts, d1, d1).compile().as_text()
    assert "all-to-all" in hlo
    assert "all-gather" not in hlo
