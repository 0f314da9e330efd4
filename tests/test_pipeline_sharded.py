"""Coefficient-sharded mult+relin+rescale (sharded NTT wired into the
hybrid keyswitch) matches the local u64 evaluator bit-exactly at a
realistic size, and the steady-state HLO moves data with all-to-all (not
all-gather) at the NTT phase boundaries."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phantom_tpu.host import numth
from phantom_tpu.parallel import (build_sharded_step, make_coeff_mesh)
from phantom_tpu.schemes import (CKKSEncoder, EncryptionParameters, Scheme,
                                 evaluate, keys, make_context)


@pytest.fixture(scope="module")
def setup():
    # VERDICT round-2 item 5: realistic config (n >= 8192, L >= 8)
    n = 8192
    limbs, alpha = 8, 2
    qs = numth.get_primes(2 * n, 30, limbs)
    ps = numth.get_primes(2 * n, 31, alpha)
    params = EncryptionParameters.create(
        Scheme.CKKS, n, qs + ps, special_modulus_size=alpha)
    ctx = make_context(params)
    k = jax.random.split(jax.random.PRNGKey(0), 5)
    sk = keys.gen_secret_key(ctx, k[0])
    pk = keys.gen_public_key(ctx, sk, k[1])
    rlk = keys.gen_relin_key(ctx, sk, k[2])
    enc = CKKSEncoder(ctx)
    z = np.random.default_rng(0).standard_normal(enc.slots)
    pt = enc.encode(z, 2.0 ** 24)
    ct1 = keys.encrypt_asymmetric(ctx, pk, pt, k[3])
    ct2 = keys.encrypt_asymmetric(ctx, pk, pt, k[4])
    return ctx, rlk, ct1, ct2


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_sharded_pipeline_matches_local(setup):
    ctx, rlk, ct1, ct2 = setup
    local = np.asarray(evaluate.rescale_to_next(
        ctx, evaluate.multiply_and_relin(ctx, ct1, ct2, rlk)).data)

    mesh = make_coeff_mesh(8, dp=1)
    consts, step = build_sharded_step(ctx, rlk, mesh)
    n1, n2 = consts.n1, consts.n2
    d1 = jnp.asarray(np.asarray(ct1.data)).reshape(1, 2, -1, n1, n2)
    d2 = jnp.asarray(np.asarray(ct2.data)).reshape(1, 2, -1, n1, n2)
    out = np.asarray(step(d1, d2))
    np.testing.assert_array_equal(
        out.reshape(2, -1, n1 * n2), local)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_sharded_pipeline_hlo_collectives(setup):
    ctx, rlk, ct1, ct2 = setup
    mesh = make_coeff_mesh(8, dp=1)
    from phantom_tpu.parallel.pipeline_sharded import (
        build_sharded_consts, sharded_mult_relin_rescale)
    from jax.sharding import NamedSharding, PartitionSpec as P
    consts = build_sharded_consts(ctx, rlk)
    n1, n2 = consts.n1, consts.n2
    sh = NamedSharding(mesh, P(None, None, None, "coeff"))
    fn = jax.jit(lambda c, a, b: sharded_mult_relin_rescale(c, mesh, a, b),
                 in_shardings=(NamedSharding(mesh, P()), sh, sh),
                 out_shardings=sh)
    d1 = jnp.asarray(np.asarray(ct1.data)).reshape(2, -1, n1, n2)
    hlo = fn.lower(consts, d1, d1).compile().as_text()
    assert "all-to-all" in hlo, "NTT phase exchange must be an all-to-all"
    # the pipeline's layout keeps every non-NTT stage local: no all-gather
    # may appear in the steady state
    assert "all-gather" not in hlo, "unexpected all-gather in sharded step"


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_sharded_bgv_matches_local():
    from phantom_tpu.host.modulus import PlainModulus
    from phantom_tpu.parallel.pipeline_sharded import (
        build_sharded_consts, sharded_bgv_mult_relin_modswitch)
    from phantom_tpu.schemes import BatchEncoder
    n = 2048
    limbs, alpha = 6, 2
    qs = numth.get_primes(2 * n, 30, limbs)
    ps = numth.get_primes(2 * n, 31, alpha)
    t = PlainModulus.batching(n, 16).value
    params = EncryptionParameters.create(
        Scheme.BGV, n, qs + ps, plain_modulus=t, special_modulus_size=alpha)
    ctx = make_context(params)
    k = jax.random.split(jax.random.PRNGKey(81), 5)
    sk = keys.gen_secret_key(ctx, k[0])
    pk = keys.gen_public_key(ctx, sk, k[1])
    rlk = keys.gen_relin_key(ctx, sk, k[2])
    enc = BatchEncoder(ctx)
    rg = np.random.default_rng(7)
    a = rg.integers(0, t, n, dtype=np.uint64)
    b = rg.integers(0, t, n, dtype=np.uint64)
    ct1 = keys.encrypt_asymmetric(ctx, pk, enc.encode(a), k[3])
    ct2 = keys.encrypt_asymmetric(ctx, pk, enc.encode(b), k[4])
    local = np.asarray(evaluate.mod_switch_to_next(
        ctx, evaluate.multiply_and_relin(ctx, ct1, ct2, rlk)).data)

    mesh = make_coeff_mesh(8, dp=1)
    consts = build_sharded_consts(ctx, rlk)
    bgv = ctx.get_context_data(1).bgv
    from jax.sharding import NamedSharding, PartitionSpec as P
    n1, n2 = consts.n1, consts.n2
    sh = NamedSharding(mesh, P(None, None, None, "coeff"))
    rep = NamedSharding(mesh, P())
    fn = jax.jit(lambda c, g, x, y: sharded_bgv_mult_relin_modswitch(
        c, mesh, g, x, y),
        in_shardings=(rep, rep, sh, sh), out_shardings=sh)
    d1 = jnp.asarray(np.asarray(ct1.data)).reshape(2, -1, n1, n2)
    d2 = jnp.asarray(np.asarray(ct2.data)).reshape(2, -1, n1, n2)
    out = np.asarray(fn(consts, bgv, d1, d2))
    np.testing.assert_array_equal(out.reshape(2, -1, n1 * n2), local)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_sharded_bfv_matches_local():
    from phantom_tpu.host.modulus import PlainModulus
    from phantom_tpu.parallel.pipeline_sharded import (
        build_bfv_sharded_consts, sharded_bfv_mult_relin)
    from phantom_tpu.schemes import BatchEncoder
    n = 2048
    limbs, alpha = 6, 2
    qs = numth.get_primes(2 * n, 30, limbs)
    ps = numth.get_primes(2 * n, 31, alpha)
    t = PlainModulus.batching(n, 16).value
    params = EncryptionParameters.create(
        Scheme.BFV, n, qs + ps, plain_modulus=t, special_modulus_size=alpha)
    ctx = make_context(params)
    k = jax.random.split(jax.random.PRNGKey(83), 5)
    sk = keys.gen_secret_key(ctx, k[0])
    pk = keys.gen_public_key(ctx, sk, k[1])
    rlk = keys.gen_relin_key(ctx, sk, k[2])
    enc = BatchEncoder(ctx)
    rg = np.random.default_rng(8)
    a = rg.integers(0, t, n, dtype=np.uint64)
    b = rg.integers(0, t, n, dtype=np.uint64)
    ct1 = keys.encrypt_asymmetric(ctx, pk, enc.encode(a), k[3])
    ct2 = keys.encrypt_asymmetric(ctx, pk, enc.encode(b), k[4])
    local = np.asarray(
        evaluate.multiply_and_relin(ctx, ct1, ct2, rlk).data)

    mesh = make_coeff_mesh(8, dp=1)
    bc3 = build_bfv_sharded_consts(ctx, rlk)
    from jax.sharding import NamedSharding, PartitionSpec as P
    n1, n2 = bc3.base.n1, bc3.base.n2
    sh = NamedSharding(mesh, P(None, None, None, "coeff"))
    rep = NamedSharding(mesh, P())
    fn = jax.jit(lambda c, x, y: sharded_bfv_mult_relin(c, mesh, x, y),
                 in_shardings=(rep, sh, sh), out_shardings=sh)
    d1 = jnp.asarray(np.asarray(ct1.data)).reshape(2, -1, n1, n2)
    d2 = jnp.asarray(np.asarray(ct2.data)).reshape(2, -1, n1, n2)
    out = np.asarray(fn(bc3, d1, d2))
    np.testing.assert_array_equal(out.reshape(2, -1, n1 * n2), local)
