"""u32 fast paths for BFV / BGV / rotations / hoisting bit-match the u64
evaluator (VERDICT round-2 item 4: all schemes and verbs at device speed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phantom_tpu.host import numth
from phantom_tpu.host.modulus import PlainModulus
from phantom_tpu.ops import bfv32, bgv32
from phantom_tpu.ops import pipeline32 as pp
from phantom_tpu.schemes import (BatchEncoder, CKKSEncoder,
                                 EncryptionParameters, Scheme, evaluate, keys,
                                 make_context)

N = 128


def _u32(a):
    return jnp.asarray(np.asarray(a).astype(np.uint32))


# ---------------------------------------------------------------------------
# BFV (HPS)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def bfv_setup():
    qs = numth.get_primes(2 * N, 28, 4)
    ps = numth.get_primes(2 * N, 29, 2)
    t = PlainModulus.batching(N, 16).value
    params = EncryptionParameters.create(
        Scheme.BFV, N, qs + ps, plain_modulus=t, special_modulus_size=2)
    ctx = make_context(params)
    k = jax.random.split(jax.random.PRNGKey(7), 5)
    sk = keys.gen_secret_key(ctx, k[0])
    pk = keys.gen_public_key(ctx, sk, k[1])
    rlk = keys.gen_relin_key(ctx, sk, k[2])
    enc = BatchEncoder(ctx)
    rg = np.random.default_rng(3)
    a = rg.integers(0, t, N, dtype=np.uint64)
    b = rg.integers(0, t, N, dtype=np.uint64)
    ct1 = keys.encrypt_asymmetric(ctx, pk, enc.encode(a), k[3])
    ct2 = keys.encrypt_asymmetric(ctx, pk, enc.encode(b), k[4])
    return ctx, rlk, ct1, ct2


@pytest.mark.parametrize("use_pallas", [False, True, "mxu", "mxu-pallas"])
def test_bfv_mult_relin_bit_match(bfv_setup, use_pallas):
    ctx, rlk, ct1, ct2 = bfv_setup
    ref = np.asarray(evaluate.multiply_and_relin(ctx, ct1, ct2, rlk).data)
    p = bfv32.build_bfv32(ctx, rlk, use_pallas=use_pallas)
    out = np.asarray(bfv32.bfv_mult_relin32(
        p, _u32(ct1.data), _u32(ct2.data)))
    np.testing.assert_array_equal(out, ref.astype(np.uint32))


@pytest.mark.parametrize("use_pallas", [False])
def test_bfv_mult_relin_overq_bit_match(use_pallas):
    from phantom_tpu.schemes import MulTech
    qs = numth.get_primes(2 * N, 28, 4)
    ps = numth.get_primes(2 * N, 29, 2)
    t = PlainModulus.batching(N, 16).value
    params = EncryptionParameters.create(
        Scheme.BFV, N, qs + ps, plain_modulus=t, special_modulus_size=2,
        mul_tech=MulTech.HPS_OVERQ)
    ctx = make_context(params)
    k = jax.random.split(jax.random.PRNGKey(17), 5)
    sk = keys.gen_secret_key(ctx, k[0])
    pk = keys.gen_public_key(ctx, sk, k[1])
    rlk = keys.gen_relin_key(ctx, sk, k[2])
    enc = BatchEncoder(ctx)
    rg = np.random.default_rng(8)
    a = rg.integers(0, t, N, dtype=np.uint64)
    b = rg.integers(0, t, N, dtype=np.uint64)
    ct1 = keys.encrypt_asymmetric(ctx, pk, enc.encode(a), k[3])
    ct2 = keys.encrypt_asymmetric(ctx, pk, enc.encode(b), k[4])
    ref = np.asarray(evaluate.multiply_and_relin(ctx, ct1, ct2, rlk).data)
    p = bfv32.build_bfv32(ctx, rlk, use_pallas=use_pallas)
    out = np.asarray(bfv32.bfv_mult_relin_overq32(
        p, _u32(ct1.data), _u32(ct2.data)))
    np.testing.assert_array_equal(out, ref.astype(np.uint32))


def test_bfv_mult_relin_behz_bit_match():
    from phantom_tpu.schemes import MulTech
    qs = numth.get_primes(2 * N, 28, 4)
    ps = numth.get_primes(2 * N, 29, 2)
    t = PlainModulus.batching(N, 16).value
    params = EncryptionParameters.create(
        Scheme.BFV, N, qs + ps, plain_modulus=t, special_modulus_size=2,
        mul_tech=MulTech.BEHZ)
    ctx = make_context(params)
    # u32-compatible params must have received a sub-2^30 Bsk pool
    assert all(int(v) < (1 << 30) for v in np.asarray(ctx.bsk_ntt.q))
    k = jax.random.split(jax.random.PRNGKey(29), 5)
    sk = keys.gen_secret_key(ctx, k[0])
    pk = keys.gen_public_key(ctx, sk, k[1])
    rlk = keys.gen_relin_key(ctx, sk, k[2])
    enc = BatchEncoder(ctx)
    rg = np.random.default_rng(14)
    a = rg.integers(0, t, N, dtype=np.uint64)
    b = rg.integers(0, t, N, dtype=np.uint64)
    ct1 = keys.encrypt_asymmetric(ctx, pk, enc.encode(a), k[3])
    ct2 = keys.encrypt_asymmetric(ctx, pk, enc.encode(b), k[4])
    ref_ct = evaluate.multiply_and_relin(ctx, ct1, ct2, rlk)
    # sanity: the u64 BEHZ path with the small Bsk pool still decrypts
    got = enc.decode(keys.decrypt(ctx, sk, ref_ct))
    expect = (a.astype(object) * b.astype(object)) % t
    np.testing.assert_array_equal(got.astype(object), expect)
    p = bfv32.build_bfv_behz32(ctx, rlk)
    out = np.asarray(bfv32.bfv_mult_relin_behz32(
        p, _u32(ct1.data), _u32(ct2.data)))
    np.testing.assert_array_equal(out, np.asarray(ref_ct.data)
                                  .astype(np.uint32))


def test_bfv_mult_relin_leveled_bit_match(monkeypatch):
    from phantom_tpu.schemes import MulTech
    qs = numth.get_primes(2 * N, 28, 5)
    ps = numth.get_primes(2 * N, 29, 1)
    t = PlainModulus.batching(N, 16).value
    params = EncryptionParameters.create(
        Scheme.BFV, N, qs + ps, plain_modulus=t, special_modulus_size=1,
        mul_tech=MulTech.HPS_OVERQ_LEVELED)
    ctx = make_context(params)
    k = jax.random.split(jax.random.PRNGKey(23), 5)
    sk = keys.gen_secret_key(ctx, k[0])
    pk = keys.gen_public_key(ctx, sk, k[1])
    rlk = keys.gen_relin_key(ctx, sk, k[2])
    enc = BatchEncoder(ctx)
    rg = np.random.default_rng(12)
    a = rg.integers(0, t, N, dtype=np.uint64)
    b = rg.integers(0, t, N, dtype=np.uint64)
    ct1 = keys.encrypt_asymmetric(ctx, pk, enc.encode(a), k[3])
    ct2 = keys.encrypt_asymmetric(ctx, pk, enc.encode(b), k[4])
    # whatever level the noise model picks, u32 must bit-match u64
    ref = np.asarray(evaluate.multiply_and_relin(ctx, ct1, ct2, rlk).data)
    p = bfv32.build_bfv_leveled32(ctx, rlk)
    out = np.asarray(bfv32.bfv_mult_relin_leveled32(
        p, _u32(ct1.data), _u32(ct2.data)))
    np.testing.assert_array_equal(out, ref.astype(np.uint32))
    # force a real drop so the scale-down Q->Ql + centered expand Ql->Q
    # path executes, on both representations (patch the noise model the
    # u64 evaluator consults); the outputs must still agree bit-for-bit.
    # (A dropped product is Delta_Ql-scaled — the reference likewise only
    # decrypts it after further ops account for noiseScaleDeg, so no
    # direct decrypt check here.)
    import phantom_tpu.host.noise as noise_mod
    monkeypatch.setattr(noise_mod, "find_levels_to_drop",
                        lambda *args, **kw: 1)
    ref1 = np.asarray(evaluate.multiply_and_relin(ctx, ct1, ct2, rlk).data)
    p1 = bfv32.build_bfv_leveled32(ctx, rlk, force_lvl=1)
    assert p1.lvl == 1
    out1 = np.asarray(bfv32.bfv_mult_relin_leveled32(
        p1, _u32(ct1.data), _u32(ct2.data)))
    np.testing.assert_array_equal(out1, ref1.astype(np.uint32))


# ---------------------------------------------------------------------------
# BGV
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def bgv_setup():
    qs = numth.get_primes(2 * N, 28, 4)
    ps = numth.get_primes(2 * N, 29, 2)
    t = PlainModulus.batching(N, 16).value
    params = EncryptionParameters.create(
        Scheme.BGV, N, qs + ps, plain_modulus=t, special_modulus_size=2)
    ctx = make_context(params)
    k = jax.random.split(jax.random.PRNGKey(11), 5)
    sk = keys.gen_secret_key(ctx, k[0])
    pk = keys.gen_public_key(ctx, sk, k[1])
    rlk = keys.gen_relin_key(ctx, sk, k[2])
    enc = BatchEncoder(ctx)
    rg = np.random.default_rng(5)
    a = rg.integers(0, t, N, dtype=np.uint64)
    b = rg.integers(0, t, N, dtype=np.uint64)
    ct1 = keys.encrypt_asymmetric(ctx, pk, enc.encode(a), k[3])
    ct2 = keys.encrypt_asymmetric(ctx, pk, enc.encode(b), k[4])
    return ctx, rlk, ct1, ct2


@pytest.mark.parametrize("use_pallas", [False, True, "mxu", "mxu-pallas"])
def test_bgv_mult_relin_modswitch_bit_match(bgv_setup, use_pallas):
    ctx, rlk, ct1, ct2 = bgv_setup
    ref_ct = evaluate.mod_switch_to_next(
        ctx, evaluate.multiply_and_relin(ctx, ct1, ct2, rlk))
    ref = np.asarray(ref_ct.data)
    p = bgv32.build_bgv32(ctx, rlk, use_pallas=use_pallas)
    out = np.asarray(bgv32.bgv_mult_relin_modswitch32(
        p, _u32(ct1.data), _u32(ct2.data)))
    np.testing.assert_array_equal(out, ref.astype(np.uint32))
    # the host-side correction factor the caller would track
    t = ctx.params.plain_modulus
    qlast = int(ctx.params.data_moduli[-1])
    f = (ct1.correction_factor * ct2.correction_factor
         * numth.invert_mod(qlast % t, t)) % t
    assert ref_ct.correction_factor == f


# ---------------------------------------------------------------------------
# rotations + hoisting (CKKS NTT form)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ckks_setup():
    qs = numth.get_primes(2 * N, 28, 4)
    ps = numth.get_primes(2 * N, 29, 2)
    params = EncryptionParameters.create(
        Scheme.CKKS, N, qs + ps, special_modulus_size=2)
    ctx = make_context(params)
    k = jax.random.split(jax.random.PRNGKey(13), 4)
    sk = keys.gen_secret_key(ctx, k[0])
    pk = keys.gen_public_key(ctx, sk, k[1])
    glk = keys.create_galois_keys(ctx, sk, k[2], steps=[1, -1, 2])
    enc = CKKSEncoder(ctx)
    z = np.random.default_rng(0).standard_normal(enc.slots)
    ct = keys.encrypt_asymmetric(ctx, pk, enc.encode(z, 2.0 ** 20), k[3])
    return ctx, glk, ct


@pytest.mark.parametrize("use_pallas", [False, "mxu-pallas"])
def test_bfv_rotate_coeff_bit_match(bfv_setup, use_pallas):
    ctx, rlk, ct1, ct2 = bfv_setup
    # bit-match comparison only: u32 and u64 run the same galois key over
    # the same data, so any key works
    sk_g = keys.gen_secret_key(ctx, jax.random.PRNGKey(7))
    glk = keys.create_galois_keys(ctx, sk_g, jax.random.PRNGKey(31),
                                  steps=[2])
    ref = np.asarray(evaluate.rotate_rows(ctx, ct1, 2, glk).data)
    ks = pp.build_keyswitch32(ctx, use_pallas=use_pallas)
    g = pp.build_galois32(ctx, glk)
    out = np.asarray(pp.rotate32(ks, g, _u32(ct1.data), 2,
                                 is_ntt_form=False))
    np.testing.assert_array_equal(out, ref.astype(np.uint32))


@pytest.mark.parametrize("use_pallas", [False, True, "mxu", "mxu-pallas"])
def test_rotate_bit_match(ckks_setup, use_pallas):
    ctx, glk, ct = ckks_setup
    ref = np.asarray(evaluate.rotate_vector(ctx, ct, 1, glk).data)
    ks = pp.build_keyswitch32(ctx, use_pallas=use_pallas)
    g = pp.build_galois32(ctx, glk)
    out = np.asarray(pp.rotate32(ks, g, _u32(ct.data), 1))
    np.testing.assert_array_equal(out, ref.astype(np.uint32))


@pytest.mark.parametrize("use_pallas", [False, True, "mxu", "mxu-pallas"])
def test_hoisting_bit_match(ckks_setup, use_pallas):
    ctx, glk, ct = ckks_setup
    steps = [1, -1, 2]
    ref = np.asarray(evaluate.hoisting(ctx, ct, glk, steps).data)
    ks = pp.build_keyswitch32(ctx, use_pallas=use_pallas)
    g = pp.build_galois32(ctx, glk)
    out = np.asarray(pp.hoisting_sum32(ks, g, _u32(ct.data), steps))
    np.testing.assert_array_equal(out, ref.astype(np.uint32))
