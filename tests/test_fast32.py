"""Fast32 (the user-facing u32 evaluator) bit-matches the u64 scheme layer
over multi-level chains: depth-2 CKKS mult/rescale + rotation at a dropped
level, and a BGV mult/modswitch/add chain with correction factors."""

import jax
import numpy as np
import pytest

from phantom_tpu import Fast32
from phantom_tpu.host import numth
from phantom_tpu.host.modulus import PlainModulus
from phantom_tpu.schemes import (BatchEncoder, CKKSEncoder,
                                 EncryptionParameters, Scheme, evaluate,
                                 keys, make_context)

N = 128


def test_ckks_depth2_chain_bit_match():
    qs = numth.get_primes(2 * N, 28, 5)
    ps = numth.get_primes(2 * N, 29, 2)
    params = EncryptionParameters.create(
        Scheme.CKKS, N, qs + ps, special_modulus_size=2)
    ctx = make_context(params)
    k = jax.random.split(jax.random.PRNGKey(41), 5)
    sk = keys.gen_secret_key(ctx, k[0])
    pk = keys.gen_public_key(ctx, sk, k[1])
    rlk = keys.gen_relin_key(ctx, sk, k[2])
    glk = keys.create_galois_keys(ctx, sk, k[3], steps=[1])
    enc = CKKSEncoder(ctx)
    z = np.random.default_rng(0).standard_normal(enc.slots)
    ct = keys.encrypt_asymmetric(ctx, pk, enc.encode(z, 2.0 ** 26), k[4])

    # u64 chain: square+relin+rescale twice, then rotate at level 3
    r64 = evaluate.rescale_to_next(
        ctx, evaluate.multiply_and_relin(ctx, ct, ct, rlk))
    r64 = evaluate.rescale_to_next(
        ctx, evaluate.multiply_and_relin(ctx, r64, r64, rlk))
    r64 = evaluate.rotate_vector(ctx, r64, 1, glk)

    ev = Fast32(ctx, rlk=rlk, glk=glk)
    c = ev.from_ciphertext(ct)
    c = ev.rescale_to_next(ev.multiply_and_relin(c, c))
    assert c.chain_index == 2
    c = ev.rescale_to_next(ev.multiply_and_relin(c, c))
    assert c.chain_index == 3
    c = ev.rotate(c, 1)
    np.testing.assert_array_equal(np.asarray(c.data),
                                  np.asarray(r64.data).astype(np.uint32))
    assert c.scale == r64.scale
    # and the converted-back ciphertext decrypts
    got = enc.decode(keys.decrypt(ctx, sk, ev.to_ciphertext(c)))
    np.testing.assert_allclose(got.real, np.roll(z ** 4, -1), atol=1e-2)


def test_bgv_chain_bit_match():
    qs = numth.get_primes(2 * N, 28, 4)
    ps = numth.get_primes(2 * N, 29, 1)
    t = PlainModulus.batching(N, 16).value
    params = EncryptionParameters.create(
        Scheme.BGV, N, qs + ps, plain_modulus=t, special_modulus_size=1)
    ctx = make_context(params)
    k = jax.random.split(jax.random.PRNGKey(43), 5)
    sk = keys.gen_secret_key(ctx, k[0])
    pk = keys.gen_public_key(ctx, sk, k[1])
    rlk = keys.gen_relin_key(ctx, sk, k[2])
    enc = BatchEncoder(ctx)
    rg = np.random.default_rng(6)
    a = rg.integers(0, t, N, dtype=np.uint64)
    b = rg.integers(0, t, N, dtype=np.uint64)
    ca = keys.encrypt_asymmetric(ctx, pk, enc.encode(a), k[3])
    cb = keys.encrypt_asymmetric(ctx, pk, enc.encode(b), k[4])

    # u64 chain: (a*b) mod-switched, then + (a*b at next level) -> balance
    A64 = evaluate.mod_switch_to_next(
        ctx, evaluate.multiply_and_relin(ctx, ca, cb, rlk))
    B64 = evaluate.multiply_and_relin(
        ctx, evaluate.mod_switch_to_next(ctx, ca),
        evaluate.mod_switch_to_next(ctx, cb), rlk)
    s64 = evaluate.add(ctx, A64, B64)

    ev = Fast32(ctx, rlk=rlk)
    fa, fb = ev.from_ciphertext(ca), ev.from_ciphertext(cb)
    A = ev.mod_switch_to_next(ev.multiply_and_relin(fa, fb))
    B = ev.multiply_and_relin(ev.mod_switch_to_next(fa),
                              ev.mod_switch_to_next(fb))
    assert A.correction_factor == A64.correction_factor
    assert B.correction_factor == B64.correction_factor
    s = ev.add(A, B)
    assert s.correction_factor == s64.correction_factor
    np.testing.assert_array_equal(np.asarray(s.data),
                                  np.asarray(s64.data).astype(np.uint32))
    got = enc.decode(keys.decrypt(ctx, sk, ev.to_ciphertext(s)))
    expect = (2 * a.astype(object) * b.astype(object)) % t
    np.testing.assert_array_equal(got.astype(object), expect)


@pytest.mark.parametrize("scheme", ["bfv", "ckks", "bgv"])
def test_encrypt_decrypt_u32_bit_match(scheme):
    """Fast32 encrypt produces the exact ciphertext bits of the u64 path
    (same threefry streams), and Fast32 decrypt recovers the plaintext."""
    sch = {"bfv": Scheme.BFV, "ckks": Scheme.CKKS, "bgv": Scheme.BGV}[scheme]
    qs = numth.get_primes(2 * N, 28, 3)
    ps = numth.get_primes(2 * N, 29, 1)
    extra = {}
    if sch != Scheme.CKKS:
        extra["plain_modulus"] = PlainModulus.batching(N, 16).value
    params = EncryptionParameters.create(
        sch, N, qs + ps, special_modulus_size=1, **extra)
    ctx = make_context(params)
    k = jax.random.split(jax.random.PRNGKey(61), 4)
    sk = keys.gen_secret_key(ctx, k[0])
    pk = keys.gen_public_key(ctx, sk, k[1])
    if sch == Scheme.CKKS:
        enc = CKKSEncoder(ctx)
        z = np.random.default_rng(2).standard_normal(enc.slots)
        pt = enc.encode(z, 2.0 ** 24)
    else:
        enc = BatchEncoder(ctx)
        t = ctx.params.plain_modulus
        vals = np.random.default_rng(2).integers(0, t, N, dtype=np.uint64)
        pt = enc.encode(vals)
    ref = keys.encrypt_asymmetric(ctx, pk, pt, k[2])
    ev = Fast32(ctx)
    c = ev.encrypt_asymmetric(pk, pt, k[2])
    np.testing.assert_array_equal(np.asarray(c.data),
                                  np.asarray(ref.data).astype(np.uint32))
    assert c.is_ntt_form == ref.is_ntt_form
    # u32 decrypt matches the u64 decrypt bit-for-bit and decodes
    m32_pt = ev.decrypt(sk, c)
    m64_pt = keys.decrypt(ctx, sk, ref)
    np.testing.assert_array_equal(np.asarray(m32_pt.data),
                                  np.asarray(m64_pt.data))
    if sch == Scheme.CKKS:
        got = enc.decode(m32_pt)
        np.testing.assert_allclose(got.real, z, atol=1e-3)
    else:
        np.testing.assert_array_equal(enc.decode(m32_pt), vals)


def test_hoisted_linear_combo_u32_bit_match():
    """Fast32's weighted-hoisting matvec primitive bit-matches the u64
    evaluate.hoisted_linear_combo."""
    from phantom_tpu.schemes import evaluate
    from phantom_tpu.schemes.ckks_encoder import encode_extended
    qs = numth.get_primes(2 * N, 28, 4)
    ps = numth.get_primes(2 * N, 29, 2)
    params = EncryptionParameters.create(
        Scheme.CKKS, N, qs + ps, special_modulus_size=2)
    ctx = make_context(params)
    k = jax.random.split(jax.random.PRNGKey(71), 5)
    sk = keys.gen_secret_key(ctx, k[0])
    pk = keys.gen_public_key(ctx, sk, k[1])
    glk = keys.create_galois_keys(ctx, sk, k[2], steps=[1, 2])
    enc = CKKSEncoder(ctx)
    scale = 2.0 ** 22
    rg = np.random.default_rng(3)
    z = rg.standard_normal(enc.slots)
    ct = keys.encrypt_asymmetric(ctx, pk, enc.encode(z, scale), k[3])
    steps = [0, 1, 2]
    weights = [rg.standard_normal(enc.slots) for _ in steps]
    pts_ext = [encode_extended(enc, w, scale, ct.chain_index)
               for w in weights]
    ref = evaluate.hoisted_linear_combo(ctx, ct, glk, steps, pts_ext, scale)

    ev = Fast32(ctx, glk=glk)
    c = ev.from_ciphertext(ct)
    out = ev.hoisted_linear_combo(c, steps, pts_ext, scale)
    np.testing.assert_array_equal(np.asarray(out.data),
                                  np.asarray(ref.data).astype(np.uint32))
    assert out.scale == ref.scale


@pytest.mark.parametrize("scheme", ["bfv", "bgv", "ckks"])
def test_plain_ops_and_modswitch_u32_bit_match(scheme):
    """Fast32 add_plain / multiply_plain / mod_switch bit-match the u64
    evaluator for every scheme."""
    from phantom_tpu.schemes import evaluate
    sch = {"bfv": Scheme.BFV, "ckks": Scheme.CKKS, "bgv": Scheme.BGV}[scheme]
    qs = numth.get_primes(2 * N, 28, 3)
    ps = numth.get_primes(2 * N, 29, 1)
    extra = {}
    if sch != Scheme.CKKS:
        extra["plain_modulus"] = PlainModulus.batching(N, 16).value
    params = EncryptionParameters.create(
        sch, N, qs + ps, special_modulus_size=1, **extra)
    ctx = make_context(params)
    k = jax.random.split(jax.random.PRNGKey(73), 4)
    sk = keys.gen_secret_key(ctx, k[0])
    pk = keys.gen_public_key(ctx, sk, k[1])
    if sch == Scheme.CKKS:
        enc = CKKSEncoder(ctx)
        rgn = np.random.default_rng(4)
        pt = enc.encode(rgn.standard_normal(enc.slots), 2.0 ** 24)
        pt2 = enc.encode(rgn.standard_normal(enc.slots), 2.0 ** 24)
    else:
        enc = BatchEncoder(ctx)
        t = ctx.params.plain_modulus
        rgn = np.random.default_rng(4)
        pt = enc.encode(rgn.integers(0, t, N, dtype=np.uint64))
        pt2 = enc.encode(rgn.integers(0, t, N, dtype=np.uint64))
    ct = keys.encrypt_asymmetric(ctx, pk, pt, k[2])
    ev = Fast32(ctx)
    c = ev.from_ciphertext(ct)

    ref_add = np.asarray(evaluate.add_plain(ctx, ct, pt2).data)
    np.testing.assert_array_equal(np.asarray(ev.add_plain(c, pt2).data),
                                  ref_add.astype(np.uint32))
    ref_mul = np.asarray(evaluate.multiply_plain(ctx, ct, pt2).data)
    np.testing.assert_array_equal(
        np.asarray(ev.multiply_plain(c, pt2).data),
        ref_mul.astype(np.uint32))
    ref_ms = evaluate.mod_switch_to_next(ctx, ct)
    out_ms = ev.mod_switch_to_next(c)
    np.testing.assert_array_equal(np.asarray(out_ms.data),
                                  np.asarray(ref_ms.data).astype(np.uint32))
    assert out_ms.correction_factor == ref_ms.correction_factor


@pytest.mark.parametrize("scheme", ["ckks", "bgv"])
def test_square_and_relin_u32_bit_match(scheme):
    from phantom_tpu.schemes import evaluate
    sch = {"ckks": Scheme.CKKS, "bgv": Scheme.BGV}[scheme]
    qs = numth.get_primes(2 * N, 28, 3)
    ps = numth.get_primes(2 * N, 29, 1)
    extra = {}
    if sch != Scheme.CKKS:
        extra["plain_modulus"] = PlainModulus.batching(N, 16).value
    params = EncryptionParameters.create(
        sch, N, qs + ps, special_modulus_size=1, **extra)
    ctx = make_context(params)
    k = jax.random.split(jax.random.PRNGKey(91), 4)
    sk = keys.gen_secret_key(ctx, k[0])
    pk = keys.gen_public_key(ctx, sk, k[1])
    rlk = keys.gen_relin_key(ctx, sk, k[2])
    if sch == Scheme.CKKS:
        enc = CKKSEncoder(ctx)
        pt = enc.encode(np.random.default_rng(5).standard_normal(enc.slots),
                        2.0 ** 24)
    else:
        enc = BatchEncoder(ctx)
        t = ctx.params.plain_modulus
        pt = enc.encode(np.random.default_rng(5).integers(
            0, t, N, dtype=np.uint64))
    ct = keys.encrypt_asymmetric(ctx, pk, pt, k[3])
    ref = evaluate.relinearize(ctx, evaluate.square(ctx, ct), rlk)
    ev = Fast32(ctx, rlk=rlk)
    out = ev.square_and_relin(ev.from_ciphertext(ct))
    np.testing.assert_array_equal(np.asarray(out.data),
                                  np.asarray(ref.data).astype(np.uint32))
    assert out.correction_factor == ref.correction_factor


@pytest.mark.parametrize("scheme", ["bfv", "ckks", "bgv"])
def test_multiply_then_relinearize_u32_bit_match(scheme):
    """Unfused multiply -> size-3 ct -> relinearize matches the u64 path."""
    from phantom_tpu.schemes import evaluate
    sch = {"bfv": Scheme.BFV, "ckks": Scheme.CKKS, "bgv": Scheme.BGV}[scheme]
    qs = numth.get_primes(2 * N, 28, 3)
    ps = numth.get_primes(2 * N, 29, 1)
    extra = {}
    if sch != Scheme.CKKS:
        extra["plain_modulus"] = PlainModulus.batching(N, 16).value
    params = EncryptionParameters.create(
        sch, N, qs + ps, special_modulus_size=1, **extra)
    ctx = make_context(params)
    k = jax.random.split(jax.random.PRNGKey(97), 4)
    sk = keys.gen_secret_key(ctx, k[0])
    pk = keys.gen_public_key(ctx, sk, k[1])
    rlk = keys.gen_relin_key(ctx, sk, k[2])
    if sch == Scheme.CKKS:
        enc = CKKSEncoder(ctx)
        pt = enc.encode(np.random.default_rng(6).standard_normal(enc.slots),
                        2.0 ** 24)
    else:
        enc = BatchEncoder(ctx)
        t = ctx.params.plain_modulus
        pt = enc.encode(np.random.default_rng(6).integers(
            0, t, N, dtype=np.uint64))
    ct = keys.encrypt_asymmetric(ctx, pk, pt, k[3])
    ref3 = evaluate.multiply(ctx, ct, ct)
    ref2 = evaluate.relinearize(ctx, ref3, rlk)
    ev = Fast32(ctx, rlk=rlk)
    c3 = ev.multiply(ev.from_ciphertext(ct), ev.from_ciphertext(ct))
    np.testing.assert_array_equal(np.asarray(c3.data),
                                  np.asarray(ref3.data).astype(np.uint32))
    c2 = ev.relinearize(c3)
    np.testing.assert_array_equal(np.asarray(c2.data),
                                  np.asarray(ref2.data).astype(np.uint32))


@pytest.mark.parametrize("scheme", ["ckks", "bgv"])
def test_keygen_u32_bit_match(scheme):
    """Fast32 keygen (u32 engine) produces the exact key bits of the u64
    path: same threefry draws, exact u32 transforms."""
    if scheme == "ckks":
        qs = numth.get_primes(2 * N, 28, 4)
        ps = numth.get_primes(2 * N, 29, 2)
        params = EncryptionParameters.create(
            Scheme.CKKS, N, qs + ps, special_modulus_size=2)
    else:
        qs = numth.get_primes(2 * N, 28, 4)
        ps = numth.get_primes(2 * N, 29, 2)
        params = EncryptionParameters.create(
            Scheme.BGV, N, qs + ps, special_modulus_size=2,
            plain_modulus=PlainModulus.batching(N, 17).value)
    ctx = make_context(params)
    k = jax.random.split(jax.random.PRNGKey(77), 4)
    ev = Fast32(ctx)

    sk64 = keys.gen_secret_key(ctx, k[0])
    sk32 = ev.gen_secret_key(k[0])
    np.testing.assert_array_equal(np.asarray(sk32.data),
                                  np.asarray(sk64.data))

    pk64 = keys.gen_public_key(ctx, sk64, k[1])
    pk32 = ev.gen_public_key(sk64, k[1])
    np.testing.assert_array_equal(np.asarray(pk32.data),
                                  np.asarray(pk64.data))

    rlk64 = keys.gen_relin_key(ctx, sk64, k[2])
    rlk32 = ev.gen_relin_key(sk64, k[2])
    np.testing.assert_array_equal(np.asarray(rlk32.data),
                                  np.asarray(rlk64.data))

    glk64 = keys.create_galois_keys(ctx, sk64, k[3], steps=[1, 2])
    glk32 = ev.create_galois_keys(sk64, k[3], steps=[1, 2])
    assert glk32.elts == glk64.elts
    np.testing.assert_array_equal(np.asarray(glk32.data),
                                  np.asarray(glk64.data))
