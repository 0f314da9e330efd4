"""u32 fast-path pipeline (mult+relin+rescale) bit-matches the u64
evaluator, in both the XLA-stage and Pallas-kernel NTT variants."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from phantom_tpu.host import numth
from phantom_tpu.ops import pipeline32 as pp
from phantom_tpu.schemes import (CKKSEncoder, EncryptionParameters, Scheme,
                                 evaluate, keys, make_context)


@pytest.fixture(scope="module")
def setup():
    n = 128
    qs = numth.get_primes(2 * n, 28, 4)
    ps = numth.get_primes(2 * n, 29, 2)
    params = EncryptionParameters.create(
        Scheme.CKKS, n, qs + ps, special_modulus_size=2)
    ctx = make_context(params)
    rng = jax.random.PRNGKey(0)
    k_sk, k_pk, k_rlk, k1, k2 = jax.random.split(rng, 5)
    sk = keys.gen_secret_key(ctx, k_sk)
    pk = keys.gen_public_key(ctx, sk, k_pk)
    rlk = keys.gen_relin_key(ctx, sk, k_rlk)
    enc = CKKSEncoder(ctx)
    z = np.random.default_rng(0).standard_normal(enc.slots)
    pt = enc.encode(z, 2.0 ** 20)
    ct1 = keys.encrypt_asymmetric(ctx, pk, pt, k1)
    ct2 = keys.encrypt_asymmetric(ctx, pk, pt, k2)
    ref = np.asarray(evaluate.rescale_to_next(
        ctx, evaluate.multiply_and_relin(ctx, ct1, ct2, rlk)).data)
    return ctx, rlk, ct1, ct2, ref


@pytest.mark.parametrize("use_pallas", [False, True, "pallas-roll", "mxu",
                                        "mxu-pallas"])
def test_bit_match(setup, use_pallas):
    ctx, rlk, ct1, ct2, ref = setup
    p = pp.build_pipeline32(ctx, rlk, use_pallas=use_pallas)
    d1 = jnp.asarray(np.asarray(ct1.data).astype(np.uint32))
    d2 = jnp.asarray(np.asarray(ct2.data).astype(np.uint32))
    out = np.asarray(pp.mult_relin_rescale32(p, d1, d2))
    np.testing.assert_array_equal(out, ref.astype(np.uint32))


def test_bit_match_mega_kernel_fallback(setup, monkeypatch):
    """With the modup+IP mega-kernel gated off (MODUP_IP_MAX_Y_BYTES=0,
    i.e. what a large-L config hits), the blocked mxu-pallas pipeline must
    take the split modup + inner_product32 fallback and still bit-match —
    regression for the blocked-t_up vs flat/blocked-evk layout mix
    (ADVICE r3: pipeline32.py fallback)."""
    from phantom_tpu.ops import ntt_mxu_pallas as nmp
    ctx, rlk, ct1, ct2, ref = setup
    monkeypatch.setattr(nmp, "MODUP_IP_MAX_Y_BYTES", 0)
    p = pp.build_pipeline32(ctx, rlk, use_pallas="mxu-pallas")
    d1 = jnp.asarray(np.asarray(ct1.data).astype(np.uint32))
    d2 = jnp.asarray(np.asarray(ct2.data).astype(np.uint32))
    out = np.asarray(pp.mult_relin_rescale32(p, d1, d2))
    np.testing.assert_array_equal(out, ref.astype(np.uint32))


def test_bit_match_mega_kernel_fallback_bfv(monkeypatch):
    """Same gate-off regression on the BFV side, whose _blocked_step blocks
    only the ciphertexts (evk stays flat) — the layout-mix direction the
    CKKS test above cannot reach."""
    from phantom_tpu.host.modulus import PlainModulus
    from phantom_tpu.ops import bfv32
    from phantom_tpu.ops import ntt_mxu_pallas as nmp
    from phantom_tpu.schemes import BatchEncoder
    n = 128
    qs = numth.get_primes(2 * n, 28, 4)
    ps = numth.get_primes(2 * n, 29, 2)
    params = EncryptionParameters.create(
        Scheme.BFV, n, qs + ps, special_modulus_size=2,
        plain_modulus=PlainModulus.batching(n, 17).value)
    ctx = make_context(params)
    rng = jax.random.PRNGKey(7)
    k_sk, k_pk, k_rlk, k1, k2 = jax.random.split(rng, 5)
    sk = keys.gen_secret_key(ctx, k_sk)
    pk = keys.gen_public_key(ctx, sk, k_pk)
    rlk = keys.gen_relin_key(ctx, sk, k_rlk)
    enc = BatchEncoder(ctx)
    vals = np.random.default_rng(1).integers(
        0, ctx.params.plain_modulus, n, dtype=np.uint64)
    pt = enc.encode(vals)
    ct1 = keys.encrypt_asymmetric(ctx, pk, pt, k1)
    ct2 = keys.encrypt_asymmetric(ctx, pk, pt, k2)
    ref = np.asarray(evaluate.multiply_and_relin(ctx, ct1, ct2, rlk).data)
    monkeypatch.setattr(nmp, "MODUP_IP_MAX_Y_BYTES", 0)
    p = bfv32.build_bfv32(ctx, rlk, use_pallas="mxu-pallas")
    d1 = jnp.asarray(np.asarray(ct1.data).astype(np.uint32))
    d2 = jnp.asarray(np.asarray(ct2.data).astype(np.uint32))
    out = np.asarray(bfv32.bfv_mult_relin32(p, d1, d2))
    np.testing.assert_array_equal(out, ref.astype(np.uint32))


def test_bit_match_mxu_bconv_fold(setup):
    """Full pipeline with the MXU bconv matmul (per-diagonal fold) forced
    on — the accelerator configuration — still bit-matches u64."""
    from phantom_tpu.ops import bconv32 as bc32
    ctx, rlk, ct1, ct2, ref = setup
    p = pp.build_pipeline32(ctx, rlk, use_pallas="mxu")
    d1 = jnp.asarray(np.asarray(ct1.data).astype(np.uint32))
    d2 = jnp.asarray(np.asarray(ct2.data).astype(np.uint32))
    old = (bc32.USE_MXU_MATMUL32, bc32.FOLD_DIAGONALS32)
    try:
        for fold in (True, False):
            bc32.USE_MXU_MATMUL32 = True
            bc32.FOLD_DIAGONALS32 = fold
            out = np.asarray(pp.mult_relin_rescale32(p, d1, d2))
            np.testing.assert_array_equal(out, ref.astype(np.uint32))
    finally:
        bc32.USE_MXU_MATMUL32, bc32.FOLD_DIAGONALS32 = old


@pytest.fixture(scope="module")
def setup_uneven():
    """k % alpha != 0 (short last digit) — the capability-config shape
    (L=43 alpha=22 has beta=2 with a 21-row second digit)."""
    n = 128
    qs = numth.get_primes(2 * n, 28, 5)
    ps = numth.get_primes(2 * n, 29, 2)
    params = EncryptionParameters.create(
        Scheme.CKKS, n, qs + ps, special_modulus_size=2)
    ctx = make_context(params)
    rng = jax.random.PRNGKey(3)
    k_sk, k_pk, k_rlk, k1, k2 = jax.random.split(rng, 5)
    sk = keys.gen_secret_key(ctx, k_sk)
    pk = keys.gen_public_key(ctx, sk, k_pk)
    rlk = keys.gen_relin_key(ctx, sk, k_rlk)
    enc = CKKSEncoder(ctx)
    z = np.random.default_rng(1).standard_normal(enc.slots)
    pt = enc.encode(z, 2.0 ** 20)
    ct1 = keys.encrypt_asymmetric(ctx, pk, pt, k1)
    ct2 = keys.encrypt_asymmetric(ctx, pk, pt, k2)
    ref = np.asarray(evaluate.rescale_to_next(
        ctx, evaluate.multiply_and_relin(ctx, ct1, ct2, rlk)).data)
    return ctx, rlk, ct1, ct2, ref


@pytest.mark.parametrize("use_pallas", ["mxu-pallas", "mxu", False])
def test_bit_match_uneven_digits(setup_uneven, use_pallas):
    """The fused digit machinery (mega-kernel, bconv-prologue NTT, padded
    digit grid) must bit-match the u64 evaluator when the last digit is
    short — regression for the L=43/alpha=22 capability config, which
    silently fell back to the unfused XLA path before round 5."""
    ctx, rlk, ct1, ct2, ref = setup_uneven
    p = pp.build_pipeline32(ctx, rlk, use_pallas=use_pallas)
    if use_pallas == "mxu-pallas":
        assert p.ks.modup_mats is not None, \
            "uneven chain must still build the fused modup mats"
    d1 = jnp.asarray(np.asarray(ct1.data).astype(np.uint32))
    d2 = jnp.asarray(np.asarray(ct2.data).astype(np.uint32))
    out = np.asarray(pp.mult_relin_rescale32(p, d1, d2))
    np.testing.assert_array_equal(out, ref.astype(np.uint32))


def test_rotate_uneven_digits(setup_uneven):
    """NTT-domain rotation (modup_from_ntt32 + keyswitch) on the padded
    digit grid bit-matches the u64 evaluator."""
    ctx, rlk, ct1, ct2, ref = setup_uneven
    sk = keys.gen_secret_key(ctx, jax.random.split(
        jax.random.PRNGKey(3), 5)[0])
    glk = keys.create_galois_keys(ctx, sk, jax.random.PRNGKey(12),
                                  steps=[1])
    ref_rot = np.asarray(evaluate.rotate(ctx, ct1, 1, glk).data)
    ks = pp.build_keyswitch32(ctx, 1, use_pallas="mxu-pallas")
    g = pp.build_galois32(ctx, glk)
    d1 = jnp.asarray(np.asarray(ct1.data).astype(np.uint32))
    out = np.asarray(pp.rotate32(ks, g, d1, 1))
    np.testing.assert_array_equal(out, ref_rot.astype(np.uint32))


@pytest.mark.parametrize("variant", ["xla", "xla-split"])
@pytest.mark.parametrize("fixture", ["setup", "setup_uneven"])
def test_bit_match_xla_bconv_variant(request, fixture, variant, monkeypatch):
    """The xla-bconv structure (MXU matmul base conversions + compl-only
    modup transforms + fused-epilogue fNTT moddown with in-kernel tensor
    adds) bit-matches the u64 evaluator on even and uneven chains."""
    ctx, rlk, ct1, ct2, ref = request.getfixturevalue(fixture)
    monkeypatch.setattr(pp, "MODUP_VARIANT", variant)
    monkeypatch.setattr(pp, "MODDOWN_VARIANT", "xla")
    p = pp.build_pipeline32(ctx, rlk, use_pallas="mxu-pallas")
    assert p.ks.t_qlp_compl is not None
    d1 = jnp.asarray(np.asarray(ct1.data).astype(np.uint32))
    d2 = jnp.asarray(np.asarray(ct2.data).astype(np.uint32))
    out = np.asarray(pp.mult_relin_rescale32(p, d1, d2))
    np.testing.assert_array_equal(out, ref.astype(np.uint32))


def test_rotate_xla_bconv_variant(setup_uneven, monkeypatch):
    """Rotation through the xla-bconv modup (modup_from_ntt32 routing)."""
    ctx, rlk, ct1, ct2, ref = setup_uneven
    monkeypatch.setattr(pp, "MODUP_VARIANT", "xla")
    monkeypatch.setattr(pp, "MODDOWN_VARIANT", "xla")
    sk = keys.gen_secret_key(ctx, jax.random.split(
        jax.random.PRNGKey(3), 5)[0])
    glk = keys.create_galois_keys(ctx, sk, jax.random.PRNGKey(12),
                                  steps=[1])
    ref_rot = np.asarray(evaluate.rotate(ctx, ct1, 1, glk).data)
    ks = pp.build_keyswitch32(ctx, 1, use_pallas="mxu-pallas")
    g = pp.build_galois32(ctx, glk)
    d1 = jnp.asarray(np.asarray(ct1.data).astype(np.uint32))
    out = np.asarray(pp.rotate32(ks, g, d1, 1))
    np.testing.assert_array_equal(out, ref_rot.astype(np.uint32))


def test_bit_match_merged_epilogue(setup_uneven, monkeypatch):
    """The single-NTT-per-row merged moddown+rescale kernel (off by
    default after losing its hardware A/B, kept selectable) stays
    bit-identical to the composed pair."""
    monkeypatch.setenv("PHANTOM_MERGED_EPILOGUE", "1")
    ctx, rlk, ct1, ct2, ref = setup_uneven
    p = pp.build_pipeline32(ctx, rlk, use_pallas="mxu-pallas")
    d1 = jnp.asarray(np.asarray(ct1.data).astype(np.uint32))
    d2 = jnp.asarray(np.asarray(ct2.data).astype(np.uint32))
    out = np.asarray(pp.mult_relin_rescale32(p, d1, d2))
    np.testing.assert_array_equal(out, ref.astype(np.uint32))


def test_bfv_fused_lift_bit_match(monkeypatch):
    """The fused lift+fNTT kernel (off by default after its hardware A/B;
    PHANTOM_BFV_LIFT=kernel) bit-matches the u64 BFV HPS multiply."""
    from phantom_tpu.host.modulus import PlainModulus
    from phantom_tpu.ops import bfv32
    from phantom_tpu.schemes import BatchEncoder
    monkeypatch.setenv("PHANTOM_BFV_LIFT", "kernel")
    n = 128
    qs = numth.get_primes(2 * n, 28, 4)
    ps = numth.get_primes(2 * n, 29, 2)
    params = EncryptionParameters.create(
        Scheme.BFV, n, qs + ps, special_modulus_size=2,
        plain_modulus=PlainModulus.batching(n, 17).value)
    ctx = make_context(params)
    k = jax.random.split(jax.random.PRNGKey(5), 5)
    sk = keys.gen_secret_key(ctx, k[0])
    pk = keys.gen_public_key(ctx, sk, k[1])
    rlk = keys.gen_relin_key(ctx, sk, k[2])
    enc = BatchEncoder(ctx)
    vals = np.random.default_rng(2).integers(
        0, ctx.params.plain_modulus, n, dtype=np.uint64)
    pt = enc.encode(vals)
    ct1 = keys.encrypt_asymmetric(ctx, pk, pt, k[3])
    ct2 = keys.encrypt_asymmetric(ctx, pk, pt, k[4])
    ref = np.asarray(evaluate.multiply_and_relin(ctx, ct1, ct2, rlk).data)
    p = bfv32.build_bfv32(ctx, rlk, use_pallas="mxu-pallas")
    d1 = jnp.asarray(np.asarray(ct1.data).astype(np.uint32))
    d2 = jnp.asarray(np.asarray(ct2.data).astype(np.uint32))
    out = np.asarray(bfv32.bfv_mult_relin32(p, d1, d2))
    np.testing.assert_array_equal(out, ref.astype(np.uint32))


def test_bit_match_moddown_mxu_bconv(setup_uneven, monkeypatch):
    """The R-rows-per-program moddown whose base conversion runs as
    in-kernel MXU digit-plane dots (PHANTOM_MODDOWN_R) bit-matches the
    u64 evaluator, including the k % R != 0 padded tail."""
    monkeypatch.setenv("PHANTOM_MODDOWN_R", "2")
    ctx, rlk, ct1, ct2, ref = setup_uneven
    p = pp.build_pipeline32(ctx, rlk, use_pallas="mxu-pallas")
    d1 = jnp.asarray(np.asarray(ct1.data).astype(np.uint32))
    d2 = jnp.asarray(np.asarray(ct2.data).astype(np.uint32))
    out = np.asarray(pp.mult_relin_rescale32(p, d1, d2))
    np.testing.assert_array_equal(out, ref.astype(np.uint32))
