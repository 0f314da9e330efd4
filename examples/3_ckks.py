"""CKKS examples: encode/encrypt/eval pipeline incl. rescale and rotation
(reference: examples/3_ckks.cu:28-763 incl. the small-N case)."""

import os

import jax

if os.environ.get("PHANTOM_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PHANTOM_PLATFORM"])
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from phantom_tpu.host import numth  # noqa: E402
from phantom_tpu.schemes import (CKKSEncoder, EncryptionParameters,  # noqa: E402
                                 Scheme, evaluate, keys, make_context)


def ckks_demo(n=4096, scale_bits=30):
    print(f"[CKKS] n={n}")
    qs = numth.get_primes(2 * n, 40, 2) + numth.get_primes(2 * n, scale_bits, 2)
    coeff = [qs[0], qs[2], qs[3], qs[1]]  # 40 | 30 30 | 40(special)
    params = EncryptionParameters.create(
        Scheme.CKKS, n, coeff, special_modulus_size=1)
    ctx = make_context(params)
    rng = jax.random.PRNGKey(0)
    k_sk, k_pk, k_rlk, k_glk = jax.random.split(rng, 4)
    sk = keys.gen_secret_key(ctx, k_sk)
    pk = keys.gen_public_key(ctx, sk, k_pk)
    rlk = keys.gen_relin_key(ctx, sk, k_rlk)
    glk = keys.create_galois_keys(ctx, sk, k_glk)
    enc = CKKSEncoder(ctx)
    scale = 2.0 ** scale_bits

    rg = np.random.default_rng(0)
    x = rg.standard_normal(enc.slots)
    y = rg.standard_normal(enc.slots)
    ct_x = keys.encrypt_asymmetric(ctx, pk, enc.encode(x, scale),
                                   jax.random.PRNGKey(1))
    ct_y = keys.encrypt_asymmetric(ctx, pk, enc.encode(y, scale),
                                   jax.random.PRNGKey(2))

    ct = evaluate.rescale_to_next(
        ctx, evaluate.multiply_and_relin(ctx, ct_x, ct_y, rlk))
    got = enc.decode(keys.decrypt(ctx, sk, ct))
    assert np.allclose(got.real, x * y, atol=1e-2), "multiply mismatch"
    print("  mul+relin+rescale: ok (max err",
          float(np.max(np.abs(got.real - x * y))), ")")

    ct_rot = evaluate.rotate_vector(ctx, ct_x, 1, glk)
    got = enc.decode(keys.decrypt(ctx, sk, ct_rot))
    assert np.allclose(got.real, np.roll(x, -1), atol=1e-3)
    print("  rotate_vector(1): ok")


def ckks_small_param_demo():
    """The N=2048 small-parameter case (reference: 3_ckks.cu:612): a
    single-level chain — encode/encrypt/add/decrypt only, no rescale."""
    n = 2048
    print(f"[CKKS] small-param n={n}")
    qs = numth.get_primes(2 * n, 40, 2)
    params = EncryptionParameters.create(
        Scheme.CKKS, n, qs, special_modulus_size=1)
    ctx = make_context(params)
    k = jax.random.split(jax.random.PRNGKey(5), 3)
    sk = keys.gen_secret_key(ctx, k[0])
    pk = keys.gen_public_key(ctx, sk, k[1])
    enc = CKKSEncoder(ctx)
    scale = 2.0 ** 30
    x = np.random.default_rng(7).standard_normal(enc.slots)
    ct = keys.encrypt_asymmetric(ctx, pk, enc.encode(x, scale), k[2])
    ct2 = evaluate.add(ctx, ct, ct)
    got = enc.decode(keys.decrypt(ctx, sk, ct2))
    assert np.allclose(got.real, 2 * x, atol=1e-4), "small-param add"
    print("  enc/add/dec at n=2048: ok")


if __name__ == "__main__":
    ckks_demo(1024)
    ckks_small_param_demo()
    if os.environ.get("PHANTOM_FULL_SWEEP"):
        ckks_demo(4096)
        ckks_demo(8192)
    print("all CKKS examples passed")
