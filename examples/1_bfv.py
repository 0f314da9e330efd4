"""BFV examples: enc/dec sweep, multiply (+relin) under every technique,
rotation, noise budget (reference: examples/1_bfv.cu scenarios incl. the
enc/dec degree sweep at 1_bfv.cu:478-523 and the randomized
mul-correctness sweep at 1_bfv.cu:1422)."""

import os

import jax

if os.environ.get("PHANTOM_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PHANTOM_PLATFORM"])
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from phantom_tpu.host.modulus import CoeffModulus, PlainModulus  # noqa: E402
from phantom_tpu.schemes import (BatchEncoder, EncryptionParameters,  # noqa: E402
                                 MulTech, Scheme, evaluate, keys,
                                 make_context)


def bfv_demo(n=4096, mul_tech=MulTech.HPS):
    print(f"[BFV] n={n}, mul_tech={mul_tech.name}")
    coeff = [m.value for m in CoeffModulus.create(n, [40, 40, 40, 40])]
    t = PlainModulus.batching(n, 20).value
    params = EncryptionParameters.create(
        Scheme.BFV, n, coeff, plain_modulus=t, special_modulus_size=1,
        mul_tech=mul_tech)
    ctx = make_context(params)
    rng = jax.random.PRNGKey(0)
    k_sk, k_pk, k_rlk, k_glk = jax.random.split(rng, 4)
    sk = keys.gen_secret_key(ctx, k_sk)
    pk = keys.gen_public_key(ctx, sk, k_pk)
    rlk = keys.gen_relin_key(ctx, sk, k_rlk)
    glk = keys.create_galois_keys(ctx, sk, k_glk)
    enc = BatchEncoder(ctx)

    # enc/dec roundtrip
    vals = np.arange(n, dtype=np.uint64) % t
    ct = keys.encrypt_asymmetric(ctx, pk, enc.encode(vals),
                                 jax.random.PRNGKey(1))
    assert (enc.decode(keys.decrypt(ctx, sk, ct)) == vals).all()
    print("  enc/dec roundtrip: ok  (noise budget:",
          keys.invariant_noise_budget(ctx, sk, ct), "bits)")

    # slot i -> i^2 via multiply+relin (reference golden vector)
    ct_sq = evaluate.multiply_and_relin(ctx, ct, ct, rlk)
    got = enc.decode(keys.decrypt(ctx, sk, ct_sq)).astype(object)
    expect = (vals.astype(object) ** 2) % t
    assert (got == expect).all(), "multiply mismatch"
    print("  multiply+relin (slot i -> i^2): ok")

    # rotation
    ct_rot = evaluate.rotate_rows(ctx, ct, 3, glk)
    got = enc.decode(keys.decrypt(ctx, sk, ct_rot))
    expect = np.roll(vals.reshape(2, n // 2), -3, axis=1).ravel()
    assert (got == expect).all()
    print("  rotate_rows(3): ok")


def bfv_encdec_sweep(ns=(4096, 8192, 16384, 32768)):
    """Encrypt/decrypt across polynomial degrees (reference: the
    bfv_example sweep over N=4096..32768, 1_bfv.cu:478-523): catches
    table-generation bugs that only appear at large N."""
    for n in ns:
        coeff = [m.value for m in CoeffModulus.create(n, [40, 40, 40])]
        t = PlainModulus.batching(n, 20).value
        params = EncryptionParameters.create(
            Scheme.BFV, n, coeff, plain_modulus=t, special_modulus_size=1)
        ctx = make_context(params)
        k = jax.random.split(jax.random.PRNGKey(n), 3)
        sk = keys.gen_secret_key(ctx, k[0])
        pk = keys.gen_public_key(ctx, sk, k[1])
        enc = BatchEncoder(ctx)
        vals = np.random.default_rng(n).integers(0, t, n, dtype=np.uint64)
        ct = keys.encrypt_asymmetric(ctx, pk, enc.encode(vals), k[2])
        assert (enc.decode(keys.decrypt(ctx, sk, ct)) == vals).all(), n
        print(f"  enc/dec at n={n}: ok (noise budget:",
              keys.invariant_noise_budget(ctx, sk, ct), "bits)")


def bfv_mul_sweep(n=1024, rounds=5):
    """Randomized multiply-correctness sweep (reference: the random
    mul loop at 1_bfv.cu:1422): fresh random operands each round,
    exact host arithmetic as the oracle."""
    coeff = [m.value for m in CoeffModulus.create(n, [40, 40, 40, 40])]
    t = PlainModulus.batching(n, 20).value
    params = EncryptionParameters.create(
        Scheme.BFV, n, coeff, plain_modulus=t, special_modulus_size=1)
    ctx = make_context(params)
    k = jax.random.split(jax.random.PRNGKey(77), 3)
    sk = keys.gen_secret_key(ctx, k[0])
    pk = keys.gen_public_key(ctx, sk, k[1])
    rlk = keys.gen_relin_key(ctx, sk, k[2])
    enc = BatchEncoder(ctx)
    rg = np.random.default_rng(123)
    for r in range(rounds):
        a = rg.integers(0, t, n, dtype=np.uint64)
        b = rg.integers(0, t, n, dtype=np.uint64)
        ca = keys.encrypt_asymmetric(ctx, pk, enc.encode(a),
                                     jax.random.PRNGKey(1000 + r))
        cb = keys.encrypt_asymmetric(ctx, pk, enc.encode(b),
                                     jax.random.PRNGKey(2000 + r))
        got = enc.decode(keys.decrypt(
            ctx, sk, evaluate.multiply_and_relin(ctx, ca, cb, rlk)))
        expect = (a.astype(object) * b.astype(object)) % t
        assert (got.astype(object) == expect).all(), f"round {r} mismatch"
    print(f"  randomized mul sweep ({rounds} rounds at n={n}): ok")


if __name__ == "__main__":
    for mt in (MulTech.HPS, MulTech.BEHZ, MulTech.HPS_OVERQ,
               MulTech.HPS_OVERQ_LEVELED):
        bfv_demo(1024, mt)
    bfv_mul_sweep()
    full = bool(os.environ.get("PHANTOM_FULL_SWEEP"))
    bfv_encdec_sweep((4096, 8192, 16384, 32768) if full else (4096, 8192))
    print("all BFV examples passed")
