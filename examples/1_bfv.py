"""BFV examples: enc/dec sweep, multiply (+relin) under every technique,
rotation, noise budget (reference: examples/1_bfv.cu scenarios incl. the
mul-correctness sweep at 1_bfv.cu:1269,1422)."""

import jax
import numpy as np

from phantom_tpu.host.modulus import CoeffModulus, PlainModulus
from phantom_tpu.schemes import (BatchEncoder, EncryptionParameters, MulTech,
                                 Scheme, evaluate, keys, make_context)


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


if __name__ == "__main__":
    for mt in (MulTech.HPS, MulTech.BEHZ, MulTech.HPS_OVERQ,
               MulTech.HPS_OVERQ_LEVELED):
        bfv_demo(1024, mt)
    print("all BFV examples passed")
