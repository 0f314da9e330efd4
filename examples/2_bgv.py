"""BGV examples: enc/dec, add/mul with modulus switching and correction
factors (reference: examples/2_bgv.cu:93-434)."""

import os

import jax

if os.environ.get("PHANTOM_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PHANTOM_PLATFORM"])
jax.config.update("jax_enable_x64", True)
import numpy as np

from phantom_tpu.host.modulus import CoeffModulus, PlainModulus
from phantom_tpu.schemes import (BatchEncoder, EncryptionParameters, Scheme,
                                 evaluate, keys, make_context)


def bgv_demo(n=4096):
    print(f"[BGV] n={n}")
    coeff = [m.value for m in CoeffModulus.create(n, [40, 40, 40, 40])]
    t = PlainModulus.batching(n, 20).value
    params = EncryptionParameters.create(
        Scheme.BGV, n, coeff, plain_modulus=t, special_modulus_size=1)
    ctx = make_context(params)
    rng = jax.random.PRNGKey(0)
    k_sk, k_pk, k_rlk = jax.random.split(rng, 3)
    sk = keys.gen_secret_key(ctx, k_sk)
    pk = keys.gen_public_key(ctx, sk, k_pk)
    rlk = keys.gen_relin_key(ctx, sk, k_rlk)
    enc = BatchEncoder(ctx)

    rg = np.random.default_rng(0)
    a = rg.integers(0, t, n, dtype=np.uint64)
    b = rg.integers(0, t, n, dtype=np.uint64)
    ct_a = keys.encrypt_asymmetric(ctx, pk, enc.encode(a), jax.random.PRNGKey(1))
    ct_b = keys.encrypt_asymmetric(ctx, pk, enc.encode(b), jax.random.PRNGKey(2))

    ct = evaluate.multiply_and_relin(ctx, ct_a, ct_b, rlk)
    ct = evaluate.mod_switch_to_next(ctx, ct)
    got = enc.decode(keys.decrypt(ctx, sk, ct)).astype(object)
    assert (got == (a.astype(object) * b.astype(object)) % t).all()
    print("  mul+relin+modswitch: ok (correction factor",
          ct.correction_factor, ")")


if __name__ == "__main__":
    bgv_demo(1024)
    print("all BGV examples passed")
