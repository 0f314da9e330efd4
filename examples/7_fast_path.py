"""The uint32 fast path end-to-end: Fast32 runs every verb at device
speed, bit-identical to the generic evaluator.

Demonstrates the intended production flow: build the context once, wrap
it in Fast32, and run encrypt -> (multiply+relin -> rescale)^2 ->
rotate -> hoisted matvec -> decrypt without ever leaving uint32
residues.  Self-checks against exact expectations (raises on mismatch,
like the reference examples)."""

import os

import jax

if os.environ.get("PHANTOM_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PHANTOM_PLATFORM"])
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from phantom_tpu import Fast32  # noqa: E402
from phantom_tpu.host import numth  # noqa: E402
from phantom_tpu.schemes import (CKKSEncoder, EncryptionParameters,  # noqa: E402
                                 Scheme, keys, make_context)
from phantom_tpu.schemes.ckks_encoder import encode_extended  # noqa: E402


def fast_path_demo(n=2048, scale_bits=27):
    print(f"[Fast32] CKKS n={n}, uint32 residues")
    qs = numth.get_primes(2 * n, 28, 5)
    ps = numth.get_primes(2 * n, 29, 2)
    params = EncryptionParameters.create(
        Scheme.CKKS, n, qs + ps, special_modulus_size=2)
    ctx = make_context(params)
    k = jax.random.split(jax.random.PRNGKey(0), 5)
    sk = keys.gen_secret_key(ctx, k[0])
    pk = keys.gen_public_key(ctx, sk, k[1])
    rlk = keys.gen_relin_key(ctx, sk, k[2])
    glk = keys.create_galois_keys(ctx, sk, k[3], steps=[1, 2])
    enc = CKKSEncoder(ctx)
    scale = 2.0 ** scale_bits

    ev = Fast32(ctx, rlk=rlk, glk=glk)
    rg = np.random.default_rng(0)
    x = rg.standard_normal(enc.slots) * 0.5

    # encrypt on the fast path (bit-identical to the u64 encryptor)
    c = ev.encrypt_asymmetric(pk, enc.encode(x, scale), k[4])

    # depth-2 chain: ((x^2)^2)
    c = ev.rescale_to_next(ev.multiply_and_relin(c, c))
    c = ev.rescale_to_next(ev.multiply_and_relin(c, c))
    got = enc.decode(ev.decrypt(sk, c))
    assert np.allclose(got.real, x ** 4, atol=3e-2), "depth-2 chain"
    print("  depth-2 square chain: ok (max err",
          float(np.max(np.abs(got.real - x ** 4))), ")")

    # rotation at the dropped level
    r = ev.rotate(c, 1)
    got = enc.decode(ev.decrypt(sk, r))
    assert np.allclose(got.real, np.roll(x ** 4, -1), atol=3e-2)
    print("  rotate at level 3: ok")

    # hoisted weighted rotation sum (the matvec primitive)
    c1 = ev.encrypt_asymmetric(pk, enc.encode(x, scale),
                               jax.random.PRNGKey(9))
    steps = [0, 1, 2]
    ws = [rg.standard_normal(enc.slots) * 0.5 for _ in steps]
    pts = [encode_extended(enc, w, scale, c1.chain_index) for w in ws]
    m = ev.hoisted_linear_combo(c1, steps, pts, scale)
    m = ev.rescale_to_next(m)
    got = enc.decode(ev.decrypt(sk, m))
    expect = sum(w * np.roll(x, -s) for w, s in zip(ws, steps))
    assert np.allclose(got.real, expect, atol=1e-2), "hoisted combo"
    print("  hoisted weighted rotation sum: ok")


if __name__ == "__main__":
    fast_path_demo()
    print("all fast-path examples passed")
