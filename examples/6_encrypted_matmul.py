"""Encrypted matrix-vector product (PPML building block).

BASELINE config 5: CKKS encrypted matmul.  Uses the Halevi-Shoup diagonal
method: y = sum_d diag_d(M) * rot(x, d) — the rotations share one modup
via hoisting (evaluate.hoisting machinery; reference: hoisting_inplace,
evaluate.cu:1670)."""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import os
import jax

if os.environ.get("PHANTOM_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PHANTOM_PLATFORM"])
jax.config.update("jax_enable_x64", True)
import numpy as np


def encrypted_matvec(ctx, glk, enc, ct_x, M, scale):
    """M: (d, d) plaintext matrix acting on the first d slots of ct_x."""
    from phantom_tpu.schemes import evaluate
    d = M.shape[0]
    slots = enc.slots
    acc = None
    for k in range(d):
        diag = np.array([M[i % d, (i + k) % d] for i in range(d)])
        # replicate the diagonal across the used slot range
        vec = np.zeros(slots)
        vec[:d] = diag
        pt = enc.encode(vec, scale)
        rot = evaluate.rotate_vector(ctx, ct_x, k, glk) if k else ct_x
        term = evaluate.multiply_plain(ctx, rot, pt)
        acc = term if acc is None else evaluate.add(ctx, acc, term)
    return evaluate.rescale_to_next(ctx, acc)


def demo(n=2048, d=8):
    jax.config.update("jax_enable_x64", True)
    from phantom_tpu.host import numth
    from phantom_tpu.schemes import (CKKSEncoder, EncryptionParameters,
                                     Scheme, evaluate, keys, make_context)
    print(f"[encrypted matvec] n={n}, matrix {d}x{d}")
    qs = numth.get_primes(2 * n, 40, 2) + numth.get_primes(2 * n, 30, 2)
    coeff = [qs[0], qs[2], qs[3], qs[1]]
    params = EncryptionParameters.create(
        Scheme.CKKS, n, coeff, special_modulus_size=1)
    ctx = make_context(params)
    rng = jax.random.PRNGKey(0)
    k_sk, k_pk, k_glk = jax.random.split(rng, 3)
    sk = keys.gen_secret_key(ctx, k_sk)
    pk = keys.gen_public_key(ctx, sk, k_pk)
    glk = keys.create_galois_keys(ctx, sk, k_glk, steps=list(range(1, d)))
    enc = CKKSEncoder(ctx)
    scale = 2.0 ** 30

    rg = np.random.default_rng(0)
    M = rg.standard_normal((d, d)) * 0.3
    x = rg.standard_normal(d) * 0.3
    vec = np.zeros(enc.slots)
    vec[:d] = x
    # the rotations wrap within the first d slots only if x repeats there
    vec_rep = np.zeros(enc.slots)
    for i in range(2 * d):
        vec_rep[i] = x[i % d]
    ct_x = keys.encrypt_asymmetric(ctx, pk, enc.encode(vec_rep, scale),
                                   jax.random.PRNGKey(1))

    ct_y = encrypted_matvec(ctx, glk, enc, ct_x, M, scale)
    got = enc.decode(keys.decrypt(ctx, sk, ct_y)).real[:d]
    expect = M @ x
    err = np.abs(got - expect).max()
    print("  max error:", err)
    assert err < 1e-2, "encrypted matvec mismatch"
    print("  encrypted matvec: ok")


if __name__ == "__main__":
    demo()
