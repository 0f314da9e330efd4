"""Encrypted logistic-regression inference: the composite PPML workload.

Batched scores sigmoid(w . x_j + b) computed entirely under CKKS:
SIMD-packed samples, a plaintext-weight dot product via the blocked
rotate-and-sum reduction (galois keys), and the degree-3 sigmoid
polynomial down the rescale chain (manual scale management, as in
examples/8_poly_eval.py).  Composes the framework's building blocks the
way a real privacy-preserving inference service would; self-checks the
homomorphic result against numpy evaluating the same pipeline.
"""

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

if os.environ.get("PHANTOM_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PHANTOM_PLATFORM"])
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from phantom_tpu.host import numth  # noqa: E402
from phantom_tpu.schemes import (CKKSEncoder, EncryptionParameters,  # noqa: E402
                                 Scheme, evaluate, keys, make_context)

# degree-3 odd sigmoid approximation on [-4, 4] (classic PPML choice)
C1, C3 = 0.197, -0.004
SCALE_BITS = 30


def logistic_demo(n=2048, d=8, samples=32):
    print(f"[logistic] n={n}: {samples} samples x {d} features")
    qs = numth.get_primes(2 * n, 40, 2)
    rs = numth.get_primes(2 * n, SCALE_BITS, 4)
    params = EncryptionParameters.create(
        Scheme.CKKS, n, qs[:1] + rs + qs[1:], special_modulus_size=1)
    ctx = make_context(params)
    k = jax.random.split(jax.random.PRNGKey(17), 5)
    sk = keys.gen_secret_key(ctx, k[0])
    pk = keys.gen_public_key(ctx, sk, k[1])
    rlk = keys.gen_relin_key(ctx, sk, k[2])
    steps = [d >> (i + 1) for i in range(d.bit_length() - 1)]  # d/2, ..., 1
    glk = keys.create_galois_keys(ctx, sk, k[3], steps=steps)
    enc = CKKSEncoder(ctx)
    scale = float(2.0 ** SCALE_BITS)

    rg = np.random.default_rng(5)
    X = rg.standard_normal((samples, d))
    w = rg.standard_normal(d) * 0.5
    b = 0.3

    packed = np.zeros(enc.slots)
    packed[:samples * d] = X.ravel()
    wrep = np.zeros(enc.slots)
    wrep[:samples * d] = np.tile(w, samples)
    ct = keys.encrypt_asymmetric(ctx, pk, enc.encode(packed, scale), k[4])

    def rescale_forced(c):
        return evaluate.rescale_to_next(ctx, c).replace(scale=scale)

    def cpt(value, ci):
        vec = np.full(enc.slots, value)
        return enc.encode(vec, scale, ci)

    # z_j = w . x_j + b, landing in slot j*d of every block
    z = rescale_forced(evaluate.multiply_plain(
        ctx, ct, enc.encode(wrep, scale)))
    for s in steps:
        z = evaluate.add(ctx, z, evaluate.rotate_vector(ctx, z, s, glk))
    bias = enc.encode(np.full(enc.slots, b), z.scale, z.chain_index)
    z = evaluate.add_plain(ctx, z, bias)

    # sigmoid(z) ~ 0.5 + C1 z + C3 z^3 down the chain
    z2 = rescale_forced(evaluate.multiply_and_relin(ctx, z, z, rlk))
    c3z = rescale_forced(evaluate.multiply_plain(ctx, z, cpt(C3, z.chain_index)))
    t3 = rescale_forced(evaluate.multiply_and_relin(ctx, c3z, z2, rlk))
    c1z = rescale_forced(evaluate.multiply_plain(ctx, z, cpt(C1, z.chain_index)))
    c1z = evaluate.mod_switch_to(ctx, c1z, t3.chain_index)
    acc = evaluate.add(ctx, t3, c1z)
    acc = evaluate.add_plain(ctx, acc,
                             enc.encode(np.full(enc.slots, 0.5), acc.scale,
                                        acc.chain_index))

    got = enc.decode(keys.decrypt(ctx, sk, acc)).real
    scores = got[np.arange(samples) * d]
    zs = X @ w + b
    want = 0.5 + C1 * zs + C3 * zs ** 3
    err = float(np.max(np.abs(scores - want)))
    assert err < 1e-2, f"logistic scores mismatch (max err {err})"
    acc_match = np.mean((scores > 0.5) == (1 / (1 + np.exp(-zs)) > 0.5))
    print(f"  encrypted scores: ok (max err {err:.2e}; "
          f"decision agreement with true sigmoid {acc_match:.0%})")


if __name__ == "__main__":
    logistic_demo(1024)
    if os.environ.get("PHANTOM_FULL_SWEEP"):
        logistic_demo(4096, d=16, samples=64)
    print("all logistic-inference examples passed")
