"""Encrypted MLP inference: LinearTransform layers down the chain.

A two-layer neural network  y = W2 @ (W1 @ x)^2  evaluated entirely
under CKKS: each layer is a `LinearTransform` (Halevi-Shoup diagonals
with BSGS rotation scheduling, one shared modup per layer), the square
activation is one relinearized multiply (CryptoNets-style).  The whole
network runs twice — on the u64 evaluator and on the Fast32 u32 path —
and the two results must be bit-identical; both self-check against numpy.

Composes the building blocks the reference exposes raw (hoisting,
/root/reference/src/evaluate.cu:1670-1865 + multiply_plain) into the
standard PPML serving layer.
"""

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

if os.environ.get("PHANTOM_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PHANTOM_PLATFORM"])
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from phantom_tpu import Fast32  # noqa: E402
from phantom_tpu.host import numth  # noqa: E402
from phantom_tpu.schemes import (CKKSEncoder, EncryptionParameters,  # noqa: E402
                                 LinearTransform, Scheme, evaluate, keys,
                                 make_context)

SCALE = 2.0 ** 26


def mlp_demo(n=1024, d=16):
    print(f"[mlp] n={n}: {d}->{d}->{d} network, square activation")
    # 3 multiplicative levels (layer1, square, layer2): q0 q1 q2 q3 | p
    qs = numth.get_primes(2 * n, 28, 5)   # < 2^30: Fast32-compatible
    params = EncryptionParameters.create(
        Scheme.CKKS, n, qs, special_modulus_size=1)
    ctx = make_context(params)
    k = jax.random.split(jax.random.PRNGKey(23), 5)
    sk = keys.gen_secret_key(ctx, k[0])
    pk = keys.gen_public_key(ctx, sk, k[1])
    rlk = keys.gen_relin_key(ctx, sk, k[2])
    enc = CKKSEncoder(ctx)

    rg = np.random.default_rng(7)
    W1 = rg.standard_normal((d, d)) * 0.3
    W2 = rg.standard_normal((d, d)) * 0.3
    W2[rg.random((d, d)) < 0.3] = 0.0     # sparse head: diagonals skipped
    x = rg.standard_normal(d) * 0.5

    lt1 = LinearTransform(W1)
    lt2 = LinearTransform(W2)
    steps = sorted(set(lt1.steps_required()) | set(lt2.steps_required()))
    glk = keys.create_galois_keys(ctx, sk, k[3], steps=steps)
    # layer 1 consumes level 1; the square consumes level 2; layer 2
    # therefore runs at chain_index 3
    lt1.prepare(enc, SCALE, chain_index=1)
    lt2.prepare(enc, SCALE, chain_index=3)

    ct = keys.encrypt_asymmetric(ctx, pk, lt1.encode_input(enc, x, SCALE),
                                 k[4])

    # ---- u64 evaluator path ----
    h = lt1.apply(ctx, ct, glk)
    h = evaluate.rescale_to_next(
        ctx, evaluate.multiply_and_relin(ctx, h, h, rlk))
    y64 = lt2.apply(ctx, h, glk)

    want = W2 @ (W1 @ x) ** 2
    got = enc.decode(keys.decrypt(ctx, sk, y64)).real[:d]
    err = float(np.max(np.abs(got - want)))
    assert err < 1e-2, f"u64 MLP output mismatch (max err {err})"
    print(f"  u64 path: ok (max err {err:.2e}; "
          f"{len(steps)} galois keys for {2 * d} diagonals)")

    # ---- Fast32 u32 path, bit-identical ----
    ev = Fast32(ctx, rlk=rlk, glk=glk)
    h32 = lt1.apply_fast32(ev, ev.from_ciphertext(ct))
    h32 = ev.rescale_to_next(ev.square_and_relin(h32))
    y32 = lt2.apply_fast32(ev, h32)
    assert np.array_equal(np.asarray(y64.data),
                          np.asarray(ev.to_ciphertext(y32).data)), \
        "Fast32 MLP output differs from u64"
    assert y32.scale == y64.scale
    print("  fast32 path: bit-identical to u64")


if __name__ == "__main__":
    mlp_demo(1024)
    if os.environ.get("PHANTOM_FULL_SWEEP"):
        mlp_demo(4096, d=32)
    print("all mlp-inference examples passed")
