"""CKKS polynomial evaluation: a degree-7 sigmoid approximation down a
4-level chain with manual scale management.

The depth pattern mirrors the reference's leveled CKKS usage
(examples/3_ckks.cu rescale chain): binary powers x^2, x^4 by
ct-ct squaring, odd terms assembled with plain-multiplied coefficients,
every operand mod-switched and scale-forced to the common level before
the final sum.  Self-checks against numpy evaluating the SAME
polynomial (the approximation error vs the true sigmoid is not under
test; the homomorphic arithmetic is).
"""

import os

import jax

if os.environ.get("PHANTOM_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["PHANTOM_PLATFORM"])
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from phantom_tpu.host import numth  # noqa: E402
from phantom_tpu.schemes import (CKKSEncoder, EncryptionParameters,  # noqa: E402
                                 Scheme, evaluate, keys, make_context)

SCALE_BITS = 40


def fit_sigmoid_deg7():
    """Least-squares odd degree-7 fit of sigmoid(x) - 1/2 on [-4, 4]."""
    xs = np.linspace(-4.0, 4.0, 2001)
    ys = 1.0 / (1.0 + np.exp(-xs)) - 0.5
    basis = np.stack([xs, xs ** 3, xs ** 5, xs ** 7], axis=1)
    c, *_ = np.linalg.lstsq(basis, ys, rcond=None)
    return c  # (c1, c3, c5, c7)


def poly_eval_demo(n=4096):
    print(f"[poly] n={n} degree-7 sigmoid approx, depth-4 chain")
    qs = numth.get_primes(2 * n, 50, 1)
    rs = numth.get_primes(2 * n, SCALE_BITS, 4)
    sp = numth.get_primes(2 * n, 51, 1)
    params = EncryptionParameters.create(
        Scheme.CKKS, n, qs + rs + sp, special_modulus_size=1)
    ctx = make_context(params)
    k = jax.random.split(jax.random.PRNGKey(42), 4)
    sk = keys.gen_secret_key(ctx, k[0])
    pk = keys.gen_public_key(ctx, sk, k[1])
    rlk = keys.gen_relin_key(ctx, sk, k[2])
    enc = CKKSEncoder(ctx)
    scale = float(2.0 ** SCALE_BITS)

    rg = np.random.default_rng(3)
    x = rg.uniform(-4.0, 4.0, enc.slots)
    ct_x = keys.encrypt_asymmetric(ctx, pk, enc.encode(x, scale), k[3])
    c1, c3, c5, c7 = fit_sigmoid_deg7()

    def rescale_forced(ct):
        """Rescale and force the scale back to 2^SCALE_BITS (the rescale
        prime is only approximately 2^SCALE_BITS — standard CKKS manual
        scale management)."""
        return evaluate.rescale_to_next(ctx, ct).replace(scale=scale)

    def cmul(ct, coeff):
        """coeff * ct at ct's level, rescaled once."""
        pt = enc.encode(np.full(enc.slots, coeff), scale, ct.chain_index)
        return rescale_forced(evaluate.multiply_plain(ctx, ct, pt))

    def align(ct, target):
        """Mod-switch ct down to `target`'s level (scales already forced
        equal)."""
        if ct.chain_index != target.chain_index:
            ct = evaluate.mod_switch_to(ctx, ct, target.chain_index)
        return ct

    # binary powers: x2 at level 1, x4 at level 2
    x2 = rescale_forced(evaluate.multiply_and_relin(ctx, ct_x, ct_x, rlk))
    x4 = rescale_forced(evaluate.multiply_and_relin(ctx, x2, x2, rlk))

    # odd terms, all landing at level 3 with scale 2^SCALE_BITS
    t1 = cmul(ct_x, c1)                                        # level 1
    t3 = rescale_forced(
        evaluate.multiply_and_relin(ctx, align(cmul(ct_x, c3), x2), x2, rlk))
    t5 = rescale_forced(
        evaluate.multiply_and_relin(ctx, align(cmul(ct_x, c5), x4), x4, rlk))
    x3c7 = rescale_forced(
        evaluate.multiply_and_relin(ctx, align(cmul(ct_x, c7), x2), x2, rlk))
    t7 = rescale_forced(
        evaluate.multiply_and_relin(ctx, align(x3c7, x4), x4, rlk))

    acc = evaluate.add(ctx, evaluate.add(ctx, align(t1, t7), align(t3, t7)),
                       evaluate.add(ctx, align(t5, t7), t7))
    # + 1/2 (the even part of the sigmoid)
    half = enc.encode(np.full(enc.slots, 0.5), acc.scale, acc.chain_index)
    acc = evaluate.add_plain(ctx, acc, half)

    got = enc.decode(keys.decrypt(ctx, sk, acc)).real
    want = 0.5 + c1 * x + c3 * x ** 3 + c5 * x ** 5 + c7 * x ** 7
    err = float(np.max(np.abs(got - want)))
    assert err < 1e-2, f"poly eval mismatch (max err {err})"
    sig_err = float(np.max(np.abs(got - 1.0 / (1.0 + np.exp(-x)))))
    print(f"  homomorphic deg-7 eval: ok (arith err {err:.2e}, "
          f"sigmoid approx err {sig_err:.2e})")


if __name__ == "__main__":
    poly_eval_demo(1024)
    if os.environ.get("PHANTOM_FULL_SWEEP"):
        poly_eval_demo(4096)
    print("all poly-eval examples passed")
