"""Per-op latency suites for BFV/BGV/CKKS (reference: benchmark/
{bfv,bgv,ckks}_bench.cu — keygen/encode/encrypt/decrypt/add/mul(+relin)/
mul_plain/rotate/rescale, CSV median/mean)."""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scheme", choices=["bfv", "bgv", "ckks"],
                    default="ckks")
    ap.add_argument("--logn", type=int, default=13)
    ap.add_argument("--limbs", type=int, default=6)
    ap.add_argument("--trials", type=int, default=10)
    args = ap.parse_args()

    import os
    import jax
    if os.environ.get("PHANTOM_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["PHANTOM_PLATFORM"])
    jax.config.update("jax_enable_x64", True)
    import numpy as np

    from phantom_tpu.host import numth
    from phantom_tpu.host.modulus import CoeffModulus, PlainModulus
    from phantom_tpu.schemes import (BatchEncoder, CKKSEncoder,
                                     EncryptionParameters, Scheme, evaluate,
                                     keys, make_context)
    from phantom_tpu.utils.timer import OpTimer, print_timer_banner

    n = 1 << args.logn
    scheme = {"bfv": Scheme.BFV, "bgv": Scheme.BGV,
              "ckks": Scheme.CKKS}[args.scheme]
    if scheme == Scheme.CKKS:
        qs = numth.get_primes(2 * n, 40, args.limbs + 1)
        params = EncryptionParameters.create(
            Scheme.CKKS, n, qs, special_modulus_size=1)
    else:
        coeff = [m.value for m in CoeffModulus.create(
            n, [40] * (args.limbs + 1))]
        t_plain = PlainModulus.batching(n, 20).value
        params = EncryptionParameters.create(
            scheme, n, coeff, plain_modulus=t_plain, special_modulus_size=1)
    ctx = make_context(params)
    rng = jax.random.PRNGKey(0)
    k_sk, k_pk, k_rlk, k_glk = jax.random.split(rng, 4)
    sk = keys.gen_secret_key(ctx, k_sk)
    pk = keys.gen_public_key(ctx, sk, k_pk)
    rlk = keys.gen_relin_key(ctx, sk, k_rlk)
    glk = keys.create_galois_keys(ctx, sk, k_glk, steps=[1])

    print_timer_banner()
    if scheme == Scheme.CKKS:
        enc = CKKSEncoder(ctx)
        z = np.random.default_rng(0).standard_normal(enc.slots)
        pt = enc.encode(z, 2.0 ** 35)
    else:
        enc = BatchEncoder(ctx)
        vals = np.arange(n, dtype=np.uint64) % params.plain_modulus
        pt = enc.encode(vals)
    ct1 = keys.encrypt_asymmetric(ctx, pk, pt, jax.random.PRNGKey(1))
    ct2 = keys.encrypt_asymmetric(ctx, pk, pt, jax.random.PRNGKey(2))

    def bench(name, fn, *fargs):
        t = OpTimer(name, trials=args.trials)
        t.run(jax.jit(fn), *fargs)
        t.print_csv()

    bench("encrypt", lambda c, p, d: keys.encrypt_asymmetric(
        c, p, pt, jax.random.PRNGKey(3)).data, ctx, pk, pt.data)
    bench("decrypt", lambda c, s, d: keys.decrypt(
        c, s, ct1.replace(data=d)).data, ctx, sk, ct1.data)
    bench("add", lambda c, a, b: evaluate.add(
        c, ct1.replace(data=a), ct2.replace(data=b)).data,
        ctx, ct1.data, ct2.data)
    bench("multiply_relin", lambda c, r, a, b: evaluate.multiply_and_relin(
        c, ct1.replace(data=a), ct2.replace(data=b), r).data,
        ctx, rlk, ct1.data, ct2.data)
    bench("multiply_plain", lambda c, a: evaluate.multiply_plain(
        c, ct1.replace(data=a), pt).data, ctx, ct1.data)
    bench("rotate", lambda c, g, a: evaluate.rotate(
        c, ct1.replace(data=a), 1, g).data, ctx, glk, ct1.data)
    if scheme == Scheme.CKKS:
        prod = evaluate.multiply_and_relin(ctx, ct1, ct2, rlk)
        bench("rescale", lambda c, a: evaluate.rescale_to_next(
            c, prod.replace(data=a)).data, ctx, prod.data)


if __name__ == "__main__":
    main()
