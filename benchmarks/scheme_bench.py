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
    ap.add_argument("--path", choices=["u64", "u32", "pallas-roll", "mxu"],
                    default="u64",
                    help="u32/pallas-roll/mxu: evaluator verbs through "
                         "the Fast32 fast path (<2^30 primes)")
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
    bits = 28 if args.path != "u64" else 40
    if scheme == Scheme.CKKS:
        qs = numth.get_primes(2 * n, bits, args.limbs + 1)
        params = EncryptionParameters.create(
            Scheme.CKKS, n, qs, special_modulus_size=1)
    else:
        if args.path in ("u32", "pallas-roll", "mxu"):
            coeff = numth.get_primes(2 * n, bits, args.limbs + 1)
        else:
            coeff = [m.value for m in CoeffModulus.create(
                n, [bits] * (args.limbs + 1))]
        t_plain = PlainModulus.batching(n, 16).value
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
        pt = enc.encode(z, 2.0 ** (bits - 6))
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

    def bench_host(name, fn, *fargs):
        # un-jitted: for ops with a host component (keygen precompute,
        # encoder oracle paths) — matches the reference timing scope,
        # which includes the host side of these verbs (ckks_bench.cu)
        t = OpTimer(name, trials=max(3, args.trials // 2))
        t.run(fn, *fargs)
        t.print_csv()

    bench_host("keygen_secret", lambda: keys.gen_secret_key(
        ctx, jax.random.PRNGKey(11)).data)
    bench_host("keygen_public", lambda: keys.gen_public_key(
        ctx, sk, jax.random.PRNGKey(12)).data)
    bench_host("keygen_relin", lambda: keys.gen_relin_key(
        ctx, sk, jax.random.PRNGKey(13)).data)
    if scheme == Scheme.CKKS:
        bench_host("encode", lambda: enc.encode(z, 2.0 ** (bits - 6)).data)
        bench_host("decode", lambda: enc.decode(pt))
    else:
        bench_host("encode", lambda: enc.encode(vals).data)
        bench_host("decode", lambda: enc.decode(pt))

    bench("encrypt", lambda c, p, d: keys.encrypt_asymmetric(
        c, p, pt, jax.random.PRNGKey(3)).data, ctx, pk, pt.data)
    bench("decrypt", lambda c, s, d: keys.decrypt(
        c, s, ct1.replace(data=d)).data, ctx, sk, ct1.data)

    if args.path in ("u32", "pallas-roll", "mxu"):
        # evaluator verbs through the u32 fast path: pipelines are built
        # eagerly and ride through jit as ARGUMENTS (never captured — see
        # CLAUDE.md invariants)
        import jax.numpy as jnp
        from phantom_tpu.ops import bfv32, bgv32
        from phantom_tpu.ops import modmath32 as m32
        from phantom_tpu.ops import pipeline32 as pp
        use_pallas = args.path if args.path != "u32" else False
        ks = pp.build_keyswitch32(ctx, 1, use_pallas,
                                  for_bgv=(scheme == Scheme.BGV))
        evk = pp.convert_key32(ctx, rlk.data, 1)
        g32 = pp.build_galois32(ctx, glk, 1)
        is_ntt = scheme != Scheme.BFV
        d1 = jnp.asarray(np.asarray(ct1.data).astype(np.uint32))
        d2 = jnp.asarray(np.asarray(ct2.data).astype(np.uint32))

        bench("add",
              lambda k_, a, b: m32.add_mod32(a, b, k_.mv_ql.q[:, None]),
              ks, d1, d2)

        if scheme == Scheme.CKKS:
            def mr(k_, e_, a, b):
                t0, t1, t2 = pp._tensor_2x2(k_.mv_ql, a, b)
                s0, s1 = pp.inner_product32(
                    k_, pp.modup_from_ntt32(k_, t2), e_)
                q = k_.mv_ql.q[:, None]
                return jnp.stack(
                    [m32.add_mod32(t0, pp.moddown32(k_, s0), q),
                     m32.add_mod32(t1, pp.moddown32(k_, s1), q)])
            bench("multiply_relin", mr, ks, evk, d1, d2)
        elif scheme == Scheme.BFV:
            pipe = bfv32.build_bfv32(ctx, rlk, 1, use_pallas)
            bench("multiply_relin", bfv32.bfv_mult_relin32, pipe, d1, d2)
        else:
            pipe = bgv32.build_bgv32(ctx, rlk, 1, use_pallas)
            bench("multiply_relin", bgv32.bgv_mult_relin32, pipe, d1, d2)

        bench("rotate", lambda k_, g_, a: pp.rotate32(
            k_, g_, a, 1, is_ntt_form=is_ntt), ks, g32, d1)

        from phantom_tpu.fast32 import Fast32
        ev32 = Fast32(ctx, use_pallas=use_pallas)
        c32 = ev32.from_ciphertext(ct1)
        bench_host("multiply_plain",
                   lambda: ev32.multiply_plain(c32, pt).data)

        if scheme == Scheme.CKKS:
            cpipe = pp.build_pipeline32(ctx, rlk, 1, use_pallas)
            bench("multiply_relin_rescale", pp.mult_relin_rescale32,
                  cpipe, d1, d2)
        return

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
