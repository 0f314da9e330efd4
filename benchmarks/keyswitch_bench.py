"""Hybrid keyswitch / modup latency (reference: benchmark/keyswitch_bench.cu
— CKKS N=2^15, 30 primes + special primes, swept dropped levels)."""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    # defaults = the reference bench config: CKKS N=2^15, 30 data primes,
    # alpha=15 special primes, swept dropped levels
    # (benchmark/keyswitch_bench.cu:25-34); scale down with flags on CPU
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=15)
    ap.add_argument("--limbs", type=int, default=30)
    ap.add_argument("--alpha", type=int, default=15)
    ap.add_argument("--trials", type=int, default=10)
    ap.add_argument("--sweep-step", type=int, default=1,
                    help="dropped-level stride (1 = every level, like the "
                         "reference's axis sweep)")
    ap.add_argument("--path", choices=["u64", "u32",
                                       "pallas-roll", "mxu", "mxu-pallas"],
                    default="u64",
                    help="u32/pallas: 28-bit primes + the uint32 "
                         "keyswitch engine")
    args = ap.parse_args()

    import os
    import jax
    if os.environ.get("PHANTOM_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["PHANTOM_PLATFORM"])
    jax.config.update("jax_enable_x64", True)
    import numpy as np

    from phantom_tpu.host import numth
    from phantom_tpu.schemes import (EncryptionParameters, Scheme, keys,
                                     keyswitch, make_context)
    from phantom_tpu.utils.timer import OpTimer, print_timer_banner

    n = 1 << args.logn
    # reference uses 50-bit data + 60-bit special primes (u64 path); the
    # u32 fast path uses 28/29-bit primes
    if args.path in ("u32", "pallas", "pallas-roll", "mxu", "mxu-pallas"):
        qs = numth.get_primes(2 * n, 28, args.limbs)
        ps = numth.get_primes(2 * n, 29, args.alpha)
    else:
        qs = numth.get_primes(2 * n, 50, args.limbs)
        ps = numth.get_primes(2 * n, 60, args.alpha)
    params = EncryptionParameters.create(
        Scheme.CKKS, n, qs + ps, special_modulus_size=args.alpha)
    ctx = make_context(params)
    rng = jax.random.PRNGKey(0)
    k_sk, k_rlk = jax.random.split(rng)
    sk = keys.gen_secret_key(ctx, k_sk)
    rlk = keys.gen_relin_key(ctx, sk, k_rlk)

    print_timer_banner()
    use_pallas = args.path if args.path != "u32" else False
    for drop in range(0, args.limbs - 1, max(1, args.sweep_step)):
        cd = ctx.get_context_data(1 + drop)
        k = cd.size_ql
        c2_np = np.stack([np.random.default_rng(1).integers(0, int(q), n)
                          for q in cd.moduli]).astype(np.uint64)

        if args.path in ("u32", "pallas", "pallas-roll", "mxu", "mxu-pallas"):
            from phantom_tpu.ops import pipeline32 as pp
            ks32 = pp.build_keyswitch32(ctx, 1 + drop, use_pallas)
            evk32 = pp.convert_key32(ctx, rlk.data, 1 + drop)
            c2 = jax.numpy.asarray(c2_np.astype(np.uint32))
            t = OpTimer(f"modup_L{k}", trials=args.trials)
            t.run(jax.jit(pp.modup32), ks32, c2)
            t.print_csv()
            t = OpTimer(f"keyswitch_L{k}", trials=args.trials)
            t.run(jax.jit(pp.keyswitch32), ks32, c2, evk32)
            t.print_csv()
            continue

        c2 = jax.numpy.asarray(c2_np)
        modup_fn = jax.jit(lambda c, x: keyswitch.modup(
            c, c.get_context_data(1 + drop), x))
        t = OpTimer(f"modup_L{k}", trials=args.trials)
        t.run(modup_fn, ctx, c2)
        t.print_csv()

        ks_fn = jax.jit(lambda c, x, r: keyswitch.keyswitch(
            c, c.get_context_data(1 + drop), x, r.data))
        t = OpTimer(f"keyswitch_L{k}", trials=args.trials)
        t.run(ks_fn, ctx, c2, rlk)
        t.print_csv()


if __name__ == "__main__":
    main()
