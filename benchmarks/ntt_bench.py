"""NTT throughput benchmark (reference: benchmark/ntt_bench.cu:39-43 —
dims 2^8..2^17, batches {1,10,100,1000}).

CSV: op,trials,median_us,mean_us plus a derived NTT/s column."""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", type=int, nargs="*",
                    default=[12, 13, 14, 15, 16])
    ap.add_argument("--batches", type=int, nargs="*", default=[1, 10, 100])
    ap.add_argument("--trials", type=int, default=20)
    ap.add_argument("--u32", action="store_true",
                    help="32-bit fast path (28-bit primes)")
    ap.add_argument("--pallas", action="store_true",
                    help="the pallas-roll butterfly engine (the reshape "
                         "variant was retired: Mosaic's u32/i32 "
                         "transpose+stack lowering crashes this "
                         "toolchain's compile helper)")
    ap.add_argument("--mxu", action="store_true",
                    help="four-step matmul NTT (ops/ntt_mxu.py)")
    ap.add_argument("--no-fold", action="store_true",
                    help="mxu: (carry,hi,lo) triple reduction instead of "
                         "the per-diagonal Shoup fold")
    ap.add_argument("--all", action="store_true",
                    help="compare every engine (u32, mxu, mxu-nofold, "
                         "pallas, pallas-roll) at each dim/batch")
    args = ap.parse_args()

    import os
    import jax
    if os.environ.get("PHANTOM_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["PHANTOM_PLATFORM"])
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from phantom_tpu.host import numth
    from phantom_tpu.host.modulus import Modulus
    from phantom_tpu.host.ntt_tables import make_rns_ntt_tables
    from phantom_tpu.ops import ntt as ntt64
    from phantom_tpu.ops import (ntt32, ntt_mxu,
                                 ntt_pallas_roll as ntr)
    if args.no_fold:
        ntt_mxu.FOLD_DIAGONALS = False
    from phantom_tpu.utils.timer import OpTimer, print_timer_banner

    print_timer_banner()
    rng = np.random.default_rng(0)
    fast = args.u32 or args.pallas or args.mxu or args.all
    for logn in args.dims:
        n = 1 << logn
        bits = 28 if fast else 50
        q = numth.get_primes(2 * n, bits, 1)[0]
        t64 = ntt64.tables_from_host(make_rns_ntt_tables(n, [Modulus(q)]))
        if fast:
            t32 = ntt32.tables32_from_tables64(t64)
            tm = ntt_mxu.prepare_mxu_tables(t32) if (args.mxu or args.all) \
                else None
            tr = ntr.prepare_roll_tables(t32) \
                if (args.pallas or args.all) else None

        def engines():
            if args.all:
                yield "u32", jnp.uint32, \
                    jax.jit(lambda v: ntt32.ntt_forward32(v, t32))
                yield "mxu", jnp.uint32, \
                    jax.jit(lambda v: ntt_mxu.ntt_forward_mxu(v, tm))

                def mxu_nofold(v):
                    ntt_mxu.FOLD_DIAGONALS = False
                    try:
                        return ntt_mxu.ntt_forward_mxu(v, tm)
                    finally:
                        ntt_mxu.FOLD_DIAGONALS = True
                yield "mxu-nofold", jnp.uint32, jax.jit(mxu_nofold)
                yield "pallas-roll", jnp.uint32, \
                    jax.jit(lambda v: ntr.ntt_forward_roll(v, tr))
                from phantom_tpu.ops import ntt_mxu_pallas as nmp
                tfk = ntt_mxu.prepare_mxu_tables(t32, fused_kernel=True)
                yield "mxu-pallas", jnp.uint32, \
                    jax.jit(lambda v: nmp.ntt_forward_mxu_pallas(v, tfk))
            elif args.mxu:
                yield "mxu", jnp.uint32, \
                    jax.jit(lambda v: ntt_mxu.ntt_forward_mxu(v, tm))
            elif args.pallas:
                yield "pallas-roll", jnp.uint32, \
                    jax.jit(lambda v: ntr.ntt_forward_roll(v, tr))
            elif args.u32:
                yield "u32", jnp.uint32, \
                    jax.jit(lambda v: ntt32.ntt_forward32(v, t32))
            else:
                yield "u64", jnp.uint64, \
                    jax.jit(lambda v: ntt64.ntt_forward(v, t64))

        for batch in args.batches:
            x = rng.integers(0, q, size=(batch, 1, n))
            for name, dt, fn in engines():
                xd = jnp.asarray(x.astype(np.uint32 if dt == jnp.uint32
                                          else np.uint64))
                t = OpTimer(f"fntt_{name}_n{n}_b{batch}",
                            trials=args.trials)
                try:
                    t.run(fn, xd)
                except Exception as e:
                    print(f"# {name} failed at n={n}: {e}"[:200],
                          file=sys.stderr)
                    continue
                t.print_csv()
                # effective bandwidth under the minimum-traffic model
                # (one read + one write of the transform data), the same
                # figure nvbench's DRAM-throughput column reports for the
                # reference kernels (ntt_bench.cu:83-86)
                word = 4 if dt == jnp.uint32 else 8
                gbs = 2 * batch * n * word / (t.median_us * 1e-6) / 1e9
                print(f"#   -> {batch / (t.median_us * 1e-6):.0f} NTT/s, "
                      f"{gbs:.1f} GB/s effective", file=sys.stderr)


if __name__ == "__main__":
    main()
