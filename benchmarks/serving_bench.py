"""Serving-throughput benchmark: StreamExecutor vs one-at-a-time verbs.

Measures sustained CKKS mult+relin+rescale throughput for a stream of
ciphertext pairs under (a) direct per-item jitted calls (the reference's
serving model — one launch sequence per request, benchmark/ckks_bench.cu)
and (b) the batched StreamExecutor at several batch sizes.  On an
accelerator the batched path amortizes the evk/twiddle HBM streams across
the batch (docs/PERF_MODEL.md §2.3).

CSV: mode,batch,items,items_per_s
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logn", type=int, default=11)
    ap.add_argument("--limbs", type=int, default=4)
    ap.add_argument("--alpha", type=int, default=2)
    ap.add_argument("--items", type=int, default=32)
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 4, 8])
    ap.add_argument("--path", default="u32",
                    choices=["u32", "pallas", "pallas-roll", "mxu"])
    args = ap.parse_args()

    import os
    import jax
    if os.environ.get("PHANTOM_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["PHANTOM_PLATFORM"])
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from phantom_tpu.host import numth
    from phantom_tpu.ops import pipeline32 as pp
    from phantom_tpu.runtime import StreamExecutor
    from phantom_tpu.schemes import (CKKSEncoder, EncryptionParameters,
                                     Scheme, keys, make_context)

    n = 1 << args.logn
    qs = numth.get_primes(2 * n, 28, args.limbs + 1)
    ps = numth.get_primes(2 * n, 29, args.alpha)
    params = EncryptionParameters.create(
        Scheme.CKKS, n, qs + ps, special_modulus_size=args.alpha)
    ctx = make_context(params)
    rng = jax.random.PRNGKey(0)
    k_sk, k_pk, k_rlk, k1, k2 = jax.random.split(rng, 5)
    sk = keys.gen_secret_key(ctx, k_sk)
    pk = keys.gen_public_key(ctx, sk, k_pk)
    rlk = keys.gen_relin_key(ctx, sk, k_rlk)
    enc = CKKSEncoder(ctx)
    z = np.random.default_rng(0).standard_normal(enc.slots)
    pt = enc.encode(z, 2.0 ** 22)
    d1 = jnp.asarray(np.asarray(
        keys.encrypt_asymmetric(ctx, pk, pt, k1).data).astype(np.uint32))
    d2 = jnp.asarray(np.asarray(
        keys.encrypt_asymmetric(ctx, pk, pt, k2).data).astype(np.uint32))
    use_pallas = "mxu" if args.path == "mxu" else (
        args.path if args.path != "u32" else False)
    pipe = pp.build_pipeline32(ctx, rlk, use_pallas=use_pallas)
    pairs = [(d1, d2)] * args.items

    print("mode,batch,items,items_per_s")

    # direct: one jitted call per item
    step = jax.jit(pp.mult_relin_rescale32)
    out = step(pipe, d1, d2)
    out.block_until_ready()  # compile
    t0 = time.time()
    for a, b in pairs:
        out = step(pipe, a, b)
    out.block_until_ready()
    dt = time.time() - t0
    print(f"direct,1,{args.items},{args.items / dt:.2f}")

    for b in args.batches:
        ex = StreamExecutor(pp.mult_relin_rescale32, pipe, batch=b)
        ex.map(pairs[:b])  # compile the batch-B executable
        t0 = time.time()
        outs = ex.map(pairs)
        for leaf in jax.tree_util.tree_leaves(outs[-1]):
            leaf.block_until_ready()
        dt = time.time() - t0
        print(f"executor,{b},{args.items},{args.items / dt:.2f}")


if __name__ == "__main__":
    main()
