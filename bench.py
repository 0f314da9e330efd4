"""Headline benchmark: CKKS homomorphic multiply+relinearize+rescale ops/s.

Mirrors the reference's ckks_bench multiply_and_relin + rescale workload
(benchmark/ckks_bench.cu:9-397) at the BASELINE north-star config
(n=65536, <=30-limb chain) on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "ops/s", "vs_baseline": N}

vs_baseline compares against an A100 estimate for the reference at this
config (~300 mult+relin+rescale ops/s, from the Phantom paper's reported
multiply+relin latency of a few ms at N=2^16 with a ~30-limb chain); the
north-star target is >= 2x that per chip, i.e. vs_baseline >= 2.0.
"""

import argparse
import json
import sys
import time

import numpy as np

A100_BASELINE_OPS = 300.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--limbs", type=int, default=28, help="data primes")
    ap.add_argument("--alpha", type=int, default=4, help="special primes")
    ap.add_argument("--trials", type=int, default=10)
    ap.add_argument("--batch", type=int, default=1,
                    help="ciphertext pairs per step (vmapped); ops/s "
                         "scales accordingly")
    ap.add_argument("--path", choices=["u32", "pallas", "u64"],
                    default="u32",
                    help="u32: 28-bit primes + uint32 fast pipeline "
                         "(default); pallas: + fused NTT kernels; "
                         "u64: generic evaluator")
    ap.add_argument("--csv", action="store_true",
                    help="also print per-op CSV (op,trials,median,mean)")
    args = ap.parse_args()

    import os
    import jax
    if os.environ.get("PHANTOM_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["PHANTOM_PLATFORM"])
    jax.config.update("jax_enable_x64", True)
    # persistent compilation cache: repeated bench runs skip the big compile
    jax.config.update("jax_compilation_cache_dir", "/tmp/phantom_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from phantom_tpu.host import numth
    from phantom_tpu.schemes import (CKKSEncoder, EncryptionParameters,
                                     Scheme, evaluate, keys, make_context)

    n = args.n
    t0 = time.time()
    bits = 28 if args.path in ("u32", "pallas") else 50
    qs = numth.get_primes(2 * n, bits, args.limbs + 1)
    ps = numth.get_primes(2 * n, bits + 1, args.alpha)
    coeff = [qs[0]] + qs[1:args.limbs] + ps  # q0 + rest + special
    params = EncryptionParameters.create(
        Scheme.CKKS, n, coeff, special_modulus_size=args.alpha)
    ctx = make_context(params)
    print(f"# context built in {time.time()-t0:.1f}s "
          f"(n={n}, L={args.limbs}, alpha={args.alpha})", file=sys.stderr)

    rng = jax.random.PRNGKey(0)
    k_sk, k_pk, k_rlk, k1, k2 = jax.random.split(rng, 5)
    t0 = time.time()
    # jitted keygen: one dispatch per key instead of eager op-by-op
    sk = jax.jit(keys.gen_secret_key)(ctx, k_sk)
    pk = jax.jit(keys.gen_public_key)(ctx, sk, k_pk)
    rlk = jax.jit(keys.gen_relin_key)(ctx, sk, k_rlk)
    enc = CKKSEncoder(ctx)
    scale = 2.0 ** (bits - 6)
    z = np.random.default_rng(0).standard_normal(enc.slots)
    pt = enc.encode(z, scale)
    enc_jit = jax.jit(keys.encrypt_asymmetric)
    ct1 = enc_jit(ctx, pk, pt, k1)
    ct2 = enc_jit(ctx, pk, pt, k2)
    print(f"# keys+encrypt in {time.time()-t0:.1f}s", file=sys.stderr)

    if args.path in ("u32", "pallas"):
        from phantom_tpu.ops import pipeline32 as pp
        pipe = pp.build_pipeline32(ctx, rlk,
                                   use_pallas=(args.path == "pallas"))
        d1 = jnp.asarray(np.asarray(ct1.data).astype(np.uint32))
        d2 = jnp.asarray(np.asarray(ct2.data).astype(np.uint32))
        if args.batch > 1:
            d1 = jnp.broadcast_to(d1[None], (args.batch,) + d1.shape)
            d2 = jnp.broadcast_to(d2[None], (args.batch,) + d2.shape)
            step_jit = jax.jit(jax.vmap(pp.mult_relin_rescale32,
                                        in_axes=(None, 0, 0)))
        else:
            step_jit = jax.jit(pp.mult_relin_rescale32)
        run = lambda: step_jit(pipe, d1, d2)
    else:
        def step(c, r, da, db):
            a = ct1.replace(data=da)
            b = ct2.replace(data=db)
            out = evaluate.rescale_to_next(
                c, evaluate.multiply_and_relin(c, a, b, r))
            return out.data

        # ctx and rlk enter as jit *arguments* (pytrees), not captured
        # constants — keeps XLA from constant-folding the twiddle tables
        step_jit = jax.jit(step)
        run = lambda: step_jit(ctx, rlk, ct1.data, ct2.data)

    t0 = time.time()
    out = run()
    out.block_until_ready()
    compile_s = time.time() - t0
    print(f"# compile+first-run {compile_s:.1f}s", file=sys.stderr)

    times = []
    for _ in range(args.trials):
        t0 = time.time()
        out = run()
        out.block_until_ready()
        times.append(time.time() - t0)
    med = float(np.median(times))
    mean = float(np.mean(times))
    ops = args.batch / med

    if args.csv:
        print(f"ckks_mult_relin_rescale,{args.trials},{med*1e6:.1f},"
              f"{mean*1e6:.1f}", file=sys.stderr)

    print(json.dumps({
        "metric": f"CKKS n={n} L={args.limbs} mult+relin+rescale "
                  f"({args.path})",
        "value": round(ops, 3),
        "unit": "ops/s",
        "vs_baseline": round(ops / A100_BASELINE_OPS, 4),
    }))


if __name__ == "__main__":
    main()
