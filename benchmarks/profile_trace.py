"""Capture a jax.profiler trace of the headline step for TPU tuning.

Usage (first hour of TPU access — see ROUND2_NOTES.md playbook):
    python benchmarks/profile_trace.py --path mxu --n 65536 --limbs 28
    python benchmarks/profile_trace.py --path u32 --steps 20
Then inspect the trace with tensorboard (or xprof) pointed at --logdir.

The workload is the same CKKS mult+relin+rescale step bench.py times
(reference: ckks_bench.cu:300-397); this script trades the timing loop
for a trace so per-kernel HBM/MXU utilization is visible.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--limbs", type=int, default=28)
    ap.add_argument("--alpha", type=int, default=4)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--path", choices=["u32", "mxu", "pallas"], default="mxu")
    ap.add_argument("--logdir", default="/tmp/phantom_trace")
    args = ap.parse_args()

    import jax
    if os.environ.get("PHANTOM_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["PHANTOM_PLATFORM"])
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/phantom_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from phantom_tpu.host import numth
    from phantom_tpu.ops import pipeline32 as pp
    from phantom_tpu.schemes import (CKKSEncoder, EncryptionParameters,
                                     Scheme, keys, make_context)

    n = args.n
    qs = numth.get_primes(2 * n, 28, args.limbs + 1)
    ps = numth.get_primes(2 * n, 29, args.alpha)
    params = EncryptionParameters.create(
        Scheme.CKKS, n, [qs[0]] + qs[1:args.limbs] + ps,
        special_modulus_size=args.alpha)
    ctx = make_context(params)
    rng = jax.random.PRNGKey(0)
    k_sk, k_pk, k_rlk, k1, k2 = jax.random.split(rng, 5)
    sk = jax.jit(keys.gen_secret_key)(ctx, k_sk)
    pk = jax.jit(keys.gen_public_key)(ctx, sk, k_pk)
    rlk = jax.jit(keys.gen_relin_key)(ctx, sk, k_rlk)
    enc = CKKSEncoder(ctx)
    pt = enc.encode(np.random.default_rng(0).standard_normal(enc.slots),
                    2.0 ** 22)
    ct1 = jax.jit(keys.encrypt_asymmetric)(ctx, pk, pt, k1)
    ct2 = jax.jit(keys.encrypt_asymmetric)(ctx, pk, pt, k2)

    use_pallas = {"u32": False, "mxu": "mxu", "pallas": True}[args.path]
    pipe = pp.build_pipeline32(ctx, rlk, use_pallas=use_pallas)
    d1 = jnp.asarray(np.asarray(ct1.data).astype(np.uint32))
    d2 = jnp.asarray(np.asarray(ct2.data).astype(np.uint32))
    step = jax.jit(pp.mult_relin_rescale32)

    out = step(pipe, d1, d2)
    out.block_until_ready()  # compile outside the trace
    print(f"# compiled; tracing {args.steps} steps to {args.logdir}",
          file=sys.stderr)

    with jax.profiler.trace(args.logdir):
        t0 = time.time()
        for _ in range(args.steps):
            out = step(pipe, d1, d2)
        out.block_until_ready()
        dt = (time.time() - t0) / args.steps
    print(f"# {dt*1e6:.0f} us/step ({1.0/dt:.1f} ops/s) on "
          f"{jax.devices()[0].platform}; trace in {args.logdir}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
