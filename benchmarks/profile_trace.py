"""Capture a jax.profiler trace of the headline step for TPU tuning.

Usage (first hour of TPU access — see ROUND2_NOTES.md playbook):
    python benchmarks/profile_trace.py --path mxu --n 65536 --limbs 28
    python benchmarks/profile_trace.py --path u32 --steps 20
Then inspect with summarize_trace.py (same directory) or tensorboard.

The workload is the same CKKS mult+relin+rescale step bench.py times
(reference: ckks_bench.cu:300-397); this script trades the timing loop
for a trace so per-kernel HBM/MXU utilization is visible.

Context build + keygen + encrypt run pinned to the in-process CPU
backend (their u64-emulated graphs compile impractically slowly through
XLA-TPU, see tests/test_tpu_hw.py); only the fast-path step under
profile is dispatched to the accelerator.
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
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--path", choices=["u32", "mxu", "mxu-nofold",
                                       "pallas-roll", "mxu-pallas"],
                    default="mxu")
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

    def log(msg):
        print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
              flush=True)

    n = args.n
    cpu = jax.devices("cpu")[0]
    t0 = time.time()
    with jax.default_device(cpu):
        qs = numth.get_primes(2 * n, 28, args.limbs + 1)
        ps = numth.get_primes(2 * n, 29, args.alpha)
        params = EncryptionParameters.create(
            Scheme.CKKS, n, [qs[0]] + qs[1:args.limbs] + ps,
            special_modulus_size=args.alpha)
        ctx = make_context(params)
        log(f"context built {time.time()-t0:.1f}s")
        rng = jax.random.PRNGKey(0)
        k_sk, k_pk, k_rlk, k1, k2 = jax.random.split(rng, 5)
        # jitted on the CPU backend: one dispatch per key, and the
        # persistent cache reuses earlier CPU-run compilations
        sk = jax.jit(keys.gen_secret_key)(ctx, k_sk)
        pk = jax.jit(keys.gen_public_key)(ctx, sk, k_pk)
        rlk = jax.jit(keys.gen_relin_key)(ctx, sk, k_rlk)
        log(f"keys {time.time()-t0:.1f}s")
        enc = CKKSEncoder(ctx)
        pt = enc.encode(np.random.default_rng(0).standard_normal(enc.slots),
                        2.0 ** 22)
        enc_jit = jax.jit(keys.encrypt_asymmetric)
        ct1 = enc_jit(ctx, pk, pt, k1)
        ct2 = enc_jit(ctx, pk, pt, k2)
        log(f"encrypted {time.time()-t0:.1f}s")

    # normalize across the CPU->accelerator boundary
    np_tree = lambda t: jax.tree.map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, t)
    ctx = np_tree(ctx)
    engine = {"u32": False, "mxu": "mxu", "mxu-nofold": "mxu",
              "pallas": True, "pallas-roll": "pallas-roll",
              "mxu-pallas": "mxu-pallas"}[args.path]
    if args.path == "mxu-nofold":
        from phantom_tpu.ops import bconv32, ntt_mxu
        ntt_mxu.FOLD_DIAGONALS = False
        bconv32.FOLD_DIAGONALS32 = False
    with jax.default_device(cpu):
        pipe = np_tree(pp.build_pipeline32(ctx, np_tree(rlk),
                                           use_pallas=engine))
    log(f"pipeline built {time.time()-t0:.1f}s")
    d1 = jnp.asarray(np.asarray(ct1.data).astype(np.uint32))
    d2 = jnp.asarray(np.asarray(ct2.data).astype(np.uint32))
    if args.batch > 1:
        d1 = jnp.broadcast_to(d1[None], (args.batch,) + d1.shape)
        d2 = jnp.broadcast_to(d2[None], (args.batch,) + d2.shape)
        step = jax.jit(jax.vmap(pp.mult_relin_rescale32,
                                in_axes=(None, 0, 0)))
    else:
        step = jax.jit(pp.mult_relin_rescale32)

    t0 = time.time()
    out = step(pipe, d1, d2)
    out.block_until_ready()  # compile outside the trace
    log(f"compiled+first run {time.time()-t0:.1f}s on "
        f"{jax.devices()[0].platform}; tracing {args.steps} steps "
        f"to {args.logdir}")

    with jax.profiler.trace(args.logdir):
        t0 = time.time()
        for _ in range(args.steps):
            out = step(pipe, d1, d2)
        out.block_until_ready()
        dt = (time.time() - t0) / args.steps
    log(f"{dt*1e6:.0f} us/step ({args.batch/dt:.1f} ops/s); "
        f"trace in {args.logdir}")


if __name__ == "__main__":
    main()
